package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

class PageRankSuite extends SparkSpec {

  private def nodes(ids: Long*): DataFrame = {
    import spark.implicits._
    ids.toDF("id")
  }

  private def edges(es: (Long, Long)*): DataFrame = {
    import spark.implicits._
    es.toDF("src", "dst")
  }

  private def ranks(df: DataFrame): Map[Long, Double] =
    df.collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap

  test("mass conservation: ranks sum to 1 at every iteration count") {
    val n = nodes(1L, 2L, 3L, 4L, 5L)
    val e = edges(1L -> 2L, 2L -> 3L, 3L -> 1L) // 4, 5 dangling
    for (iters <- Seq(0, 1, 5)) {
      val total = ranks(PageRank.run(n, e, iters)).values.sum
      assert(math.abs(total - 1.0) < 1e-9, s"iters=$iters mass $total")
    }
  }

  test("symmetry: a regular cycle gives every node the same rank") {
    val n = nodes(1L, 2L, 3L, 4L)
    val e = edges(1L -> 2L, 2L -> 3L, 3L -> 4L, 4L -> 1L)
    val r = ranks(PageRank.run(n, e, iters = 10))
    assert(r.values.toSet.size === 1, s"cycle ranks diverged: $r")
    assert(math.abs(r(1L) - 0.25) < 1e-12)
  }

  test("authority: the node every other node links to ranks highest; isolated at the floor") {
    val n = nodes(1L, 2L, 3L, 4L, 9L) // 9 isolated
    val e = edges(2L -> 1L, 3L -> 1L, 4L -> 1L, 1L -> 2L)
    val r = ranks(PageRank.run(n, e, iters = 20))
    assert(r(1L) > r(2L) && r(2L) > r(3L), s"authority order violated: $r")
    assert(r(3L) === r(4L), s"symmetric leaves must tie: $r")
    // the isolated node holds teleport + dangling share only. Nodes with
    // out-edges but NO in-links (3, 4) receive zero contribution and the
    // identical (1-d)/n + d*dm/n update, so they tie the isolated floor
    // EXACTLY — the floor is strict only vs in-linked nodes (1, 2).
    assert(r(9L) === r(3L) && r(9L) === r(4L), s"no-in-edge nodes must tie the floor: $r")
    assert(r(9L) < r(1L) && r(9L) < r(2L), s"isolated node not below in-linked nodes: $r")
  }

  test("hand-computed golden: 2-node round trip after one iteration") {
    // n=2, edges 1->2 only; init 0.5 each. After one round:
    //   contrib(2) = 0.5; dangling (node 2) mass = 0.5
    //   r(1) = 0.075 + 0.85*(0 + 0.25) = 0.2875
    //   r(2) = 0.075 + 0.85*(0.5 + 0.25) = 0.7125
    val r = ranks(PageRank.run(nodes(1L, 2L), edges(1L -> 2L), iters = 1))
    assert(math.abs(r(1L) - 0.2875) < 1e-12, s"got $r")
    assert(math.abs(r(2L) - 0.7125) < 1e-12, s"got $r")
  }

  test("deterministic across partitionings (DECIMAL sums)") {
    val es = (0L until 40L).flatMap(i => Seq(i -> (i * 7 % 40), i -> (i * 11 % 40)))
      .filter { case (a, b) => a != b }
    val n = nodes(0L until 40L: _*)
    def run(nd: DataFrame, ed: DataFrame) =
      PageRank.run(nd, ed, iters = 6).collect()
        .map(r => (r.getLong(0), r.getDouble(1))).toSet
    val base = run(n, edges(es: _*))
    assert(run(n.repartition(7), edges(es: _*).repartition(13)) === base)
    assert(run(n.repartition(1), edges(es: _*).repartition(1)) === base)
  }

  test("plan: contribution rounds are hash joins + the one-row broadcast, no cartesian blowup") {
    val n = nodes(0L until 20L: _*)
    val e = edges((0L until 20L).map(i => i -> ((i + 1) % 20)): _*)
    val p = PageRank.run(n, e, iters = 2).queryExecution.executedPlan.toString
    assert(!p.contains("CartesianProduct"), s"cartesian in PageRank plan:\n$p")
    // the dangling scalar enters as a broadcast of ONE row — the only
    // nested-loop shape allowed
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastExchange"), p)
  }
}
