package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

class LabelPropagationSuite extends SparkSpec {

  private def nodes(ids: Long*): DataFrame = {
    import spark.implicits._
    ids.toDF("id")
  }
  private def edges(es: (Long, Long)*): DataFrame = {
    import spark.implicits._
    es.toDF("src", "dst")
  }
  private def labels(df: DataFrame): Map[Long, Long] =
    df.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("two triangles over one bridge split into two communities") {
    val n = nodes(1L, 2L, 3L, 4L, 5L, 6L)
    val e = edges(1L -> 2L, 2L -> 3L, 1L -> 3L, 4L -> 5L, 5L -> 6L, 4L -> 6L,
      3L -> 4L) // the weak bridge: one component, two dense cores
    val l = labels(LabelPropagation.run(n, e, iters = 4))
    assert(l.size === 6)
    assert(l(1L) === l(2L) && l(2L) === l(3L), s"left triangle split: $l")
    assert(l(4L) === l(5L) && l(5L) === l(6L), s"right triangle split: $l")
    assert(l(1L) !== l(4L), s"bridge merged the communities: $l")
    // connected components would put all six in ONE component — the
    // contrast that makes LPA a distinct operator
    val (cc, _) = ConnectedComponents.run(
      e.select(col("src").as("u"), col("dst").as("v")))
    assert(cc.select("label").distinct().count() === 1,
      "fixture not a single component")
  }

  test("isolated node keeps its own label; zero rounds is the identity labeling") {
    val n = nodes(1L, 2L, 9L)
    val e = edges(1L -> 2L)
    val l = labels(LabelPropagation.run(n, e, iters = 3))
    assert(l(9L) === 9L, s"isolated node drifted: $l")
    assert(l(1L) === l(2L), s"linked pair split: $l")
    val l0 = labels(LabelPropagation.run(n, e, iters = 0))
    assert(l0 === Map(1L -> 1L, 2L -> 2L, 9L -> 9L))
  }

  test("plurality beats min-label; exact ties go to the smallest label") {
    // node 10's neighbors: two with label 20 (after round 1 they keep
    // their mutual pair label), one with a smaller label 5 -> plurality 20
    // must beat the smaller label 5. Build it directly in one round:
    // neighbors 20,21 (labels 20,21...) — simpler: star of 10 with
    // leaves 5, 20, 21 plus edge 20-21. Round 1: leaf 5 -> 5, 20 -> 10?
    // Keep it one round and vote-count explicit instead:
    //   10's votes round 1: self 10, leaves 5, 20, 21 -> all cnt 1,
    //   tie -> min = 5. So assert the TIE rule first.
    val n = nodes(5L, 10L, 20L, 21L)
    val e = edges(10L -> 5L, 10L -> 20L, 10L -> 21L, 20L -> 21L)
    val r1 = labels(LabelPropagation.run(n, e, iters = 1))
    assert(r1(10L) === 5L, s"all-tie round must pick the smallest: $r1")
    // round 2: 20/21 voted each other into label 20 (pair + self ties ->
    // min of {10,20,21} vote set... verify plurality empirically): after
    // round 1, l = {5:5, 10:5, 20:10, 21:10} (each leaf ties on
    // {self, 10} -> min). Round 2, node 10 sees {5:5, 20:10, 21:10,
    // self:5} -> labels {5:2, 10:2} tie at cnt 2 -> min 5.
    // Node 20 sees {10:5, 21:10, self:10} -> 10 wins by plurality 2:1
    // even though 5 is smaller — the plurality-beats-min assertion.
    val r2 = labels(LabelPropagation.run(n, e, iters = 2))
    assert(r2(20L) === 10L, s"plurality lost to a smaller minority label: $r2")
  }

  test("edge endpoints outside the node set never leak into the result") {
    // edges mention 3 and 4, which are NOT nodes: they may vote (they sit
    // in the adjacency) but the contract is one row per node of `nodes`
    val n = nodes(1L, 2L)
    val e = edges(1L -> 2L, 2L -> 3L, 3L -> 4L)
    for (it <- Seq(0, 1, 3)) {
      val l = labels(LabelPropagation.run(n, e, iters = it))
      assert(l.keySet === Set(1L, 2L),
        s"iters=$it emitted rows for non-nodes: $l")
    }
  }

  test("refresh: stable labeling is a fixed point — any seed changes nothing") {
    val n = nodes(1L, 2L, 3L, 4L, 5L, 6L)
    val e = edges(1L -> 2L, 2L -> 3L, 1L -> 3L, 4L -> 5L, 5L -> 6L, 4L -> 6L,
      3L -> 4L)
    val stable = LabelPropagation.run(n, e, iters = 4)
    // empty seed: trivially unchanged; full seed: every node re-votes and
    // keeps its label (the converged labeling is a synchronous fixed point)
    val (same, stats) = LabelPropagation.refreshWithStats(
      stable, n, e, seedFrontier = n, maxRounds = 10)
    assert(labels(same) === labels(stable), "stable labeling moved under refresh")
    assert(stats === Seq(0L), s"fixed point must terminate in one zero-round: $stats")
    val (same2, _) = LabelPropagation.refreshWithStats(
      stable, n, e, seedFrontier = n.limit(0), maxRounds = 10)
    assert(labels(same2) === labels(stable))
  }

  test("refresh: a delta converges to the full recompute, touching only its neighborhood") {
    // 20 disjoint triangles; committed labeling from a full run
    val tri = (0 until 20).flatMap { t =>
      val b = t * 3L + 1
      Seq(b -> (b + 1), (b + 1) -> (b + 2), b -> (b + 2))
    }
    val ids = (1L to 60L)
    val n0 = nodes(ids: _*)
    val e0 = edges(tri: _*)
    val committed = LabelPropagation.run(n0, e0, iters = 4)
    // delta: a NEW triangle {61,62,63} arrives, plus an edge merging it
    // into triangle {1,2,3}'s community via node 1
    val n1 = nodes((ids ++ Seq(61L, 62L, 63L)): _*)
    val extra = Seq(61L -> 62L, 62L -> 63L, 61L -> 63L, 1L -> 61L)
    val e1 = edges((tri ++ extra): _*)
    val (inc, stats) = LabelPropagation.refreshWithStats(
      committed, n1, e1, seedFrontier = nodes(1L, 61L, 62L, 63L), maxRounds = 20)
    val full = labels(LabelPropagation.run(n1, e1, iters = 6))
    assert(labels(inc) === full,
      s"incremental refresh diverged from the full recompute")
    // work ∝ frontier: total label changes stay in the delta's
    // neighborhood — nowhere near the 63-node graph
    assert(stats.sum <= 8, s"refresh touched too much of the graph: $stats")
    // untouched triangles keep their committed labels verbatim
    val before = labels(committed)
    val after = labels(inc)
    assert((4L to 60L).forall(i => after(i) === before(i)),
      "refresh moved labels outside the delta's neighborhood")
  }

  test("refresh shuffle work tracks the delta, not the graph (10x nodes, ~flat bytes)") {
    import spark.implicits._
    // T disjoint triangles with a converged labeling (each triangle's
    // min id — a synchronous fixed point), plus a fixed one-triangle
    // delta linked to triangle 1. The incremental core's SHUFFLE must
    // stay ~flat as T grows 10x, and sit far under the full recompute's.
    def fixture(t: Int) = {
      val n = 3 * t
      val ids = (1L to n.toLong).toDF("id")
      val tri = (0 until t).flatMap { k =>
        val b = k * 3L + 1
        Seq(b -> (b + 1), (b + 1) -> (b + 2), b -> (b + 2))
      }
      val extra = Seq((n + 1L) -> (n + 2L), (n + 2L) -> (n + 3L),
        (n + 1L) -> (n + 3L), 1L -> (n + 1L))
      val allIds = (1L to (n + 3L)).toDF("id")
      val e = (tri ++ extra).toDF("src", "dst")
      val adj = e.select(col("src"), col("dst"))
        .unionByName(e.select(col("dst").as("src"), col("src").as("dst")))
        .unionByName(allIds.select(col("id").as("src"), col("id").as("dst")))
        .distinct().localCheckpoint()
      val labels = ids.withColumn("label",
        (floor((col("id") - 1) / 3) * 3 + 1).cast("long")).localCheckpoint()
      val seed = Seq(1L, n + 1L, n + 2L, n + 3L).toDF("id")
      (labels, allIds, adj, seed, e)
    }
    final class Tally extends org.apache.spark.scheduler.SparkListener {
      val read = new java.util.concurrent.atomic.AtomicLong
      override def onStageCompleted(
          e: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
        val m = e.stageInfo.taskMetrics
        if (m != null) read.addAndGet(m.shuffleReadMetrics.totalBytesRead)
      }
    }
    def shuffleOf(f: => Unit): Long = {
      val t = new Tally
      spark.sparkContext.addSparkListener(t)
      try { f; Thread.sleep(500) } finally spark.sparkContext.removeSparkListener(t)
      t.read.get()
    }
    def refreshBytes(t: Int): Long = {
      val (labels, allIds, adj, seed, _) = fixture(t)
      shuffleOf {
        val (out, _) = LabelPropagation.refreshOnAdjacency(labels, allIds, adj, seed)
        out.queryExecution.toRdd.count()
      }
    }
    val small = refreshBytes(100)
    val big = refreshBytes(1000)
    assert(big < 2 * math.max(small, 64 * 1024),
      s"10x graph grew refresh shuffle ${small}B -> ${big}B — not delta-bounded")
    // context: the full recompute's shuffle at the large size dwarfs it
    val (_, allIds, _, _, e) = fixture(1000)
    val full = shuffleOf {
      LabelPropagation.run(allIds, e, iters = 4).queryExecution.toRdd.count()
    }
    assert(big < full / 3,
      s"refresh (${big}B) must shuffle far less than the full run (${full}B)")
  }

  test("deterministic across partitionings") {
    val n = nodes((1L to 30L): _*)
    val e = edges((1L to 29L).map(i => i -> (i + 1)) :+ (7L -> 23L): _*)
    val base = labels(LabelPropagation.run(n, e, iters = 4))
    assert(labels(LabelPropagation.run(n.repartition(7), e.repartition(5),
      iters = 4)) === base)
    assert(labels(LabelPropagation.run(n.repartition(1), e.repartition(13),
      iters = 4)) === base)
  }
}
