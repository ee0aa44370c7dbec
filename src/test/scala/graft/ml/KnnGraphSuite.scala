package graft.ml

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

class KnnGraphSuite extends SparkSpec {

  private val sf = "/root/testdata/sf0.01"
  private def emb = Tables(spark, sf, "embeddings")

  private def asMap(g: DataFrame): Map[Long, Seq[(Long, Double)]] =
    g.collect().groupBy(_.getLong(0))
      .map { case (id, rows) =>
        id -> rows.map(r => (r.getLong(1), r.getDouble(2)))
          .sortBy { case (n, s) => (-s, n) }.toSeq
      }

  private def recallVs(got: Map[Long, Seq[(Long, Double)]],
                       exact: Map[Long, Seq[(Long, Double)]]): Double = {
    val per = exact.map { case (id, top) =>
      val g = got.getOrElse(id, Nil).map(_._1).toSet
      top.count(t => g.contains(t._1)).toDouble / top.size
    }
    per.sum / per.size
  }

  test("structure: <= k neighbors per node, no self-edges, sim is cosine in [-1, 1]") {
    val g = KnnGraph.build(emb, k = 5, iters = 1)
    val rows = g.collect()
    assert(rows.nonEmpty)
    assert(rows.forall(r => r.getLong(0) != r.getLong(1)), "self-edge found")
    assert(rows.forall(r => math.abs(r.getDouble(2)) <= 1.0 + 1e-9))
    val degrees = rows.groupBy(_.getLong(0)).map(_._2.length)
    assert(degrees.max <= 5)
    // every vector participates (LSH seeding + descent reach everything
    // on this corpus; a dropped node would silently hole the graph)
    assert(rows.map(_.getLong(0)).toSet.size === emb.count())
  }

  test("recall vs brute force rises with descent iterations (measured 0.36/0.68/0.88/0.9+)") {
    // the harness embeddings are UNCLUSTERED Gaussians — the hardest case
    // for neighbor-of-neighbor transitivity (the NN-Descent paper's
    // structured-data speedups don't apply); floors carry margin under
    // the measured path so corpus regeneration doesn't flake
    val exact = asMap(KnnGraph.bruteForce(emb, k = 5))
    val r = (0 to 3).map(i => recallVs(asMap(KnnGraph.build(emb, k = 5, iters = i)), exact))
    assert(r(0) < r(2), s"descent did nothing: recall path $r")
    assert(r(1) >= r(0) - 0.02 && r(2) >= r(1) - 0.02 && r(3) >= r(2) - 0.02,
      s"recall path not ~monotone: $r")
    assert(r(2) >= 0.8, s"recall@5 after 2 iters = ${r(2)} (path $r)")
    assert(r(3) >= 0.88, s"recall@5 after 3 iters = ${r(3)} (path $r)")
  }

  test("deterministic across partitionings") {
    def run(df: DataFrame) =
      KnnGraph.build(df, k = 5, iters = 1)
        .collect().map(r => (r.getLong(0), r.getLong(1),
          math.round(r.getDouble(2) * 1e9))).toSet
    val base = run(emb)
    assert(run(emb.repartition(1)) === base)
    assert(run(emb.repartition(13, col("vec_id"))) === base)
  }

  test("plan: descent iteration is equi-joins + the heap operator, no cartesian shapes") {
    val g = KnnGraph.build(emb, k = 5, iters = 1)
    val p = g.queryExecution.executedPlan.toString
    assert(p.contains("TopKPerKey"), p)
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"n^2 join shape in the descent plan:\n$p")
  }
}
