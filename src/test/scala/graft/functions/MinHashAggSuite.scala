package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Native MinHash sketch aggregate vs the 16-min-columns form. */
class MinHashAggSuite extends SparkSpec {

  test("sketch equals the per-permutation min columns on random groups") {
    import spark.implicits._
    // deterministic synthetic (doc, sid) pairs with shared + unique ids
    val rows = for {
      doc <- 1L to 50L
      k <- 0L until 40L
    } yield (doc, (doc * 31L + k * 7L) % 997L)
    val df = rows.toDF("doc_id", "sid").repartition(7)

    val sketch = df.groupBy("doc_id")
      .agg(expr("graft_minhash(sid, 16)").as("mh"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1).toSeq).toMap

    val mins = (0 until 16).map(i =>
      min((lit(7 + 11 * i) * col("sid") + lit(3 + 17 * i)) % 1000003).as(s"m$i"))
    val cols = df.groupBy("doc_id").agg(mins.head, mins.tail: _*)
      .collect().map(r => r.getLong(0) -> (1 to 16).map(r.getLong(_)).toSeq).toMap

    assert(sketch === cols)
  }

  test("sketch is partitioning-invariant (merge order cannot matter)") {
    import spark.implicits._
    val rows = (1L to 2000L).map(i => (i % 13L, i * 17L % 100003L))
    def run(parts: Int) = rows.toDF("g", "sid").repartition(parts)
      .groupBy("g").agg(expr("graft_minhash(sid, 32)").as("mh"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1).toSeq).toMap
    assert(run(1) === run(32))
  }

  test("graft_minhash is callable from SQL via the extensions") {
    import spark.implicits._
    Seq((1L, 5L), (1L, 9L), (2L, 3L)).toDF("g", "sid")
      .createOrReplaceTempView("mh_in")
    val out = spark.sql(
      "SELECT g, graft_minhash(sid, 4) AS mh FROM mh_in GROUP BY g ORDER BY g")
      .collect().map(r => (r.getLong(0), r.getSeq[Long](1).toSeq))
    // g=1: sid∈{5,9}: h_i(5)=(7+11i)*5+3+17i, h_i(9)=...; min elementwise
    def h(i: Int, sid: Long) = ((7L + 11 * i) * sid + 3 + 17 * i) % 1000003L
    val exp1 = (0 until 4).map(i => math.min(h(i, 5), h(i, 9)))
    val exp2 = (0 until 4).map(i => h(i, 3))
    assert(out.toSeq === Seq((1L, exp1), (2L, exp2)))
  }
}
