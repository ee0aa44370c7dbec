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

  test("xxh-fed sketch candidates equal the 64-min-column form over xxh ids") {
    // the q_dedup_minhash_sketch_xxh contract: graft_minhash over
    // pmod(xxhash64(sh), 1000003) must band to EXACTLY the candidate set of
    // the column form computing the same 64 affine minima over the same
    // reduced ids — both run through the shared sketchBandCandidates, so
    // only the aggregation strategy differs
    val sf = "/root/testdata/sf0.001"
    val ds = graft.Tables(spark, sf, "documents")
      .select(col("doc_id"), split(col("text"), " ").as("t"))
      .filter(size(col("t")) >= 5)
      .select(col("doc_id"), explode(array_distinct(
        expr("transform(sequence(1, size(t) - 4), i -> array_join(slice(t, i, 5), ' '))"))).as("sh"))
      .select(col("doc_id"), pmod(xxhash64(col("sh")), lit(1000003L)).as("sid"))
    val sketchMh = ds.groupBy("doc_id").agg(expr("graft_minhash(sid, 64)").as("mh"))
    val mins = (0 until 64).map(i =>
      min(pmod(lit(7L + 11 * i) * col("sid") + lit(3L + 17 * i), lit(1000003L))).as(s"m$i"))
    val colMh = ds.groupBy("doc_id").agg(mins.head, mins.tail: _*)
      .select(col("doc_id"), array((0 until 64).map(i => col(s"m$i")): _*).as("mh"))
    def cands(mh: org.apache.spark.sql.DataFrame) =
      graft.queries.LlmOps.sketchBandCandidates(mh, numBands = 16, rows = 4)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val a = cands(sketchMh)
    val b = cands(colMh)
    assert(a.nonEmpty)
    assert(a === b)
  }

  test("xxh-fed sketch pairs are sound (subset of exact) with near-total recall") {
    import graft.queries.LlmOps
    val sf = "/root/testdata/sf0.001"
    def pairs(q: String) = LlmOps.queries(q)(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val exact = pairs("q_dedup_near")
    val xxh = pairs("q_dedup_minhash_sketch_xxh")
    assert(exact.nonEmpty)
    assert(xxh.subsetOf(exact), s"unsound pairs: ${xxh -- exact}")
    // 16 bands x 4 rows at J >= 0.8: recall 1-(1-J^4)^16 ~ 0.9998
    assert(xxh.size >= math.ceil(exact.size * 0.9).toInt,
      s"recall ${xxh.size}/${exact.size} below floor")
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
