package graft.queries

import graft.SparkSpec

/** The parameterized BM25 retrieval API (LlmOps.bm25) against
  * hand-computed scores on a crafted 3-doc corpus. Constants below are
  * worked by hand from the BM25 formula with k1=1.2, b=0.75:
  * idf(w)  = ln((N - df + 0.5)/(df + 0.5) + 1)
  * s(d, w) = idf * tf*(k1+1) / (tf + k1*(1 - b + b*len/avgdl)), 6dp
  * bm25(d) = round(sum_w s(d, w), 4)
  */
class Bm25Suite extends SparkSpec {

  import org.apache.spark.sql.functions._

  private def corpus = {
    import spark.implicits._
    Seq(
      (1L, "apple banana apple"),
      (2L, "banana cherry"),
      (3L, "cherry cherry cherry date")).toDF("doc_id", "text")
  }

  test("hand-computed scores for an arbitrary two-term query") {
    // N=3, avgdl=3. df(apple)=1 -> idf=ln(2.5/1.5+1)=0.980829;
    // df(cherry)=2 -> idf=ln(0.6+1)=0.470004.
    // d1 (apple tf=2, len=3): 0.980829*4.4/(2+1.2*1.0)      = 1.348640
    // d2 (cherry tf=1, len=2): 0.470004*2.2/(1+1.2*0.75)    = 0.544215
    // d3 (cherry tf=3, len=4): 0.470004*6.6/(3+1.2*1.25)    = 0.689339
    val got = LlmOps.bm25(corpus, Seq("apple", "cherry"), topK = 10)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getDouble(2), r.getLong(3)))
    assert(got.toSeq === Seq(
      (1, 1L, 1.3486, 1L),
      (2, 3L, 0.6893, 1L),
      (3, 2L, 0.5442, 1L)))
  }

  test("terms absent from the corpus contribute nothing; docs without query terms drop out") {
    val got = LlmOps.bm25(corpus, Seq("apple", "zebra"), topK = 10)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(3)))
    assert(got.toSeq === Seq((1, 1L, 1L)))
  }

  test("duplicate query terms score once and topK truncates the ranking") {
    val dup = LlmOps.bm25(corpus, Seq("cherry", "cherry"), topK = 10).collect()
    val one = LlmOps.bm25(corpus, Seq("cherry"), topK = 10).collect()
    assert(dup.map(_.toSeq).toSeq === one.map(_.toSeq).toSeq)
    val top1 = LlmOps.bm25(corpus, Seq("apple", "cherry"), topK = 1)
      .collect().map(r => (r.getInt(0), r.getLong(1)))
    assert(top1.toSeq === Seq((1, 1L)))
  }

  test("the gated q_search_bm25 equals bm25() instantiated with the corpus top-3 terms") {
    val sf = "/root/testdata/sf0.001"
    val docs = graft.Tables(spark, sf, "documents")
    val top3 = docs.select(explode(split(col("text"), " ")).as("w"))
      .groupBy("w").agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("w")).limit(3)
      .collect().map(_.getString(0)).toSeq
    val viaApi = LlmOps.bm25(docs, top3, topK = 10).collect().map(_.toSeq)
    val gated = LlmOps.queries("q_search_bm25")(spark, sf).collect().map(_.toSeq)
    assert(viaApi.toSeq === gated.toSeq)
  }
}
