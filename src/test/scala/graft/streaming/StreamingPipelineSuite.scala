package graft.streaming

import graft.SparkSpec
import graft.ml.AdaBoostMH
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** The unified-API claim, exercised: the SAME expressions that run in the
  * batch LLM pipeline (text scrubbing, chunk arithmetic) and the SAME
  * broadcast model trained in batch run unchanged on a stream — stateless
  * ops and pure scoring need no watermarks or state stores. */
class StreamingPipelineSuite extends SparkSpec {

  test("batch text-scrub expression runs unchanged on a stream") {
    import spark.implicits._
    val input = MemoryStream[(Long, String)](spark)
    val q = input.toDF().toDF("doc_id", "text")
      .select(col("doc_id"), graft.queries.LlmOps.scrubText(col("text")).as("clean"))
      .writeStream.format("memory").queryName("scrub_stream")
      .outputMode("append").start()
    try {
      input.addData((1L, "see https://a.io/x now"), (2L, "mail a@b.co"))
      q.processAllAvailable()
      val got = spark.table("scrub_stream")
        .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
      assert(got === Map(1L -> "see <URL> now", 2L -> "mail <EMAIL>"))
    } finally q.stop()
  }

  test("batch-trained AdaBoost model scores a stream (online inference)") {
    import spark.implicits._
    val train = graft.Tables(spark, "/root/testdata/sf0.001", "embeddings")
    val stumps = AdaBoostMH.train(spark, train, numRounds = 3)
    // batch predictions = the golden reference
    val batchPred = train
      .select(col("vec_id"),
        AdaBoostMH.predictUdf(stumps)(col("embedding").cast("array<double>")).as("p"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    // stream the same vectors through the same broadcast model
    val rows = train.select(col("vec_id"), col("embedding").cast("array<double>"))
      .collect().map(r => (r.getLong(0), r.getSeq[Double](1).toArray)).toSeq
    val input = MemoryStream[(Long, Array[Double])](spark)
    val q = input.toDF().toDF("vec_id", "embedding")
      .select(col("vec_id"), AdaBoostMH.predictUdf(stumps)(col("embedding")).as("p"))
      .writeStream.format("memory").queryName("score_stream")
      .outputMode("append").start()
    try {
      input.addData(rows)
      q.processAllAvailable()
      val streamPred = spark.table("score_stream")
        .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
      assert(streamPred === batchPred)
      assert(streamPred.nonEmpty)
    } finally q.stop()
  }
}
