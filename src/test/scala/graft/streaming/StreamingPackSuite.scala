package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Streaming sequence packing: the stream == batch-operator pin over
  * arrival order, cross-batch gaplessness, retry idempotence on the
  * manifest marker, the manifest-first/base-second crash order, and a
  * MemoryStream end-to-end drive. */
class StreamingPackSuite extends SparkSpec {

  private def tmp(name: String): String =
    java.nio.file.Files.createTempDirectory(name).toString

  private def docs(rows: (Long, String)*): DataFrame = {
    import spark.implicits._
    rows.toDF("doc_id", "text")
  }

  private def rows(df: DataFrame): Seq[Seq[Any]] =
    df.select("doc_id", "n_tokens", "tok_start", "chunk_first",
        "chunk_last", "off_in_chunk")
      .orderBy("doc_id").collect().map(_.toSeq).toSeq

  test("three batches concatenate to the batch operator over the arrival-ordered stream") {
    val out = tmp("spack")
    // ascending doc_ids across batches -> arrival order == doc_id order,
    // so the batch operator over the union is the exact reference
    val b0 = docs(0L -> "a b c d e", 1L -> "f g h")
    val b1 = docs(2L -> "i j k l m n o", 3L -> "p")
    val b2 = docs(4L -> "q r s t u v w x y z a2 b2")
    StreamingPack.applyBatch(b0, out, seqLen = 4, batchId = 0L)
    StreamingPack.applyBatch(b1, out, seqLen = 4, batchId = 1L)
    StreamingPack.applyBatch(b2, out, seqLen = 4, batchId = 2L)
    val streamed = rows(StreamingPack.manifest(spark, out))
    val batch = rows(graft.queries.LlmOps.packChunks(
      b0.unionByName(b1).unionByName(b2), seqLen = 4))
    assert(streamed === batch, "streamed manifest diverged from the batch operator")
    // cross-batch gaplessness is explicit: batch 1 starts at token 8
    assert(streamed(2)(2) === 8L && streamed(2)(3) === 2L)
    assert(StreamingPack.latestBase(spark, out) === Some((2L, 28L)))
  }

  test("retry idempotence and the torn-base heal") {
    val out = tmp("spack-retry")
    val b0 = docs(0L -> "a b c d e", 1L -> "f g h")
    val b1 = docs(2L -> "i j k l m n o")
    StreamingPack.applyBatch(b0, out, seqLen = 4, batchId = 0L)
    StreamingPack.applyBatch(b1, out, seqLen = 4, batchId = 1L)
    val before = rows(StreamingPack.manifest(spark, out))
    // replay of a fully committed batch: a strict no-op (re-packing
    // against the newer base would renumber committed history)
    StreamingPack.applyBatch(b0, out, seqLen = 4, batchId = 0L)
    assert(rows(StreamingPack.manifest(spark, out)) === before)
    assert(StreamingPack.latestBase(spark, out) === Some((1L, 15L)))
    // crash between manifest and base advance: wipe batch 1's base,
    // replay — the base is re-derived from the committed manifest,
    // the manifest itself is untouched
    val fs = org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI(out), spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(s"$out/base/batch=1"), true)
    assert(StreamingPack.latestBase(spark, out) === Some((0L, 8L)))
    StreamingPack.applyBatch(b1, out, seqLen = 4, batchId = 1L)
    assert(StreamingPack.latestBase(spark, out) === Some((1L, 15L)),
      "the torn base advance must heal from the committed manifest")
    assert(rows(StreamingPack.manifest(spark, out)) === before)
    // an empty batch carries the base forward without a marker
    StreamingPack.applyBatch(docs(), out, seqLen = 4, batchId = 2L)
    assert(StreamingPack.latestBase(spark, out) === Some((1L, 15L)))
    StreamingPack.applyBatch(docs(5L -> "x y"), out, seqLen = 4, batchId = 3L)
    assert(StreamingPack.manifest(spark, out)
      .filter(col("batch") === 3).head().getAs[Long]("tok_start") === 15L)
  }

  test("MemoryStream end-to-end: the stream's chunks number continuously") {
    import spark.implicits._
    val out = tmp("spack-e2e")
    val input = MemoryStream[(Long, String)](spark)
    val q = StreamingPack.packSink(input.toDF().toDF("doc_id", "text"),
      out, seqLen = 4, checkpointDir = Some(tmp("spack-ckpt")))
    try {
      input.addData((0L, "a b c d e"), (1L, "f g h"))
      q.processAllAvailable()
      input.addData((2L, "i j k l m n o"))
      q.processAllAvailable()
    } finally q.stop()
    val got = rows(StreamingPack.manifest(spark, out))
    assert(got === rows(graft.queries.LlmOps.packChunks(
      docs(0L -> "a b c d e", 1L -> "f g h", 2L -> "i j k l m n o"),
      seqLen = 4)))
  }
}
