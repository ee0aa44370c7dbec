package graft.streaming

import graft.{SparkSpec, Tables}
import graft.operators.SubstrIndex
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Streaming exact-substring ingest: stream-of-batches == the batch
  * operator restricted to each arrival slice, exactly-once on retries
  * and torn appends, and a MemoryStream end-to-end run equal to direct
  * applyBatch calls. */
class StreamingSubstrSuite extends SparkSpec {

  private def tmp(name: String): String =
    java.nio.file.Files.createTempDirectory(name).toString

  private val sf = "/root/testdata/sf0.001"

  private def spans(df: DataFrame): Seq[(Long, Long, Long)] =
    df.select("doc_id", "span_start", "span_end")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .toSeq.sorted

  test("per-batch spans == batch operator over each arrival prefix; retries no-op") {
    val docs = Tables(spark, sf, "documents").select("doc_id", "text")
    val seed = docs.filter(col("doc_id") < 300)
    val b1 = docs.filter(col("doc_id") >= 300 && col("doc_id") < 400)
    val b2 = docs.filter(col("doc_id") >= 400)
    val idx = tmp("ssub-idx"); val out = tmp("ssub-out")
    SubstrIndex.build(seed, idx)

    StreamingSubstr.applyBatch(b1, idx, out, batchId = 0L)
    StreamingSubstr.applyBatch(b2, idx, out, batchId = 1L)

    val all = StreamingSubstr.observedSpans(spark, out)
    // batch 1's spans = full-batch xxh over (seed ∪ b1), restricted to b1
    val exp1 = spans(graft.queries.LlmOps
      .substrSpansOf(docs.filter(col("doc_id") < 400), w = 12, hashKeys = true)
      .filter(col("doc_id") >= 300))
    assert(spans(all.filter(col("batch") === 1)) === exp1)
    // batch 2's = full-batch over everything, restricted to b2
    val exp2 = spans(graft.queries.LlmOps
      .substrSpansOf(docs, w = 12, hashKeys = true)
      .filter(col("doc_id") >= 400))
    assert(spans(all.filter(col("batch") === 2)) === exp2)
    assert(exp1.nonEmpty && exp2.nonEmpty, "fixture must plant repeats in both slices")

    // the clean emission applies exactly the landed spans: equal to the
    // batch apply-step over the arrival prefix, restricted to the batch
    val cleanRows = StreamingSubstr.cleanedDocs(spark, out)
      .filter(col("batch") === 2)
      .select("doc_id", "n_tokens", "n_removed", "clean")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getString(3))).toSeq.sorted
    val expClean = graft.queries.LlmOps.applySpans(b2,
        graft.queries.LlmOps.substrSpansOf(docs, w = 12, hashKeys = true)
          .filter(col("doc_id") >= 400))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getString(3))).toSeq.sorted
    assert(cleanRows === expClean)
    assert(cleanRows.exists(_._3 > 0) && cleanRows.exists(_._3 == 0),
      "fixture should have both touched and untouched docs")

    // a redelivered committed batch is a whole no-op
    val versionsBefore = VersionedState.versions(spark, s"$idx/win", "batch=").sorted
    StreamingSubstr.applyBatch(b1, idx, out, batchId = 0L)
    assert(VersionedState.versions(spark, s"$idx/win", "batch=").sorted === versionsBefore)
    assert(spans(StreamingSubstr.observedSpans(spark, out)
      .filter(col("batch") === 1)) === exp1)
  }

  test("torn append converges on retry to the clean result") {
    val docs = Tables(spark, sf, "documents").select("doc_id", "text")
    val seed = docs.filter(col("doc_id") < 400)
    val b1 = docs.filter(col("doc_id") >= 400)
    val idx = tmp("ssub-torn-idx"); val out = tmp("ssub-torn-out")
    SubstrIndex.build(seed, idx)
    StreamingSubstr.applyBatch(b1, idx, out, batchId = 0L)
    val clean = spans(StreamingSubstr.observedSpans(spark, out))
    // tear the committed append (crash after spans, mid-append) and retry
    val fs = VersionedState.fileSystem(spark, idx)
    fs.delete(new org.apache.hadoop.fs.Path(s"$idx/win/batch=1/_SUCCESS"), false)
    StreamingSubstr.applyBatch(b1, idx, out, batchId = 0L)
    assert(SubstrIndex.isCommitted(spark, idx, 1L))
    assert(spans(StreamingSubstr.observedSpans(spark, out)) === clean)
  }

  test("clean emission uses the index's persisted tokenizer, not the whitespace default") {
    import spark.implicits._
    val pass = (1 to 12).map(i => s"tok$i").mkString(" ")
    val idx = tmp("ssub-tok-idx"); val out = tmp("ssub-tok-out")
    SubstrIndex.build(
      Seq((1L, s"intro words $pass")).toDF("doc_id", "text"),
      idx, w = 12, tokenize = "split(lower(text), '[^a-z0-9]+')")
    // noisy re-occurrence: SHOUTED and comma-riddled — invisible to a
    // whitespace split, found and cleaned under the index's tokenizer
    val noisy = pass.toUpperCase.replace(" ", ", ")
    StreamingSubstr.applyBatch(
      Seq((10L, s"Lead-in: $noisy!")).toDF("doc_id", "text"), idx, out, 0L)
    assert(spans(StreamingSubstr.observedSpans(spark, out)) === Seq((10L, 3L, 14L)))
    val r = StreamingSubstr.cleanedDocs(spark, out)
      .select("doc_id", "n_tokens", "n_removed", "clean").collect()
    assert(r.length === 1)
    // tokenizer stream of doc 10 = [lead, in, tok1..tok12, ""] (trailing
    // empty from the '!') — 15 tokens, 12 removed, survivors re-joined
    assert((r.head.getLong(0), r.head.getLong(1), r.head.getLong(2), r.head.getString(3))
      === ((10L, 15L, 12L, "lead in ")))
  }

  test("MemoryStream end-to-end equals direct applyBatch") {
    import spark.implicits._
    val docs = Tables(spark, sf, "documents").select("doc_id", "text")
    val seed = docs.filter(col("doc_id") < 300)
    val rows = docs.filter(col("doc_id") >= 300)
      .collect().map(r => (r.getLong(0), r.getString(1)))
    val (r1, r2) = rows.partition(_._1 < 400)
    assert(r1.nonEmpty && r2.nonEmpty)

    val idx = tmp("ssub-e2e-idx"); val out = tmp("ssub-e2e-out")
    SubstrIndex.build(seed, idx)
    val input = MemoryStream[(Long, String)](spark)
    val q = StreamingSubstr.ingestSink(
      input.toDF().toDF("doc_id", "text"), idx, out,
      checkpointDir = Some(tmp("ssub-e2e-ckpt")))
    try {
      input.addData(r1.toSeq); q.processAllAvailable()
      input.addData(r2.toSeq); q.processAllAvailable()
    } finally q.stop()

    val ref = tmp("ssub-ref-idx"); val refOut = tmp("ssub-ref-out")
    SubstrIndex.build(seed, ref)
    StreamingSubstr.applyBatch(r1.toSeq.toDF("doc_id", "text"), ref, refOut, 0L)
    StreamingSubstr.applyBatch(r2.toSeq.toDF("doc_id", "text"), ref, refOut, 1L)
    assert(spans(StreamingSubstr.observedSpans(spark, out)) ===
      spans(StreamingSubstr.observedSpans(spark, refOut)))
    assert(spans(StreamingSubstr.observedSpans(spark, out)).nonEmpty)
  }
}
