package graft.streaming

import graft.ml.IvfIndex
import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.streaming.StreamingQuery

/** Streaming embedding ingest into the persisted IVF index — closes the
  * streaming story across all three index families ([[StreamingDedup]]
  * feeds the dedup index, [[StreamingAnn]] the graph index, this one the
  * IVF): embeddings arrive as a stream, each micro-batch is assigned
  * under the FROZEN coarse quantizer and landed as the next committed
  * ingest version ([[IvfIndex.appendVersion]]), and searches between
  * batches ([[IvfIndex.searchIndex]]) always see exactly the committed
  * versions. [[IvfIndex.staleness]] is the companion alarm: a drifting
  * stream pushes assignment tightness past the build-time reference, the
  * signal to retrain the quantizer offline.
  *
  * Exactly-once on top of foreachBatch's at-least-once retries, by
  * construction: batch b commits ingest version b+1 (version 0 is the
  * base build). The data write is dynamic-partition-overwrite on the
  * (cell, batch) leaf partitions — a retry replaces exactly its own
  * partitions with identical content (assignment under a frozen model is
  * deterministic) — and the version's commit marker is written after the
  * data, so a torn batch stays invisible to committed-path reads until
  * its retry completes it. An already-committed version is skipped whole.
  *
  * Scale shape per batch: one KB-scale model broadcast + one map-side
  * assignment + one partitioned write of |B| rows. The stored corpus is
  * never read, shuffled, or rewritten — this is the cheapest ingest of
  * the three families (the dedup index joins the batch against stored
  * bands; the graph index runs beam search + a refinement round).
  */
object StreamingIvf {

  /** One micro-batch of the ingest (public so retry idempotence is
    * testable without driving a stream). Expects (vec_id, embedding) with
    * vec_ids never seen before. */
  def applyBatch(batch: DataFrame, indexPath: String, batchId: Long): Unit = {
    val spark = batch.sparkSession
    val version = batchId + 1
    if (IvfIndex.committedIngestVersion(spark, indexPath) >= version) return
    IvfIndex.appendVersion(spark, indexPath, batch, version)
  }

  /** Attach the ingest to a streaming (vec_id, embedding) frame.
    * `indexPath` must hold an [[IvfIndex.buildIndex]] over the seed
    * corpus (the quantizer is frozen at build time; arrivals are assigned
    * under it). The checkpoint keeps batchIds monotonic across restarts. */
  def ingestSink(emb: DataFrame, indexPath: String,
                 checkpointDir: String): StreamingQuery =
    emb.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch((b: Dataset[Row], id: Long) =>
        applyBatch(b.toDF(), indexPath, id))
      .start()

  /** Top-k IVF answers against everything committed so far; `allowed`
    * passes the filtered-search allowlist through. */
  def search(spark: SparkSession, indexPath: String, queries: DataFrame,
             topK: Int, nprobe: Int,
             allowed: Option[DataFrame] = None): DataFrame =
    IvfIndex.searchIndex(spark, indexPath, queries, topK, nprobe, allowed)

  // -------------------------------------------------------------------
  // The IVF-PQ twins: identical exactly-once recipe over the codes
  // layout ([[IvfIndex.appendPqVersion]] — encode under the FROZEN
  // coarse quantizer + codebooks + optional OPQ rotation, land as
  // committed (cell, batch) partitions). Per batch: two KB-scale model
  // broadcasts + one map-side encode + a write of |B| CODE rows (~m
  // bytes each) — the cheapest possible durable ingest of an embedding
  // stream, and the stored corpus is again never touched.
  // -------------------------------------------------------------------

  /** One micro-batch into a [[IvfIndex.buildPqIndex]] index. */
  def applyBatchPq(batch: DataFrame, indexPath: String, batchId: Long): Unit = {
    val spark = batch.sparkSession
    val version = batchId + 1
    if (IvfIndex.committedIngestVersion(spark, indexPath) >= version) return
    IvfIndex.appendPqVersion(spark, indexPath, batch, version)
  }

  /** Attach the ingest to a streaming (vec_id, embedding) frame;
    * `indexPath` must hold a [[IvfIndex.buildPqIndex]] over the seed
    * corpus. */
  def ingestSinkPq(emb: DataFrame, indexPath: String,
                   checkpointDir: String): StreamingQuery =
    emb.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch((b: Dataset[Row], id: Long) =>
        applyBatchPq(b.toDF(), indexPath, id))
      .start()

  /** ADC top-k against everything committed so far; `rerank`/`allowed`
    * pass the exact second tier and the filtered-search allowlist
    * through (a keepFloat index's float twin rides the same committed
    * versions, so the re-rank stays exactly-once consistent too). */
  def searchPq(spark: SparkSession, indexPath: String, queries: DataFrame,
               topK: Int, nprobe: Int, rerank: Int = 0,
               allowed: Option[DataFrame] = None): DataFrame =
    IvfIndex.searchPqIndex(spark, indexPath, queries, topK, nprobe, rerank, allowed)
}
