package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

/** Streaming shard writer — the seventh streaming twin (after
  * [[StreamingDedup]] / [[StreamingAnn]] / [[StreamingIvf]] /
  * [[StreamingCommunities]] / [[StreamingSubstr]] / [[StreamingQuality]]):
  * rolling SHARD GENERATIONS for arriving documents.
  * [[graft.queries.LlmOps.shardAssignment]] is a batch-global
  * permutation — an arriving doc cannot join an existing generation
  * without re-ranking the world — so the streaming form assigns each
  * micro-batch (= one EPOCH) its own complete, exactly balanced
  * assignment: every epoch directory is a self-contained training
  * generation a reader consumes as "epoch e, shard s of S", with the
  * same seeded pseudo-shuffle order and |shard| differs ≤ 1 guarantee
  * as the batch operator (it IS the batch operator, applied per epoch —
  * equivalence is pinned, not asserted).
  *
  * Exactly-once on foreachBatch's at-least-once retries comes free from
  * statelessness, the [[StreamingQuality]] argument: an epoch's layout
  * is `outDir/shards/epoch=<batchId>/shard=<s>`, the assignment is a
  * deterministic function of the batch's doc_ids, and a retry
  * OVERWRITES its own epoch directory with identical bytes. No index
  * mutation, no commit protocol needed.
  */
object StreamingShard {

  /** One micro-batch = one shard generation (public so retry idempotence
    * and batch equivalence are testable without driving a stream).
    * Expects (doc_id, …) rows; non-negative doc_id (the batch
    * operator's cross-engine domain guard applies). */
  def applyBatch(batch: DataFrame, numShards: Int, outDir: String,
                 batchId: Long): Unit =
    graft.sources.PartitionedLayout.writePartitioned(
      graft.queries.LlmOps.shardAssignment(batch.select("doc_id"), numShards),
      s"$outDir/shards/epoch=$batchId", "shard")

  /** Attach the shard writer to a streaming (doc_id, …) frame. */
  def shardSink(docs: DataFrame, numShards: Int, outDir: String,
                checkpointDir: Option[String] = None): StreamingQuery =
    docs.writeStream
      .option("checkpointLocation", checkpointDir.getOrElse(s"$outDir.checkpoint"))
      .foreachBatch((b: Dataset[Row], id: Long) =>
        applyBatch(b.toDF(), numShards, outDir, id))
      .start()

  /** Every generation so far: (doc_id, pos_in_shard, epoch, shard) —
    * epoch/shard are partition columns, so an "epoch e, shard s" read
    * prunes to one directory. */
  def shards(spark: SparkSession, outDir: String): DataFrame =
    spark.read.parquet(s"$outDir/shards")

  /** One generation's manifest, ordered like the batch operator's. */
  def epoch(spark: SparkSession, outDir: String, epochId: Long): DataFrame =
    shards(spark, outDir).filter(col("epoch") === epochId)
      .select(col("doc_id"), col("shard").cast("long").as("shard"),
        col("pos_in_shard"))
      .orderBy("doc_id")
}
