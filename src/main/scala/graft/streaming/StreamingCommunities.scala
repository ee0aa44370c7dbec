package graft.streaming

import graft.operators.CommunityIndex
import org.apache.spark.sql.{DataFrame, Dataset, Row}
import org.apache.spark.sql.streaming.StreamingQuery

/** Generic streaming communities: ANY (src, dst) edge stream — link
  * crawls, citation arrivals, similarity pairs from a producer that is
  * not this repo's dedup gate — drives the persisted
  * [[CommunityIndex]], one versioned advance per micro-batch.
  * [[StreamingDedup.refreshCommunities]] is the dedup-stream
  * specialization (it derives its delta from the gate's outputs); this
  * sink is the library-caller form the round-9 CommunityIndex work
  * makes possible.
  *
  * Version protocol (the [[StreamingDedup.applyBatch]] discipline):
  * batch b advances the labeling to version b+1 — version 0 is an
  * optional pre-built seed ([[CommunityIndex.build]]); with no seed the
  * first batch cold-starts through the same code path. Exactly-once on
  * top of foreachBatch's at-least-once replay because
  * [[CommunityIndex.advance]] is version-idempotent: a batch at or
  * below the committed head returns the stored labeling untouched, and
  * a half-written attempt is swept by advance's torn-delta hygiene
  * before recomputing. Edge repeats across batches are dropped against
  * the committed adjacency (the default advance path — an arbitrary
  * stream owes no uniqueness), so replays cannot double-count votes.
  *
  * Per-batch work ∝ the batch's neighborhood (frontier refresh), never
  * O(|E|); state on disk = adjacency deltas (the graph, linear in
  * distinct edges) + two labeling snapshots.
  */
object StreamingCommunities {

  /** One micro-batch of (src, dst) edges (public so retry idempotence is
    * testable without driving a stream). */
  def applyBatch(edges: DataFrame, path: String, batchId: Long,
                 maxRounds: Int = 50): Unit = {
    val spark = edges.sparkSession
    val version = batchId + 1
    // a redelivered batch at or below the committed head already
    // happened — advance() would reject below-head versions, so gate here
    if (CommunityIndex.version(spark, path).exists(_ >= version)) return
    CommunityIndex.advance(path, version,
      newNodes = edges.limit(0).select(org.apache.spark.sql.functions.col("src").as("id")),
      newEdges = edges.select("src", "dst"), maxRounds = maxRounds)
    ()
  }

  /** Attach the sink to a streaming (src, dst) frame. The checkpoint
    * keeps batchIds monotonic across restarts — same reasoning as
    * [[StreamingDedup.dedupSink]]. */
  def communitySink(edges: DataFrame, path: String,
                    checkpointDir: Option[String] = None,
                    maxRounds: Int = 50): StreamingQuery =
    edges.writeStream
      .option("checkpointLocation", checkpointDir.getOrElse(s"$path.checkpoint"))
      .foreachBatch((b: Dataset[Row], id: Long) =>
        applyBatch(b.toDF(), path, id, maxRounds))
      .start()

  /** The committed labeling at the stream's current watermark. */
  def labels(spark: org.apache.spark.sql.SparkSession, path: String): DataFrame =
    CommunityIndex.labels(spark, path)
}
