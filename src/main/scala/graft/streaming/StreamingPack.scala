package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

/** Streaming sequence packing — the ninth streaming twin (after
  * [[StreamingDedup]] / [[StreamingAnn]] / [[StreamingIvf]] /
  * [[StreamingCommunities]] / [[StreamingSubstr]] / [[StreamingQuality]]
  * / [[StreamingShard]] / [[StreamingFrontier]]): the concat-and-chunk
  * manifest ([[graft.queries.LlmOps.packChunks]]) over a CONTINUOUS
  * token stream. Unlike the shard writer's global permutation (which
  * cannot stream and therefore emits per-epoch generations), the
  * prefix sum is append-only — new docs only EXTEND the stream — so
  * each micro-batch's manifest continues exactly where the previous
  * one ended: `pack/batch=<id>` carries stream-global token offsets
  * and chunk ids, and the concatenation of all batches IS the batch
  * operator applied to the arrival-ordered stream (suite-pinned).
  *
  * The carried state is ONE number (the next token offset), persisted
  * as `base/batch=<id>` with the parquet _SUCCESS marker as its
  * commit. Exactly-once on foreachBatch retries rides the manifest's
  * own marker, manifest-first/base-second: a replay that finds the
  * manifest committed but the base advance torn RE-DERIVES the base
  * from the committed manifest (offset + token sum — deterministic),
  * so the two can never disagree; a replay that finds both committed
  * is a no-op. Batches must commit in ascending batch order, which
  * foreachBatch guarantees; a lower-water replay is detected by its
  * committed marker, never recomputed against a newer base.
  */
object StreamingPack {

  /** One micro-batch (public so retry idempotence and the crash-order
    * drills are testable without driving a stream). Expects
    * (doc_id, text). */
  def applyBatch(batch: DataFrame, outDir: String, seqLen: Long,
                 batchId: Long): Unit = {
    val spark = batch.sparkSession
    val fs = org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI(outDir), spark.sparkContext.hadoopConfiguration)
    def committed(dir: String): Boolean =
      fs.exists(new org.apache.hadoop.fs.Path(s"$dir/_SUCCESS"))
    if (committed(s"$outDir/pack/batch=$batchId")) {
      // replay after the manifest committed: never re-pack (a newer
      // base would renumber committed history); heal the base advance
      // if the first attempt crashed between the two writes
      if (!committed(s"$outDir/base/batch=$batchId"))
        writeBase(spark, outDir, batchId, baseFromManifest(spark, outDir, batchId))
      return
    }
    // an empty batch packs nothing and the base carries forward — no
    // marker either (an empty-df parquet dir has no readable schema,
    // the StreamingShard.hasRawEpochs lesson), and the replay path is
    // consistent: recomputing an empty batch is free
    if (batch.isEmpty) return
    val base = latestBase(spark, outDir) match {
      case Some((b, tok)) =>
        require(b < batchId,
          s"StreamingPack: base batch=$b is not below replayed batch=$batchId " +
            "whose manifest is missing — the stream state is torn; repair " +
            "pack/ before continuing")
        tok
      case None => 0L
    }
    val manifest = graft.queries.LlmOps.packChunks(
      batch.select("doc_id", "text"), seqLen, baseOffset = base)
    manifest.write.mode("overwrite").parquet(s"$outDir/pack/batch=$batchId")
    writeBase(spark, outDir, batchId, baseFromManifest(spark, outDir, batchId))
  }

  /** The next token offset after `batchId`'s COMMITTED manifest —
    * max(tok_start + n_tokens), or the previous base for an empty
    * batch. Deterministic from committed bytes, so the heal path and
    * the first write agree by construction. */
  private def baseFromManifest(spark: SparkSession, outDir: String,
                               batchId: Long): Long = {
    val m = spark.read.parquet(s"$outDir/pack/batch=$batchId")
    val r = m.agg(max(col("tok_start") + col("n_tokens"))).head()
    if (r.isNullAt(0)) latestBase(spark, outDir).map(_._2).getOrElse(0L)
    else r.getLong(0)
  }

  private def writeBase(spark: SparkSession, outDir: String, batchId: Long,
                        nextTok: Long): Unit = {
    import spark.implicits._
    Seq(nextTok).toDF("next_tok")
      .repartition(1).write.mode("overwrite")
      .parquet(s"$outDir/base/batch=$batchId")
  }

  /** The committed stream state: (largest committed base batch, next
    * token offset), if any batch committed yet. */
  def latestBase(spark: SparkSession, outDir: String): Option[(Long, Long)] = {
    val fs = org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI(outDir), spark.sparkContext.hadoopConfiguration)
    val root = new org.apache.hadoop.fs.Path(s"$outDir/base")
    if (!fs.exists(root)) None
    else fs.listStatus(root).toSeq.map(_.getPath.getName)
      .collect { case n if n.startsWith("batch=") => n.stripPrefix("batch=").toLong }
      .filter(b => fs.exists(new org.apache.hadoop.fs.Path(
        s"$outDir/base/batch=$b/_SUCCESS")))
      .sorted.lastOption
      .map(b => (b, spark.read.parquet(s"$outDir/base/batch=$b")
        .head().getLong(0)))
  }

  /** Attach the packer to a streaming (doc_id, text) frame. */
  def packSink(docs: DataFrame, outDir: String, seqLen: Long,
               checkpointDir: Option[String] = None): StreamingQuery =
    docs.writeStream
      .option("checkpointLocation", checkpointDir.getOrElse(s"$outDir.checkpoint"))
      .foreachBatch((b: Dataset[Row], id: Long) =>
        applyBatch(b.toDF(), outDir, seqLen, id))
      .start()

  /** The whole stream's manifest so far (partition column `batch`) —
    * stream-global offsets and chunk ids. */
  def manifest(spark: SparkSession, outDir: String): DataFrame =
    spark.read.parquet(s"$outDir/pack")
}
