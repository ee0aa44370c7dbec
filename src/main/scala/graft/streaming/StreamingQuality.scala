package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.streaming.StreamingQuery

/** Streaming document scoring through a FROZEN persisted quality probe —
  * the learned quality gate's serving story (the sixth streaming twin,
  * after [[StreamingDedup]] / [[StreamingAnn]] / [[StreamingIvf]] /
  * [[StreamingCommunities]] / [[StreamingSubstr]]): the probe is trained
  * ONCE per corpus refresh ([[graft.queries.LlmOps.qualityProbeFit]] →
  * [[graft.ml.LinearProbe.saveModel]]), and each arriving micro-batch is
  * scored against the frozen weights + calibration
  * ([[graft.queries.LlmOps.qualityProbeServe]] — feature hash, codegen'd
  * argmax, sigmoid confidence; no refit, so scores are comparable across
  * the stream's whole lifetime and a retrain is an explicit, auditable
  * model swap).
  *
  * Exactly-once on foreachBatch's at-least-once retries comes free from
  * statelessness: scoring writes only `outDir/scores/batch=<id>` and a
  * retry of the same batch overwrites its own directory with identical
  * content (deterministic model + deterministic features). No index
  * mutation, no versioned commit protocol needed.
  */
object StreamingQuality {

  /** One micro-batch (public so retry idempotence is testable without
    * driving a stream). Expects (doc_id, text). When the frozen artifact
    * carries a [[graft.queries.LlmOps.qualityProbeFreeze]] drift capture
    * (`score_meta`), the batch also records its margin-distribution
    * drift row — the same telemetry contract as [[applyBatchWide]]. */
  def applyBatch(batch: DataFrame, modelPath: String, outDir: String,
                 batchId: Long): Unit = {
    // ONE scoring pass per batch (ADVICE r13): the feature-hash leg is
    // the expensive one, and serve-then-staleness would run it twice —
    // the raw prediction frame is checkpointed once and BOTH the scores
    // sink and the drift row derive from it (the curateDocsServe
    // shared-pass move, lifted to the micro-batch).
    val raw = graft.queries.LlmOps.denseServedRaw(
      batch.select("doc_id", "text"), modelPath).localCheckpoint()
    graft.queries.LlmOps.denseServeFromRaw(raw, modelPath)
      .write.mode("overwrite").parquet(s"$outDir/scores/batch=$batchId")
    val spark = batch.sparkSession
    val fs = org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI(modelPath), spark.sparkContext.hadoopConfiguration)
    if (fs.exists(new org.apache.hadoop.fs.Path(s"$modelPath/score_meta")) &&
        !batch.isEmpty) {
      val (fitN, serveN, fitMean, serveMean, fitSd, shift) =
        graft.queries.LlmOps.denseStalenessFromRaw(raw, modelPath)
      import spark.implicits._
      Seq((fitN, serveN, fitMean, serveMean, fitSd, shift))
        .toDF("n_fit", "n_serve", "mean_fit", "mean_serve", "sd_fit", "shift")
        .repartition(1).write.mode("overwrite")
        .parquet(s"$outDir/drift/batch=$batchId")
    }
  }

  /** Attach the scorer to a streaming (doc_id, text) frame. `modelPath`
    * must hold a [[graft.ml.LinearProbe.saveModel]] probe. */
  def scoreSink(docs: DataFrame, modelPath: String, outDir: String,
                checkpointDir: Option[String] = None): StreamingQuery =
    docs.writeStream
      .option("checkpointLocation", checkpointDir.getOrElse(s"$outDir.checkpoint"))
      .foreachBatch((b: Dataset[Row], id: Long) =>
        applyBatch(b.toDF(), modelPath, outDir, id))
      .start()

  /** Every scored doc so far (partition column `batch` = arrival batch). */
  def scores(spark: SparkSession, outDir: String): DataFrame =
    spark.read.parquet(s"$outDir/scores")

  /** The WIDE-probe twins of [[applyBatch]]/[[scoreSink]]: identical
    * statelessness-derived exactly-once story, scoring each micro-batch
    * against a frozen [[graft.queries.LlmOps.qualityProbeWideFreeze]]
    * artifact (weights + calibration + the training bucket width — the
    * feature hash can never drift from the fit).
    *
    * DRIFT TELEMETRY (round 13, on top of VERDICT r12 #6's gauge): each
    * non-empty micro-batch also records its
    * [[graft.queries.LlmOps.qualityProbeWideStaleness]] row at
    * `outDir/drift/batch=<id>` — the per-batch retrain alarm a serving
    * stream actually watches (a drifting corpus shows up as a RISING
    * `shift` series long before anyone reruns the batch gauge by hand).
    * Same exactly-once story: the row is a deterministic function of the
    * batch and the frozen artifact, so a retry overwrites identical
    * bytes. A pre-r13 artifact (no `score_meta` capture) skips the row —
    * scoring still works; the alarm needs a re-freeze. */
  def applyBatchWide(batch: DataFrame, modelPath: String, outDir: String,
                     batchId: Long): Unit = {
    // shared-pass per batch (ADVICE r13) — see [[applyBatch]]
    val raw = graft.queries.LlmOps.wideServedRaw(
      batch.select("doc_id", "text"), modelPath).localCheckpoint()
    graft.queries.LlmOps.wideServeFromRaw(raw, modelPath)
      .write.mode("overwrite").parquet(s"$outDir/scores/batch=$batchId")
    val spark = batch.sparkSession
    val fs = org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI(modelPath), spark.sparkContext.hadoopConfiguration)
    val hasCapture = fs.exists(
      new org.apache.hadoop.fs.Path(s"$modelPath/score_meta"))
    if (hasCapture && !batch.isEmpty) {
      val (fitN, serveN, fitMean, serveMean, fitSd, shift) =
        graft.queries.LlmOps.wideStalenessFromRaw(raw, modelPath)
      import spark.implicits._
      Seq((fitN, serveN, fitMean, serveMean, fitSd, shift))
        .toDF("n_fit", "n_serve", "mean_fit", "mean_serve", "sd_fit", "shift")
        .repartition(1).write.mode("overwrite")
        .parquet(s"$outDir/drift/batch=$batchId")
    }
  }

  /** The per-batch drift series (partition column `batch`): one
    * [[applyBatchWide]] telemetry row per scored non-empty micro-batch. */
  def drift(spark: SparkSession, outDir: String): DataFrame =
    spark.read.parquet(s"$outDir/drift")

  def scoreSinkWide(docs: DataFrame, modelPath: String, outDir: String,
                    checkpointDir: Option[String] = None): StreamingQuery =
    docs.writeStream
      .option("checkpointLocation", checkpointDir.getOrElse(s"$outDir.checkpoint"))
      .foreachBatch((b: Dataset[Row], id: Long) =>
        applyBatchWide(b.toDF(), modelPath, outDir, id))
      .start()
}
