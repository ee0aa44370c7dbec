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

  /** Whether any raw epoch directory survives under `outDir/shards`.
    * After a full [[pruneEpochs]] the directory EXISTS but is empty —
    * a parquet read there fails schema inference — so existence of the
    * root is not the right probe; presence of an `epoch=` child is. */
  private def hasRawEpochs(spark: SparkSession, outDir: String): Boolean = {
    val fs = org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI(outDir), spark.sparkContext.hadoopConfiguration)
    val root = new org.apache.hadoop.fs.Path(s"$outDir/shards")
    fs.exists(root) &&
      fs.listStatus(root).exists(_.getPath.getName.startsWith("epoch="))
  }

  /** One generation's manifest, ordered like the batch operator's. */
  def epoch(spark: SparkSession, outDir: String, epochId: Long): DataFrame =
    shards(spark, outDir).filter(col("epoch") === epochId)
      .select(col("doc_id"), col("shard").cast("long").as("shard"),
        col("pos_in_shard"))
      .orderBy("doc_id")

  // ----------------------------------------------------------------
  // Generation compaction — a long-lived stream accumulates one tiny
  // generation per micro-batch; a training reader wants O(1) of them.
  // ----------------------------------------------------------------

  /** Merge epochs [0, uptoEpoch] into ONE re-balanced base generation at
    * `outDir/compact/upto=<uptoEpoch>` (the IndexMaintenance shape): the
    * union of those epochs' docs goes through the SAME batch
    * [[graft.queries.LlmOps.shardAssignment]], so the base generation
    * has the full seeded-permutation + |shard| ≤ 1-imbalance contract —
    * equivalence is pinned, not asserted. Re-compaction composes: if a
    * committed base already exists (`compact/upto=<E1>`), its doc set
    * stands in for the epochs it covers — after `pruneEpochs(E1)` those
    * raw directories are GONE, so a later `compact(E2 > E1)` that read
    * only raw epochs would commit a base silently missing every doc from
    * [0, E1] (ADVICE r12). The union is over the doc SET (a doc arriving
    * in two merged generations appears once in the merged one — the
    * "exactly once per generation" contract). Compacting BELOW the
    * committed base refuses loudly: committing `upto=<E2 < E1>` could
    * never become `latestCompaction`, so it would only waste writes or,
    * worse, mislead a manual reader. Idempotent: the assignment is
    * a deterministic function of the doc set and the write is an
    * overwrite, so a crashed or retried compact converges — and a retry
    * AT the committed watermark (uptoEpoch == latestCompaction, the
    * crashed-after-commit replay) short-circuits to a no-op: the
    * requested view already exists with its _SUCCESS marker, and
    * re-deriving it would lazily READ `compact/upto=<e>` while
    * Overwrite-WRITING the same directory, which Spark rejects
    * ("Cannot overwrite a path that is also being read from") — the
    * ADVICE r13 self-overwrite trap. The raw epoch directories are
    * untouched until [[pruneEpochs]], whose commit check (the writer's
    * _SUCCESS marker) makes the crash order safe:
    * compact → (marker lands) → prune. */
  def compact(spark: SparkSession, outDir: String, numShards: Int,
              uptoEpoch: Long): Unit = {
    val base = latestCompaction(spark, outDir)
    base.foreach { e =>
      require(uptoEpoch >= e,
        s"compact($uptoEpoch): a committed base already covers epochs <= $e; " +
          "a lower-water compaction can never be the latest view — refuse " +
          "rather than commit a misleading partial base")
    }
    // retry at the committed watermark: the exact requested base is
    // already committed (_SUCCESS checked by latestCompaction), so the
    // idempotence contract is satisfied by doing nothing — recomputing
    // would self-overwrite the directory being read (see scaladoc)
    if (base.contains(uptoEpoch)) return
    // raw epochs strictly above the committed base (below it they may be
    // pruned already; at-or-below they are REPRESENTED by the base)
    val raw =
      if (hasRawEpochs(spark, outDir)) Some(shards(spark, outDir)
        .filter(col("epoch") <= uptoEpoch &&
          col("epoch") > lit(base.getOrElse(-1L)))
        .select("doc_id"))
      else None
    val docs = (base.map(e =>
        spark.read.parquet(s"$outDir/compact/upto=$e").select("doc_id")),
        raw) match {
      case (Some(b), Some(r)) => b.unionByName(r)
      case (Some(b), None)    => b
      case (None, Some(r))    => r
      case (None, None) => throw new IllegalArgumentException(
        s"compact($uptoEpoch): neither raw epochs nor a committed base at $outDir")
    }
    graft.sources.PartitionedLayout.writePartitioned(
      graft.queries.LlmOps.shardAssignment(docs.distinct(), numShards),
      s"$outDir/compact/upto=$uptoEpoch", "shard")
  }

  /** The committed compacted base generation, if any: the largest
    * `upto=<E>` whose _SUCCESS marker landed. */
  def latestCompaction(spark: SparkSession, outDir: String): Option[Long] = {
    val fs = org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI(outDir), spark.sparkContext.hadoopConfiguration)
    val root = new org.apache.hadoop.fs.Path(s"$outDir/compact")
    if (!fs.exists(root)) None
    else fs.listStatus(root).toSeq
      .map(_.getPath.getName)
      .collect { case n if n.startsWith("upto=") => n.stripPrefix("upto=").toLong }
      .filter(e => fs.exists(new org.apache.hadoop.fs.Path(
        s"$outDir/compact/upto=$e/_SUCCESS")))
      .sorted.lastOption
  }

  /** Delete the raw epoch directories the committed compaction covers —
    * REFUSES (loudly) unless `compact/upto=<uptoEpoch>` committed its
    * _SUCCESS marker, so a crashed compact can never strand readers with
    * neither the raw epochs nor the base generation. */
  def pruneEpochs(spark: SparkSession, outDir: String, uptoEpoch: Long): Long = {
    val fs = org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI(outDir), spark.sparkContext.hadoopConfiguration)
    require(fs.exists(new org.apache.hadoop.fs.Path(
        s"$outDir/compact/upto=$uptoEpoch/_SUCCESS")),
      s"pruneEpochs($uptoEpoch): no committed compaction at " +
        s"$outDir/compact/upto=$uptoEpoch — run compact() first; pruning " +
        "now would strand readers with neither the raw epochs nor the base")
    val root = new org.apache.hadoop.fs.Path(s"$outDir/shards")
    if (!fs.exists(root)) 0L
    else fs.listStatus(root).toSeq
      .map(_.getPath)
      .filter { p =>
        val n = p.getName
        n.startsWith("epoch=") && n.stripPrefix("epoch=").toLong <= uptoEpoch
      }
      .count(p => fs.delete(p, true)).toLong
  }

  /** The unified reader view: the committed base generation (rows carry
    * epoch = -1 — "before every raw epoch") plus every RAW epoch after
    * the compaction point. Every doc appears exactly once per generation
    * it belongs to; nothing is lost or duplicated across a compact (the
    * suite pins the union). */
  def assignment(spark: SparkSession, outDir: String): DataFrame =
    latestCompaction(spark, outDir) match {
      case None => shards(spark, outDir)
        .select(col("doc_id"), col("pos_in_shard"),
          col("epoch").cast("long").as("epoch"), col("shard").cast("long").as("shard"))
      case Some(e) =>
        val baseView = spark.read.parquet(s"$outDir/compact/upto=$e")
          .select(col("doc_id"), col("pos_in_shard"),
            lit(-1L).as("epoch"), col("shard").cast("long").as("shard"))
        if (!hasRawEpochs(spark, outDir)) baseView
        else baseView
          .unionByName(shards(spark, outDir).filter(col("epoch") > e)
            .select(col("doc_id"), col("pos_in_shard"),
              col("epoch").cast("long").as("epoch"), col("shard").cast("long").as("shard")))
    }
}
