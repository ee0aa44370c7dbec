package graft.streaming

import graft.operators.{ConnectedComponents, DedupIndex}
import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

/** Streaming near-dup gate over the persisted [[DedupIndex]] — the shape a
  * 100 TB ingestion pipeline actually runs: documents arrive as a stream,
  * each micro-batch is deduped against EVERYTHING accepted so far (the
  * index — never rescanning yesterday's text, one band join per batch),
  * survivors are appended to the index so the NEXT batch dedups against
  * them, and the accepted/pair feeds land as per-batch parquet.
  *
  * Semantics (greedy streaming dedup, the industry-standard rule):
  *   - a batch doc near-dup (jaccard >= threshold) of an already-ACCEPTED
  *     doc is rejected;
  *   - among the remaining batch docs, near-dup CLUSTERS (transitive
  *     closure over in-batch pairs, [[ConnectedComponents]] in O(log n)
  *     rounds) keep only their minimum doc_id as canonical.
  *   Arrival order therefore decides WHICH member of a cluster survives
  *   (the first-seen one), as in any streaming dedup; the invariant that
  *   does NOT depend on order — no two accepted docs form a near-dup pair,
  *   every rejected doc has a near-dup partner — is suite-pinned.
  *
  * Exactly-once on top of foreachBatch's at-least-once retries, with the
  * same versioned-commit discipline as [[EventStreams.applyCdcBatch]]:
  * batch b writes index version b+1 (version 0 is the base corpus build);
  * a version exists only once all subtables carry `_SUCCESS`
  * ([[DedupIndex.isCommitted]]). A retried batch first sweeps any
  * half-written version dirs ([[DedupIndex.cleanupUncommitted]]) so the
  * index it reads holds exactly the committed prefix, and — because the
  * accepted/pairs outputs are written BEFORE the index append, both
  * per-batch overwrites — a batch whose version is already committed has
  * nothing left to do and is skipped whole. Scale shape per batch: one
  * band equi-join of the batch against the stored band table (partition-
  * pruned parquet), the CC rounds touch only in-batch pairs.
  */
object StreamingDedup {

  /** One micro-batch of the dedup gate (public so retry idempotence and
    * the order-free invariants are testable without driving a stream).
    * Expects (doc_id, text) with doc_ids never seen before. */
  def applyBatch(batch: DataFrame, indexPath: String, outDir: String,
                 batchId: Long): Unit = {
    val spark = batch.sparkSession
    val version = batchId + 1
    DedupIndex.cleanupUncommitted(spark, indexPath)
    // committed version => outputs (written strictly before the append)
    // are complete too: the whole batch already happened
    if (DedupIndex.isCommitted(spark, indexPath, version)) return

    // sweep this batch's checkpoint blocks on exit — a long-lived stream
    // must not accumulate per-batch blocks (docs/long-lived-spark-jvm-
    // hygiene.md); all three frames are fully consumed inside this call
    val before = spark.sparkContext.getPersistentRDDs.keySet
    try {
      val docs = batch.select("doc_id", "text").localCheckpoint()
      // pairs against index ∪ batch, every pair touching a batch doc
      val pairs = DedupIndex.dedupAgainst(indexPath, docs).localCheckpoint()
      val indexIds = DedupIndex.indexedIds(spark, indexPath)

      // rejected outright: paired with an already-accepted (indexed) doc
      val rejIndexed = pairs
        .join(indexIds.select(col("doc_id").as("d1")), Seq("d1"), "left_semi")
        .select(col("d2").as("doc_id"))
        .unionByName(pairs
          .join(indexIds.select(col("doc_id").as("d2")), Seq("d2"), "left_semi")
          .select(col("d1").as("doc_id")))
        .distinct()

      // in-batch pairs among the survivors -> transitive clusters -> keep
      // the minimum doc_id of each component
      val survivors = docs.select("doc_id")
        .join(rejIndexed, Seq("doc_id"), "left_anti")
      val inBatch = pairs
        .join(survivors.select(col("doc_id").as("d1")), Seq("d1"), "left_semi")
        .join(survivors.select(col("doc_id").as("d2")), Seq("d2"), "left_semi")
      val (labels, _) = ConnectedComponents.run(
        inBatch.select(col("d1").as("u"), col("d2").as("v")))
      val rejClustered = labels.filter(col("u") =!= col("label"))
        .select(col("u").as("doc_id"))

      val accepted = docs
        .join(rejIndexed.unionByName(rejClustered), Seq("doc_id"), "left_anti")
        .localCheckpoint()

      // outputs first (overwrite-idempotent per batch), THEN the version
      // append — the commit point that marks the batch done
      accepted.write.mode("overwrite").parquet(s"$outDir/accepted/batch=$batchId")
      pairs.write.mode("overwrite").parquet(s"$outDir/pairs/batch=$batchId")
      DedupIndex.appendVersion(accepted, indexPath, version)
    } finally {
      val live = spark.sparkContext.getPersistentRDDs
      (live.keySet -- before).foreach(id =>
        live.get(id).foreach(_.unpersist(blocking = false)))
    }
  }

  /** Attach the gate to a streaming (doc_id, text) frame. `indexPath` must
    * hold a built index over the seed corpus (parquet schema inference
    * needs at least one data file, so an empty seed is not supported).
    * The checkpoint keeps batchIds monotonic across restarts — same
    * reasoning as [[EventStreams.cdcUpsertSink]]. */
  def dedupSink(docs: DataFrame, indexPath: String, outDir: String,
                checkpointDir: Option[String] = None): StreamingQuery =
    docs.writeStream
      .option("checkpointLocation", checkpointDir.getOrElse(s"$outDir.checkpoint"))
      .foreachBatch((b: Dataset[Row], id: Long) =>
        applyBatch(b.toDF(), indexPath, outDir, id))
      .start()

  /** All accepted docs so far (partition column `batch` = arrival batch). */
  def acceptedDocs(spark: SparkSession, outDir: String): DataFrame =
    spark.read.parquet(s"$outDir/accepted")

  /** All near-dup pairs observed so far, tagged by the batch that saw them. */
  def observedPairs(spark: SparkSession, outDir: String): DataFrame =
    spark.read.parquet(s"$outDir/pairs")

  /** Communities over the stream's accumulated near-dup evidence: LPA
    * ([[graft.operators.LabelPropagation]]) on the observed pair graph at
    * the CURRENT commit state — the graph-analytics view of a running
    * dedup stream (which template families keep arriving, which accepted
    * doc anchors each). Nodes are every accepted doc plus both endpoints
    * of every observed pair (a seed-index doc enters once it witnesses a
    * rejection). Recompute-per-call is the honest baseline: `iters`
    * synchronous rounds of O(|E|) equi-joins over a pair graph LINEAR in
    * rejections; an edge-delta incremental refresh is the designed next
    * step (ROADMAP). */
  def communities(spark: SparkSession, outDir: String, iters: Int = 4): DataFrame = {
    val pairs = observedPairs(spark, outDir)
      .select(col("d1").as("src"), col("d2").as("dst"))
    val nodes = acceptedDocs(spark, outDir).select(col("doc_id").as("id"))
      .unionByName(pairs.select(col("src").as("id")))
      .unionByName(pairs.select(col("dst").as("id")))
      .distinct()
    graft.operators.LabelPropagation.run(nodes, pairs, iters)
  }

  /** Label snapshots advance by AD-HOC calls (no replay driver), so only
    * `_SUCCESS`-committed versions count: a torn write is invisible and
    * the next call recomputes from the last good version, overwriting it. */
  private def labelVersions(spark: SparkSession, stateDir: String): Seq[Long] =
    VersionedState.committedVersions(spark, stateDir)

  private def adjBatches(spark: SparkSession, stateDir: String): Seq[Long] = {
    val p = new org.apache.hadoop.fs.Path(s"$stateDir/adj")
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) Seq.empty
    else fs.listStatus(p).toSeq.map(_.getPath.getName)
      .filter(_.startsWith("batch="))
      .flatMap(n => scala.util.Try(n.stripPrefix("batch=").toLong).toOption)
  }

  /** INCREMENTALLY maintained communities — the per-batch refresh that
    * replaces [[communities]]' full recompute in a long-running stream.
    * Two pieces of state live under `stateDir`:
    *   - `v<batch>`: the committed labeling at that batch watermark;
    *   - `adj/batch=<batch>`: adjacency DELTAS — the symmetrized new
    *     pairs plus self-loops for first-seen nodes, appended per refresh
    *     (pair uniqueness holds by construction: a pair's d2 arrives
    *     exactly once, and a self-loop is written the batch its node
    *     first appears). The union of all deltas IS the vote adjacency —
    *     no per-call symmetrize/distinct over the accumulated graph.
    * Each call advances the labeling to the stream's current commit
    * state by frontier-driven label propagation
    * ([[graft.operators.LabelPropagation.refreshOnAdjacency]]) seeded
    * with ONLY the delta since the committed version — endpoints of new
    * pairs plus newly accepted docs. Per-call SHUFFLE is ∝ the delta's
    * neighborhood (the committed labeling is the immutable base; rounds
    * accumulate small overrides), never O(|E|); the committed snapshot
    * write is the one linear-in-|V| step — columnar output, no shuffle.
    * On a stable graph (no new batches) the call is a pure read of the
    * committed labeling. Cold start (no committed state) seeds every
    * node — a full convergence run through the same code path.
    *
    * Label-snapshot discipline mirrors [[TemporalJoin]]: labels land at
    * `stateDir/v<maxBatch>` (overwrite-idempotent), versions below the
    * predecessor are pruned — at most two snapshots ever exist. The
    * adjacency deltas accumulate: they ARE the graph (state linear in
    * observed pairs, the same bound [[communities]] reads). */
  def refreshCommunities(spark: SparkSession, outDir: String,
                         stateDir: String, maxRounds: Int = 50): DataFrame = {
    val pairsAll = observedPairs(spark, outDir)
    val acceptedAll = acceptedDocs(spark, outDir)
    val maxRow = pairsAll.select(col("batch").cast("long").as("b"))
      .unionByName(acceptedAll.select(col("batch").cast("long").as("b")))
      .agg(max(col("b"))).head()
    require(!maxRow.isNullAt(0), s"no committed dedup batches under $outDir")
    val maxBatch = maxRow.getLong(0)
    val committed = labelVersions(spark, stateDir).maxOption
    if (committed.contains(maxBatch))
      return spark.read.parquet(s"$stateDir/v$maxBatch")
    // crash hygiene BEFORE computing the delta: adjacency partitions above
    // the committed label version are a previous call's uncommitted
    // leftovers. A retry that left them in place after a NEW dedup batch
    // arrived would re-cover the same ingest range in two partitions —
    // duplicate rows breaking refreshOnAdjacency's uniqueness contract
    // (double-counted votes). Deleting them restores the invariant that
    // the adjacency dir covers exactly the committed range.
    adjBatches(spark, stateDir).filter(b => !committed.exists(b <= _))
      .foreach(b => VersionedState.delete(spark, s"$stateDir/adj/batch=$b"))
    val (labels0, newPairs, newNodes, frontier, nodes) = committed match {
      case None =>
        // cold start: everyone is their own label, everyone is active
        val edges = pairsAll.select(col("d1").as("src"), col("d2").as("dst"))
        val all = acceptedAll.select(col("doc_id").as("id"))
          .unionByName(edges.select(col("src").as("id")))
          .unionByName(edges.select(col("dst").as("id")))
          .distinct()
        (all.limit(0).select(col("id"), col("id").as("label")),
          pairsAll, all, all, all)
      case Some(v) =>
        val np = pairsAll.filter(col("batch").cast("long") > v)
        val newAccepted = acceptedAll.filter(col("batch").cast("long") > v)
        val seed = np.select(col("d1").as("id"))
          .unionByName(np.select(col("d2").as("id")))
          .unionByName(newAccepted.select(col("doc_id").as("id")))
          .distinct()
        val base = spark.read.parquet(s"$stateDir/v$v")
        // first-seen nodes = active nodes absent from the committed
        // labeling, and the CURRENT node set = committed ids + those
        // arrivals (the labeling covers every node seen so far by
        // invariant) — no O(|V|+|E|) re-distinct of the whole graph
        val arrivals = seed.join(base.select("id"), Seq("id"), "left_anti")
        // set union as one full-outer join (union-free: both branches
        // would reference `base`, the Catalyst constraint-rewrite trap)
        val all = base.select(col("id"))
          .join(seed, Seq("id"), "full_outer").select(col("id"))
        (base, np, arrivals, seed, all)
    }
    // adjacency delta: symmetrized new pairs + self-loops for first-seen
    // nodes — overwrite-idempotent per batch partition
    newPairs.select(col("d1").as("src"), col("d2").as("dst"))
      .unionByName(newPairs.select(col("d2").as("src"), col("d1").as("dst")))
      .unionByName(newNodes.select(col("id").as("src"), col("id").as("dst")))
      .write.mode("overwrite").parquet(s"$stateDir/adj/batch=$maxBatch")
    val adj = spark.read.parquet(s"$stateDir/adj").select("src", "dst")
    val (refreshed, _) = graft.operators.LabelPropagation
      .refreshOnAdjacency(labels0, nodes, adj, frontier, maxRounds)
    refreshed.write.mode("overwrite").parquet(s"$stateDir/v$maxBatch")
    committed.foreach { p =>
      labelVersions(spark, stateDir).filter(_ < p).foreach(v =>
        VersionedState.delete(spark, s"$stateDir/v$v"))
    }
    spark.read.parquet(s"$stateDir/v$maxBatch")
  }
}
