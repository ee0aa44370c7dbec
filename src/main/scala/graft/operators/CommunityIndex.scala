package graft.operators

import graft.streaming.VersionedState
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** PERSISTED incremental community index — the fourth on-disk index family
  * (after [[DedupIndex]], [[graft.ml.IvfIndex]], [[graft.ml.KnnGraph]]):
  * a versioned labeling of a growing undirected graph, advanced batch by
  * batch through frontier-driven label propagation
  * ([[LabelPropagation.refreshOnAdjacency]]) so that per-append work is
  * ∝ the delta's neighborhood, never O(|E|).
  *
  * [[graft.streaming.StreamingDedup.refreshCommunities]] is this machine
  * specialized to the dedup stream's outputs; this is the PUBLIC form for
  * library callers who maintain their own edge feed (citation arrivals,
  * link crawls, similarity pairs from any source). Closing the gap the
  * round-9 roadmap names: the generic `LabelPropagation.refresh` rebuilds
  * the symmetrized adjacency — one O(|E|) distinct — per call; here the
  * adjacency is STATE, appended delta-by-delta.
  *
  * On-disk layout under `path` (the shared versioned-state conventions —
  * docs/versioned-state-machines.md):
  *   - `adj/batch=<v>`: adjacency deltas — symmetrized new edges plus one
  *     self-loop per first-seen node. The union of all committed deltas IS
  *     the vote adjacency; nothing ever rewrites it.
  *   - `v<v>`: the committed labeling (id, label) at version v,
  *     `_SUCCESS`-gated; the newest `keepVersions` snapshots survive
  *     (default 2 = {predecessor, current}, the minimum retry window;
  *     raise it for [[labelsAt]] time-travel reads). The snapshot write
  *     is the one linear-in-|V| step per advance — columnar, no shuffle.
  *
  * Crash contract (ad-hoc caller, no replay driver): labels commit AFTER
  * their adjacency delta, so on entry any `adj/batch=` above the committed
  * label head is a torn previous call and is deleted before recomputing —
  * the adjacency dir then covers exactly the committed range, preserving
  * [[LabelPropagation.refreshOnAdjacency]]'s (src, dst)-uniqueness
  * contract (a duplicate edge double-counts votes). Re-advancing to an
  * already-committed version is a no-op returning the stored labeling.
  *
  * Determinism: inherits the synchronous-LPA tie rules (plurality, min
  * label) — the labeling is a pure function of the committed batch
  * sequence.
  */
object CommunityIndex {

  /** Newest committed labeling version, if any. */
  def version(spark: SparkSession, path: String): Option[Long] =
    VersionedState.committedVersions(spark, path).maxOption

  /** The committed head labeling (id, label). */
  def labels(spark: SparkSession, path: String): DataFrame = {
    val v = version(spark, path).getOrElse(
      throw new IllegalStateException(s"no committed community index under $path"))
    spark.read.parquet(s"$path/v$v")
  }

  /** The labeling AS OF a specific committed version — the time-travel
    * read (how did the communities look at watermark v?). Available for
    * the newest `keepVersions` snapshots ([[advance]]'s retention knob,
    * default 2); older watermarks are pruned. */
  def labelsAt(spark: SparkSession, path: String, version: Long): DataFrame = {
    require(VersionedState.committedVersions(spark, path).contains(version),
      s"version $version is not committed under $path — retention keeps " +
        "only the newest keepVersions snapshots")
    spark.read.parquet(s"$path/v$version")
  }

  /** The accumulated vote adjacency (symmetrized + self-loops), committed
    * range only — call after the entry hygiene [[advance]] runs, or on a
    * quiesced index. */
  def adjacency(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(s"$path/adj").select("src", "dst")

  /** Initialize the index: converged labeling over (`nodes`, `edges`) as
    * version 0. `edges` (src, dst) undirected, each pair once; endpoints
    * need not appear in `nodes`. Fails if the path already holds a
    * committed index (use [[append]] to grow one). */
  def build(nodes: DataFrame, edges: DataFrame, path: String,
            maxRounds: Int = 50): DataFrame = {
    val spark = nodes.sparkSession
    require(version(spark, path).isEmpty,
      s"$path already holds a committed community index — append to it")
    advance(path, 0L, nodes, edges, maxRounds)
  }

  /** Grow the index by one delta: new nodes (possibly isolated) and new
    * undirected edges (each pair once; MAY repeat edges already indexed —
    * repeats are dropped against the committed adjacency with one
    * broadcast-delta anti-join, a scan of the adjacency, no shuffle of
    * it). Advances the labeling to version head+1 by frontier refresh
    * seeded with the delta's endpoints, and returns it. */
  def append(newNodes: DataFrame, newEdges: DataFrame, path: String,
             maxRounds: Int = 50, keepVersions: Int = 2): DataFrame = {
    val spark = newNodes.sparkSession
    val head = version(spark, path).getOrElse(
      throw new IllegalStateException(s"no committed community index under $path — build first"))
    advance(path, head + 1, newNodes, newEdges, maxRounds,
      keepVersions = keepVersions)
  }

  /** The idempotent core: bring the labeling to `newVersion` with the
    * given delta. `newVersion` must be the committed head (retry — stored
    * labeling returned, nothing recomputed) or any later version (gaps
    * allowed: versions are watermarks, not a dense sequence).
    * `assumeUniqueDelta` skips the repeat-edge scan for callers whose feed
    * guarantees each undirected edge arrives exactly once across the
    * index's life ([[graft.streaming.StreamingDedup]]'s pair stream: a
    * doc's pairs surface only the batch it arrives). `keepVersions` is
    * the snapshot retention (newest N committed labelings survive;
    * ≥ 2 preserves the retry window — see [[labelsAt]]). */
  def advance(path: String, newVersion: Long, newNodes: DataFrame,
              newEdges: DataFrame, maxRounds: Int = 50,
              assumeUniqueDelta: Boolean = false,
              keepVersions: Int = 2): DataFrame = {
    val spark = newNodes.sparkSession
    require(keepVersions >= 2,
      s"need keepVersions >= 2 (the retry window reads the predecessor), got $keepVersions")
    val committed = version(spark, path)
    require(committed.forall(_ <= newVersion),
      s"version $newVersion is below the committed head ${committed.get} of $path")
    if (committed.contains(newVersion))
      return spark.read.parquet(s"$path/v$newVersion")
    // entry hygiene: first finish/undo any crashed compact (the adjacency
    // dir must exist and staging dirs must never be mistaken for state),
    // then drop adjacency deltas above the committed head — a torn
    // previous call — before this call writes its own
    recoverCompact(spark, path)
    adjBatches(spark, path).filter(b => !committed.exists(b <= _))
      .foreach(b => VersionedState.delete(spark, s"$path/adj/batch=$b"))

    // self-edges are the INDEX's bookkeeping (one self-loop per node,
    // written when the node first appears) — a caller's (a, a) edge would
    // double a's own-label vote next to that self-loop, so strip them
    val edges = newEdges.select(col("src"), col("dst"))
      .filter(col("src") =!= col("dst"))
    val explicitIds = newNodes.select(col("id"))
    val endpointIds = edges.select(col("src").as("id"))
      .unionByName(edges.select(col("dst").as("id")))
      .unionByName(explicitIds)
      .distinct()
    val (labels0, arrivals, frontier, nodes) = committed match {
      case None =>
        // cold start: everyone seeds as their own label, everyone active
        (endpointIds.limit(0).select(col("id"), col("id").as("label")),
          endpointIds, endpointIds, endpointIds)
      case Some(v) =>
        val base = spark.read.parquet(s"$path/v$v")
        val arrivals = endpointIds.join(base.select("id"), Seq("id"), "left_anti")
        // set union as one full-outer join (union-free: both branches would
        // reference `base` — the Catalyst constraint-rewrite trap)
        val all = base.select(col("id"))
          .join(endpointIds, Seq("id"), "full_outer").select(col("id"))
        (base, arrivals, endpointIds, all)
    }
    // symmetrize the delta and drop in-delta repeats (delta-sized
    // distinct); against the COMMITTED adjacency, repeats fall to a
    // broadcast anti-join — the committed side is scanned once, never
    // shuffled
    val symm0 = edges
      .unionByName(edges.select(col("dst").as("src"), col("src").as("dst")))
    val symm = if (assumeUniqueDelta) symm0 else symm0.distinct()
    val newLinks =
      if (assumeUniqueDelta || committed.isEmpty) symm
      else dropIndexed(adjacency(spark, path), symm)
    newLinks
      .unionByName(arrivals.select(col("id").as("src"), col("id").as("dst")))
      .write.mode("overwrite").parquet(s"$path/adj/batch=$newVersion")
    val adj = spark.read.parquet(s"$path/adj").select("src", "dst")
    val (refreshed, _) = LabelPropagation
      .refreshOnAdjacency(labels0, nodes, adj, frontier, maxRounds)
    refreshed.write.mode("overwrite").parquet(s"$path/v$newVersion")
    // prune to the newest keepVersions committed snapshots (default 2 =
    // {predecessor, current}, the minimum retry window)
    VersionedState.committedVersions(spark, path).sorted.reverse
      .drop(keepVersions)
      .foreach(v => VersionedState.delete(spark, s"$path/v$v"))
    spark.read.parquet(s"$path/v$newVersion")
  }

  /** Fold every adjacency delta into one `batch=<head>` partition — the
    * maintenance op bounding file-listing cost on a long-appended index
    * (the [[DedupIndex.compact]] discipline). Logical content unchanged:
    * the vote adjacency IS the union of its deltas. Crash-safe by
    * content-preservation: the compacted copy lands fully (with
    * `_SUCCESS`) under a sibling staging dir before the original moves,
    * then two renames swap it in — a crash leaves old, new, or a
    * recoverable stage, never a torn union. Single QUIESCED writer only.
    * Returns the number of delta dirs folded away. */
  def compact(spark: SparkSession, path: String): Int = {
    val head = version(spark, path).getOrElse(
      throw new IllegalStateException(s"no committed community index under $path"))
    // finish/undo a previously crashed compact FIRST: a stale adj_compact
    // from an earlier attempt (written at an older head) would otherwise
    // ride along this attempt's rename and duplicate every pre-crash edge
    recoverCompact(spark, path)
    // entry hygiene (the advance() rule): deltas above the committed head
    // are a torn previous call — never fold them in
    adjBatches(spark, path).filter(_ > head)
      .foreach(b => VersionedState.delete(spark, s"$path/adj/batch=$b"))
    val vs = adjBatches(spark, path)
    if (vs.size <= 1) return 0
    adjacency(spark, path)
      .write.mode("overwrite").parquet(s"$path/adj_compact/batch=$head")
    val fs = VersionedState.fileSystem(spark, path)
    val live = new org.apache.hadoop.fs.Path(s"$path/adj")
    val old = new org.apache.hadoop.fs.Path(s"$path/adj_old")
    require(fs.rename(live, old), s"compact: could not stage adj aside")
    require(fs.rename(new org.apache.hadoop.fs.Path(s"$path/adj_compact"), live),
      s"compact: could not swap in compacted adj (originals at adj_old)")
    fs.delete(old, true)
    vs.size - 1
  }

  /** Recovery for a compact() crashed at any point ([[VersionedState
    * .recoverSwap]] — the shared compactor discipline): restores the
    * invariant every reader/writer needs — `adj` exists, no staging
    * dirs remain, a stale stage never rides a later rename. */
  private def recoverCompact(spark: SparkSession, path: String): Unit =
    VersionedState.recoverSwap(spark,
      live = s"$path/adj", old = s"$path/adj_old", stage = s"$path/adj_compact")

  /** The standalone entry-hygiene sweep ([[advance]] and [[compact]] run
    * the same steps on entry; this exposes it as the uniform `recover`
    * verb — [[IndexMaintenance]]): finish/undo a crashed compact, delete
    * adjacency deltas above the committed label head (a torn previous
    * call's work-in-progress), and delete label snapshot dirs that never
    * committed. Single-writer only. */
  def cleanupUncommitted(spark: SparkSession, path: String): Unit = {
    recoverCompact(spark, path)
    val head = version(spark, path)
    adjBatches(spark, path).filter(b => head.forall(_ < b))
      .foreach(b => VersionedState.delete(spark, s"$path/adj/batch=$b"))
    val committed = VersionedState.committedVersions(spark, path).toSet
    VersionedState.versions(spark, path, prefix = "v")
      .filterNot(committed.contains)
      .foreach(v => VersionedState.delete(spark, s"$path/v$v"))
  }

  /** Rows of `symm` already present in the committed adjacency are
    * dropped WITHOUT shuffling the committed side: scan it once against
    * the broadcast delta (semi-join, output ≤ delta-sized), then drop
    * those from the delta — both sides of the second join are
    * delta-sized broadcasts. Plan shape suite-pinned (no Exchange on the
    * adjacency scan). */
  private[graft] def dropIndexed(adjacency: DataFrame, symm: DataFrame): DataFrame = {
    val dup = adjacency.join(broadcast(symm), Seq("src", "dst"), "left_semi")
    symm.join(broadcast(dup), Seq("src", "dst"), "left_anti")
  }

  private def adjBatches(spark: SparkSession, path: String): Seq[Long] =
    VersionedState.versions(spark, s"$path/adj", prefix = "batch=")
}
