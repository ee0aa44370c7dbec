package graft.streaming

import org.apache.spark.sql.SparkSession

/** The ONE `v<N>` snapshot-directory naming convention shared by the
  * streaming state machines ([[TemporalJoin]] labels/history snapshots,
  * [[StreamingDedup]] community labelings).
  *
  * Two listing modes, matched to each caller's recovery contract:
  *   - `versions` (no commit gate): for state advanced ONLY by the
  *     streaming engine's foreachBatch replay — a torn snapshot is always
  *     the newest version and the engine re-runs exactly that batch,
  *     overwriting it before any later batch reads it ([[TemporalJoin]]).
  *   - `committedVersions` (`_SUCCESS`-gated): for state advanced by
  *     ad-hoc calls with no replay driver — a torn write must be
  *     INVISIBLE so the next call recomputes from the last good version
  *     and overwrites the torn dir ([[StreamingDedup.refreshCommunities]],
  *     [[graft.operators.CommunityIndex]], the DedupIndex.isCommitted
  *     discipline).
  */
private[graft] object VersionedState {

  private def fs(spark: SparkSession, dir: String) = {
    val p = new org.apache.hadoop.fs.Path(dir)
    (p.getFileSystem(spark.sparkContext.hadoopConfiguration), p)
  }

  def versions(spark: SparkSession, stateDir: String,
               prefix: String = "v"): Seq[Long] = {
    val (f, p) = fs(spark, stateDir)
    if (!f.exists(p)) Seq.empty
    else f.listStatus(p).toSeq.map(_.getPath.getName)
      .filter(_.startsWith(prefix))
      .flatMap(n => scala.util.Try(n.stripPrefix(prefix).toLong).toOption)
  }

  def committedVersions(spark: SparkSession, stateDir: String): Seq[Long] = {
    val (f, _) = fs(spark, stateDir)
    versions(spark, stateDir).filter(v =>
      f.exists(new org.apache.hadoop.fs.Path(s"$stateDir/v$v/_SUCCESS")))
  }

  def delete(spark: SparkSession, path: String): Unit = {
    val (f, p) = fs(spark, path)
    f.delete(p, true)
  }

  def fileSystem(spark: SparkSession, dir: String): org.apache.hadoop.fs.FileSystem =
    fs(spark, dir)._1

  /** Finish/undo a crashed staged-rename swap (`live` → `old`,
    * `stage` → `live`) — the ONE recovery every compactor shares (see
    * docs/versioned-state-machines.md "Compaction itself needs entry
    * recovery"): restore `old` to `live` if the live dir went missing
    * between the two renames, then sweep stage and old unconditionally
    * (a stale stage from a dead attempt must never ride a later
    * attempt's rename). */
  def recoverSwap(spark: SparkSession, live: String, old: String,
                  stage: String): Unit = {
    val (f, livePath) = fs(spark, live)
    val oldPath = new org.apache.hadoop.fs.Path(old)
    if (!f.exists(livePath) && f.exists(oldPath))
      require(f.rename(oldPath, livePath),
        s"swap recovery: could not restore $live from $old")
    f.delete(new org.apache.hadoop.fs.Path(stage), true)
    f.delete(oldPath, true)
  }
}
