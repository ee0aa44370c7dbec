package graft.operators

import org.apache.spark.sql.SparkSession

/** ONE dialect for the maintenance verbs every persisted index family
  * exposes — callers stop learning five vocabularies
  * (`cleanupUncommitted` vs `cleanupUncommittedIngest` vs
  * `cleanupUncommittedIndex`; `compact` vs `compactCells` vs
  * `compactVectors`; `pruneVersions` vs the `keepVersions` knob).
  * Family-specific build/append/serve calls keep their own signatures —
  * they genuinely differ — and docs/versioned-state-machines.md maps
  * every family to the full verb table.
  *
  * The three uniform verbs:
  *  - [[recover]]: finish/undo any crashed compact and sweep torn
  *    (uncommitted) batches — safe at ANY entry, idempotent,
  *    single-writer. Every family's own write entry points run the same
  *    sweep; this is the standalone form for ops tooling.
  *  - [[compact]]: fold accumulated versioned directories into one —
  *    committed reads byte-identical before/after (suite-pinned per
  *    family); returns the number of directories folded away.
  *  - [[prune]]: drop unreachable OLD versions (snapshot retention).
  *    Only the graph index keeps independent full snapshots to prune;
  *    delta stores' only space lever is [[compact]] (the union of deltas
  *    IS the state), and the community index prunes inline via its
  *    `keepVersions` knob at every advance — for those this returns Nil.
  */
object IndexMaintenance {

  /** The persisted index families (the PQ codes layout counts separately
    * from the float cells layout — same machinery, different path). */
  sealed abstract class Family(val name: String)
  /** Doc-level near-dup index — [[DedupIndex]]. */
  case object Dedup extends Family("dedup")
  /** Float IVF vector index ([[graft.ml.IvfIndex.buildIndex]] cells
    * layout). */
  case object Ivf extends Family("ivf")
  /** IVF-PQ index ([[graft.ml.IvfIndex.buildPqIndex]] codes layout —
    * distinct path, same ingest machinery). A `keepFloat` build's float
    * re-rank twin (`cells/` beside the codes) rides the SAME verbs:
    * recover/compact sweep and fold both layouts in lockstep. */
  case object IvfPq extends Family("ivf-pq")
  /** k-NN graph index — [[graft.ml.KnnGraph]]. */
  case object Knn extends Family("knn")
  /** Incremental community labeling — [[CommunityIndex]]. */
  case object Community extends Family("community")
  /** Exact-substring window index — [[SubstrIndex]]. */
  case object Substr extends Family("substr")

  val families: Seq[Family] = Seq(Dedup, Ivf, IvfPq, Knn, Community, Substr)

  /** Entry-hygiene sweep: crashed-compact recovery + torn-batch cleanup. */
  def recover(spark: SparkSession, family: Family, path: String): Unit =
    family match {
      case Dedup => DedupIndex.cleanupUncommitted(spark, path)
      case Ivf => graft.ml.IvfIndex.cleanupUncommittedIngest(spark, path)
      case IvfPq => graft.ml.IvfIndex.cleanupUncommittedPq(spark, path)
      case Knn => graft.ml.KnnGraph.cleanupUncommittedIndex(spark, path)
      case Community => CommunityIndex.cleanupUncommitted(spark, path)
      case Substr => SubstrIndex.cleanupUncommitted(spark, path)
    }

  /** Fold accumulated batch/delta dirs; returns directories folded away. */
  def compact(spark: SparkSession, family: Family, path: String): Int =
    family match {
      case Dedup => DedupIndex.compact(spark, path)
      case Ivf => graft.ml.IvfIndex.compactCells(spark, path)
      case IvfPq => graft.ml.IvfIndex.compactPqCodes(spark, path)
      case Knn => graft.ml.KnnGraph.compactVectors(spark, path)
      case Community => CommunityIndex.compact(spark, path)
      case Substr => SubstrIndex.compact(spark, path)
    }

  /** Drop unreachable old snapshot versions, keeping the newest `keep`;
    * returns the versions dropped (Nil for the delta-state families —
    * see the class doc). */
  def prune(spark: SparkSession, family: Family, path: String,
            keep: Int = 2): Seq[Long] =
    family match {
      case Knn => graft.ml.KnnGraph.pruneVersions(spark, path, keep)
      case _ => Nil
    }
}
