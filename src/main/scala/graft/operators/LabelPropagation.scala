package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Synchronous label propagation (Raghavan, Albert, Kumara 2007) — the
  * community-detection primitive a curation pipeline runs over its
  * similarity graph: where [[ConnectedComponents]] answers "which docs are
  * transitively linked AT ALL", LPA answers "which docs form a densely
  * linked community", splitting a weakly bridged component into its cores
  * (near-dup cluster hygiene, template families, citation rings).
  *
  * Join-shaped synchronous rounds; every step an equi-join or aggregate:
  *   1. votes: undirected adjacency ⋈ current labels, grouped by
  *      (node, label) — one hash shuffle on the edge key, O(|E|) work;
  *   2. update: each node takes its plurality neighbor label — most votes
  *      wins, ties to the SMALLEST label (deterministic, no random sweep
  *      order: classic asynchronous LPA is order-dependent; the
  *      synchronous form with a fixed tie rule is reproducible across
  *      partitionings and engines), computed as two hash aggregations
  *      (max count per node, then min label at that count) so every
  *      round stays inside whole-stage codegen.
  *
  * Every node casts a SELF-VOTE (a self-loop added to the adjacency): it
  * damps the 2-cycle oscillation synchronous LPA is known for, and keeps
  * isolated nodes labeled (they vote only for themselves).
  *
  * Fixed `iters` rounds, not convergence detection: labels after round r
  * reach communities of diameter ~r, and a fixed budget keeps the result
  * a pure function of the input (oracle-friendly, no data-dependent plan).
  *
  * Scale: state is one (id, label) row per node; rounds localCheckpoint
  * with eager release of superseded blocks (the [[PageRank]] discipline).
  */
object LabelPropagation {

  /** Labels after `iters` synchronous rounds: (id, label), one row per
    * node of `nodes` (id); label = the node's community representative
    * (initially itself). `edges` (src, dst) is symmetrized internally —
    * pass each undirected edge once. */
  def run(nodes: DataFrame, edges: DataFrame, iters: Int): DataFrame = {
    require(iters >= 0, s"need iters >= 0, got $iters")
    val sc = nodes.sparkSession.sparkContext
    val ids = nodes.select(col("id")).localCheckpoint()
    val adj = edges.select(col("src"), col("dst"))
      .unionByName(edges.select(col("dst").as("src"), col("src").as("dst")))
      .unionByName(ids.select(col("id").as("src"), col("id").as("dst")))
      .distinct().localCheckpoint()
    var labels = ids.withColumn("label", col("id"))
    var pinned = Set.empty[Int]
    for (_ <- 1 to iters) {
      val before = sc.getPersistentRDDs.keySet
      labels = labels.localCheckpoint()
      val fresh = sc.getPersistentRDDs.keySet.diff(before).toSet
      val live = sc.getPersistentRDDs
      pinned.foreach(id => live.get(id).foreach(_.unpersist(blocking = false)))
      pinned = fresh
      val votes = adj
        .join(labels.select(col("id").as("dst"), col("label")), "dst")
        .groupBy(col("src").as("id"), col("label"))
        .agg(count(lit(1)).as("cnt"))
      // plurality-then-min-label as TWO hash aggregations + an id equi-join
      // (suite-pinned): the single-agg max_by(label, struct(cnt, -label))
      // form plans as a SortAggregate outside whole-stage codegen — an
      // extra per-partition sort every round
      val best = votes.groupBy("id").agg(max(col("cnt")).as("mc"))
      labels = votes.join(best, "id")
        .filter(col("cnt") === col("mc"))
        .groupBy("id").agg(min(col("label")).as("label"))
    }
    // the adjacency is keyed by edge endpoints, which may be a superset of
    // `nodes` — restrict to the documented contract (one row per node of
    // nodes) so stray endpoints never leak into the result
    if (iters == 0) labels
    else labels.join(ids, Seq("id"), "left_semi")
  }
}
