package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Connected components by alternating large-star / small-star edge
  * rewriting (Kiveris et al., "Connected Components in MapReduce and
  * Beyond", SoCC 2014) — the O(log n)-round form of min-label propagation.
  *
  * Plain propagation moves the minimum label ONE hop per pass, so a chain
  * component of diameter d needs d passes — at 100 TB a pathological
  * near-dup chain (doc A ~ B ~ C ~ ...) turns the driver loop into the
  * bottleneck. Star rewriting instead contracts the graph itself: each
  * round every node links its neighborhood directly to the neighborhood
  * minimum, roughly halving component "height" per round, so convergence
  * is O(log n) rounds regardless of diameter (ConnectedComponentsSuite
  * pins a 64-node chain to <= 6 rounds, where propagation needs 63).
  *
  * Each round is two hash-partitioned groupBy/join passes over the edge
  * set — no driver-side state beyond the converged flag, edges
  * localCheckpointed per round to cut the growing lineage (same discipline
  * as the boosting loop). Emitted edges always point larger -> smaller id,
  * so the edge set is naturally canonical and convergence is an exact
  * frame-equality check.
  */
object ConnectedComponents {

  /** Large-star: every node connects its strictly-LARGER neighbors to the
    * minimum of its closed neighborhood min(Γ(u) ∪ {u}). Runs on the
    * symmetrized adjacency so both endpoints rewrite in one pass.
    * Emissions are NOT deduplicated here: duplicate edges cannot change a
    * min, and the following smallStar ends in a distinct anyway — one
    * less shuffle per round. */
  private def largeStar(e: DataFrame): DataFrame = {
    val sym = e.unionByName(e.select(col("v").as("u"), col("u").as("v")))
    val m = sym.groupBy("u").agg(min("v").as("mn"))
      .select(col("u"), least(col("u"), col("mn")).as("m"))
    sym.join(m, "u")
      .filter(col("v") > col("u"))
      .select(col("v").as("u"), col("m").as("v"))
      .filter(col("u") =!= col("v"))
  }

  /** Small-star: edges oriented larger -> smaller; every node connects its
    * smaller neighbors AND itself to its minimum neighbor. */
  private def smallStar(e: DataFrame): DataFrame = {
    val dir = e.select(greatest(col("u"), col("v")).as("u"),
      least(col("u"), col("v")).as("v"))
    val withM = dir.join(dir.groupBy("u").agg(min("v").as("m")), "u")
    withM.select(col("v").as("u"), col("m").as("v"))
      .unionByName(withM.select(col("u"), col("m").as("v")))
      .filter(col("u") =!= col("v"))
      .distinct()
  }

  /** True iff the canonical (u > v, distinct) edge set is a forest of
    * stars: every source points at exactly one target and no node is both
    * source and target. Both star operations preserve connectivity
    * (Kiveris et al., Lemma 1-2), so the star state is the answer the
    * moment it appears — testing for it directly replaces a whole
    * confirmation star round (~8 shuffles) with two limit-1 probe jobs. */
  private def isStarForest(e: DataFrame): Boolean = {
    val singleTarget = e.groupBy("u").agg(count(lit(1)).as("c"))
      .filter(col("c") > 1).isEmpty
    singleTarget && e.select("v").distinct()
      .join(e.select(col("u").as("v")).distinct(), Seq("v"), "left_semi")
      .isEmpty
  }

  /** Components of an undirected edge frame with columns (u, v).
    * Returns (labels, rounds): labels has one row per node that appears in
    * an edge, columns (u, label) with label = the component's minimum id;
    * rounds is the number of large+small star rounds executed.
    * Isolated nodes never appear in `edges` and so not in the result —
    * callers left-join and coalesce to the node's own id.
    *
    * Small-graph fast path (the broadcast-join principle): when the
    * canonical edge set fits under `spark.graft.cc.localLimit` rows
    * (default 500k — 8 MB of id pairs), components come from a
    * driver-side union-find (path-halving, min-label) in one collect
    * instead of star rounds, each of which costs several driver
    * round-trips; rounds reports 0, labels are IDENTICAL (the component
    * minimum is algorithm-independent — suite-pinned against the star
    * machinery). Above the limit the distributed rewriting runs — at
    * 100 TB the near-dup pair graph is real. */
  def run(edges: DataFrame): (DataFrame, Int) = {
    val localLimit = math.min(edges.sparkSession.conf
      .get("spark.graft.cc.localLimit", "500000").toLong, 8000000L).toInt
    // checkpoint FIRST, probe the checkpoint: the upstream pipeline (a
    // pair join, typically the caller's most expensive stage) executes
    // exactly once whichever path runs; count/collect then read blocks.
    // On the fast path the blocks are unpersisted before returning (the
    // result is driver-built), so small-graph calls pin nothing.
    var e = edges
      .filter(col("u") =!= col("v"))
      .select(greatest(col("u"), col("v")).as("u"),
        least(col("u"), col("v")).as("v"))
      .distinct()
      .localCheckpoint()
    val longIds = e.schema.fields.forall(
      _.dataType == org.apache.spark.sql.types.LongType)
    if (longIds && localLimit > 0 && e.count() <= localLimit) {
      val rows = e.collect()
      e.unpersist(blocking = false)
      return (localUnionFind(edges.sparkSession, rows), 0)
    }
    var rounds = 0
    var converged = e.isEmpty || isStarForest(e)
    while (!converged) {
      e = smallStar(largeStar(e)).localCheckpoint()
      rounds += 1
      converged = isStarForest(e)
    }
    // fixpoint is a forest of stars: every non-root points straight at its
    // component minimum; roots appear only on the v side
    val leafLabels = e.groupBy("u").agg(min("v").as("label"))
    val rootLabels = e.select(col("v").as("u")).distinct()
      .join(leafLabels, Seq("u"), "left_anti")
      .select(col("u"), col("u").as("label"))
    (leafLabels.unionByName(rootLabels), rounds)
  }

  /** Driver-side components over a collected canonical edge array:
    * union-find with path halving, then label = component MINIMUM —
    * algorithm-independent, so the output is row-identical to the star
    * machinery's (suite-pinned). One row per node appearing in an edge,
    * same contract as [[run]]. */
  private def localUnionFind(spark: org.apache.spark.sql.SparkSession,
      rows: Array[org.apache.spark.sql.Row]): DataFrame = {
    val parent = scala.collection.mutable.HashMap.empty[Long, Long]
    def find(x0: Long): Long = {
      var x = x0
      while (parent.getOrElse(x, x) != x) {
        val p = parent(x)
        parent(x) = parent.getOrElse(p, p) // path halving
        x = parent(x)
      }
      x
    }
    rows.foreach { r =>
      val (a, b) = (r.getLong(0), r.getLong(1))
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(if (ra < rb) rb else ra) = math.min(ra, rb)
      parent.getOrElseUpdate(a, find(a)); parent.getOrElseUpdate(b, find(b))
    }
    val nodes = rows.iterator.flatMap(r => Iterator(r.getLong(0), r.getLong(1)))
      .toArray.distinct
    val minOf = scala.collection.mutable.HashMap.empty[Long, Long]
    nodes.foreach { n =>
      val root = find(n)
      minOf(root) = math.min(minOf.getOrElse(root, n), n)
    }
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("u",
        org.apache.spark.sql.types.LongType, nullable = true),
      org.apache.spark.sql.types.StructField("label",
        org.apache.spark.sql.types.LongType, nullable = true)))
    spark.createDataFrame(
      spark.sparkContext.parallelize(
        nodes.toIndexedSeq.map(n =>
          org.apache.spark.sql.Row(n, minOf(find(n)))),
        math.max(1, math.min(8, nodes.length / 65536 + 1))),
      schema)
  }
}
