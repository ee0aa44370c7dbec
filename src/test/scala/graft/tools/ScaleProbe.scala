package graft.tools

import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.{QueryExecution, SparkPlan}
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.util.QueryExecutionListener

/** Empirical scale-growth probe: run the REAL gated dedup queries at
  * sf0.001 / sf0.01 / sf0.1 and measure how their pairing work grows with
  * corpus size — the evidence behind the "banding bounds candidates"
  * design claims, which until this probe were code-read-sound but
  * unmeasured.
  *
  * Metrics per (query, sf):
  *   - n: rows of the table the family reads (documents or embeddings)
  *   - outRows: final result rows
  *   - joinRowsMax: the LARGEST join-node output in the executed plan.
  *     For the banded families the largest join is the candidate
  *     verification join (candidates x shared-feature rows), so
  *     near-linear growth here is a STRONGER statement than bounding the
  *     candidate pair count alone; for the brute-force witness it is the
  *     all-pairs join itself.
  *   - shuffleRead/WriteB: stage-level shuffle bytes for every job the
  *     query runs (listener-tallied, so localCheckpoint side jobs count).
  *
  * The growth exponent is the least-squares slope of ln(metric) vs
  * ln(n). Banded families must stay near-linear; the all-pairs witness
  * establishes what quadratic growth looks like on the same corpus
  * (slope ~2), proving the probe can tell the difference.
  *
  * Run: sbt 'Test/runMain graft.tools.ScaleProbe'
  * Writes SCALE_GROWTH.json at the repo root (referenced by BASELINE.md);
  * ScaleGrowthSuite asserts the sf0.001->0.01 slopes stay separated.
  */
object ScaleProbe {

  /** Banded / indexed dedup families whose 100 TB story is "candidates
    * are bounded by bucket collisions, not n^2". */
  val BandedFamilies: Seq[String] = Seq(
    "q_dedup_minhash_xxh", "q_dedup_minhash_sketch_xxh", "q_dedup_simhash64",
    "q_dedup_winnow_xxh", "q_dedup_embed_lsh", "q_dedup_incremental",
    // exact-substring family: the window equi-join's output is exactly
    // the repeated-window occurrence list (linear in corpus tokens),
    // never a doc x doc product; the incremental form adds the
    // seen-keys join against the persisted index (N:1, no fan-out)
    "q_dedup_substr_xxh", "q_dedup_substr_inc")

  /** Quadratic / exact witnesses: q_dedup_embed is the all-pairs
    * brute-force cosine join BY DESIGN; q_dedup_near is the exact
    * shared-shingle join (superlinear only through shared-feature
    * frequency, the thing HotCap bounds in the banded twins). */
  val WitnessFamilies: Seq[String] = Seq("q_dedup_embed", "q_dedup_near")

  /** Similarity / ANN families (round-7 ADVICE: give the ANN scale claims
    * the same fitted-exponent treatment as dedup). Their pairing stages
    * live in DIFFERENT places than the dedup family's:
    *   - q_sim_topk_queryset: the probes ⋈ assign cell equi-join — work is
    *     |Q|·n·(nprobe/ncells), a CONSTANT-FACTOR prune of the brute |Q|·n
    *     kernel (both sides scale with the corpus, so the exponent is ~2
    *     by design; the claim under test is the ratio, suite-pinned).
    *   - q_knn_graph / q_knn_graph_search: every descent/beam round is a
    *     bounded-degree equi-join executed INSIDE a localCheckpoint job,
    *     so the per-execution listener (not the final plan, whose lineage
    *     the checkpoint truncated) is what sees them — O(n·k²) build work
    *     per round, O(|Q|·beam·k) per search round. */
  val SimilarityFamilies: Seq[String] =
    Seq("q_sim_topk_queryset", "q_knn_graph", "q_knn_graph_search",
      // the incremental insert: beam-search link rounds (fixed batch size
      // relative to n) + one refinement round over the merged graph —
      // growth must track the build round's O(n·k²), not n²
      "q_knn_graph_append",
      // SemDeDup: within-cluster pairs = n²/k with the gate's FIXED k=8
      // (oracle parity), so the exponent is honestly ~2 — the measured
      // claim is the 1/k division vs brute (ScaleGrowthSuite pins
      // < 0.5×brute at every size); production grows k with n
      "q_dedup_semantic")

  /** Graph-analytics families over the near-dup graph: every iterated
    * round is O(|E|) equi-joins (contributions / votes), and |E| — the
    * near-dup pair graph — grows like the exact shingle join that builds
    * it (q_dedup_near, measured ~n^1.0). Rounds run inside
    * localCheckpoint jobs, so like the KnnGraph twins only the
    * all-executions tally sees them. */
  /** Round-11 pipeline operators: fuzzy decontamination's containment
    * join emits only cross-split shared-shingle pairs (the q_dedup_near
    * growth law, ~n^1 on this corpus); the shard writer's heaviest join
    * is the n-row offsets broadcast (exactly linear); the bigram LM's
    * scoring joins emit one row per corpus token; the quality probe is
    * two hash aggs + n-row feature joins + the one-pass Gram fit. */
  val PipelineFamilies: Seq[String] = Seq("q_decontaminate_fuzzy",
    "q_shard_write", "q_text_perplexity_bigram", "q_quality_probe",
    // round-12: the wide probe's fit joins (grouped build + sparse Gram
    // or CG passes) and the probe-gated curation composition (one extra
    // doc_id equi-join over q_curate's plan)
    "q_quality_probe_wide", "q_curate_probe")

  val GraphFamilies: Seq[String] = Seq("q_graph_pagerank", "q_graph_communities",
    // the persisted incremental indexes: a fresh probe JVM measures the
    // real cold build + append (Memo is per-JVM), so the tallied work is
    // the whole index lifecycle, not just the snapshot read
    "q_graph_communities_inc", "q_graph_pagerank_incr")

  /** Round-14 crawl / training-layout operators (VERDICT r14 #5): the
    * frontier seen-filter's exact witness is one anti equi-join on the
    * canonical url (both sides ∝ extracted links); its Bloom twin
    * replaces the join with a broadcast bitset probe (map-only — the
    * heaviest remaining join is the memoized extraction frame's build);
    * politeness batching is a per-domain window over distinct canons;
    * packing's heaviest join is the orderBuckets-row offset broadcast
    * back onto the corpus. All structurally linear — these rows make
    * that measured, not asserted. */
  val CrawlFamilies: Seq[String] = Seq("q_frontier_new", "q_frontier_new_bloom",
    "q_frontier_batches", "q_frontier_batches_priority", "q_pack_chunks",
    // round-16: the resolved extraction is map-only HOF arithmetic (its
    // only join is the memoized frame's build); the resolved frontier
    // witness repeats q_frontier_new's anti equi-join shape; host-capped
    // dealing adds the broadcast of O(#batches) dense ids onto the
    // per-host/per-(domain,wave) windows
    "q_text_extract_links_resolved", "q_frontier_new_resolved",
    "q_frontier_batches_host")

  /** Which table drives each family's x-axis. */
  def tableFor(query: String): String =
    if (query.contains("embed") || query.startsWith("q_sim_") ||
        query.contains("knn") || query.startsWith("q_ann_")) "embeddings"
    else "documents"

  final case class Measure(query: String, sf: String, n: Long, outRows: Long,
      joinRowsMax: Long, joinRowsAllExec: Long, cmpRowsMax: Long,
      shuffleReadB: Long, shuffleWriteB: Long, sec: Double) {
    /** All-pairs comparison count a brute-force engine would pay on the
      * same corpus — the denominator of the pruning ratio. */
    def brutePairs: Long = n * (n - 1) / 2
    /** The metric that IS the family's pairing stage: the checkpointed
      * iterative families (KnnGraph build/search) run their joins inside
      * localCheckpoint jobs, so only the all-executions tally sees them;
      * every other family's pairing join is in the final plan — and for
      * those the all-exec tally would CONFLATE feature-computation joins
      * (e.g. the shared simhash tokenize pass, a broadcast join over
      * token rows) with pairing work, so the final plan is the honest
      * number. */
    def pairingJoinRows: Long =
      if (query.startsWith("q_knn_graph") || query.startsWith("q_graph_") ||
          // the probe gate memoizes its FEATURE pass to parquet, so the
          // final (scoring) plan is join-free — the fit/feature joins run
          // in earlier executions, which only the all-exec tally sees
          query == "q_quality_probe" || query == "q_quality_probe_wide")
        joinRowsAllExec
      else joinRowsMax
  }

  /** Per-execution join tallies: a query whose heavy joins run inside
    * localCheckpoint materialization jobs (the iterative KnnGraph rounds)
    * truncates its lineage, so the FINAL plan no longer contains them —
    * this listener sees every execution in the measurement window and
    * keeps the max. Fires async on the listener bus (same drain wait as
    * the shuffle tally). */
  private final class JoinTally extends QueryExecutionListener {
    val joinMax = new AtomicLong
    val cmpMax = new AtomicLong
    override def onSuccess(funcName: String, qe: QueryExecution, durationNs: Long): Unit = {
      val p = qe.executedPlan
      joinMax.getAndUpdate(m => math.max(m, maxJoinRows(p)))
      cmpMax.getAndUpdate(m => math.max(m, maxComparedRows(p)))
    }
    override def onFailure(funcName: String, qe: QueryExecution, exception: Exception): Unit = ()
  }

  private final class ShuffleTally extends SparkListener {
    val read = new AtomicLong
    val write = new AtomicLong
    override def onStageCompleted(e: SparkListenerStageCompleted): Unit = {
      val m = e.stageInfo.taskMetrics
      if (m != null) {
        read.addAndGet(m.shuffleReadMetrics.totalBytesRead)
        write.addAndGet(m.shuffleWriteMetrics.bytesWritten)
      }
    }
  }

  /** Every node of the FINAL executed plan, descending through AQE
    * wrappers, query stages, and subqueries. */
  def allNodes(p: SparkPlan): Seq[SparkPlan] = {
    val expanded = p match {
      case a: AdaptiveSparkPlanExec => allNodes(a.executedPlan)
      case q: QueryStageExec => allNodes(q.plan)
      case other => other +: other.children.flatMap(allNodes)
    }
    expanded ++ p.subqueries.flatMap(allNodes)
  }

  /** Largest join-node output row count in the executed plan. Join nodes
    * fold pushed filter conditions into their output count, so for the
    * banded families this is the heaviest pairing stage (candidate or
    * verification join rows), NOT the number of comparisons a theta join
    * performed — see [[maxComparedRows]] for that. */
  def maxJoinRows(p: SparkPlan): Long =
    allNodes(p).filter(n => n.nodeName.contains("Join") ||
        n.nodeName.contains("CartesianProduct"))
      .flatMap(_.metrics.get("numOutputRows").map(_.value))
      .maxOption.getOrElse(0L)

  private def nodeRows(p: SparkPlan): Option[Long] = p match {
    case q: QueryStageExec => nodeRows(q.plan)
    case _ => p.metrics.get("numOutputRows").map(_.value)
      .orElse(p.children.headOption.flatMap(nodeRows))
  }

  /** True pairwise-comparison count of the heaviest NON-equi join: for a
    * nested-loop or cartesian join every left row meets every right row,
    * so comparisons = product of the input cardinalities (the filter
    * condition only shrinks the OUTPUT metric). This is what makes the
    * brute-force witness's quadratic work visible even though its join
    * node reports post-filter rows. */
  def maxComparedRows(p: SparkPlan): Long =
    allNodes(p).filter(n => n.nodeName.contains("BroadcastNestedLoopJoin") ||
        n.nodeName.contains("CartesianProduct"))
      .map(_.children.flatMap(nodeRows).product)
      .maxOption.getOrElse(0L)

  def measure(spark: SparkSession, sfDir: String, query: String): Measure = {
    // standalone-equivalent memory state per run (same sweep Bench does):
    // a prior query's checkpoint blocks must not squeeze this one
    graft.queries.LlmOps.clearShared()
    spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = true))
    val n = graft.Tables(spark, sfDir, tableFor(query)).count()
    val tally = new ShuffleTally
    val joins = new JoinTally
    spark.sparkContext.addSparkListener(tally)
    spark.listenerManager.register(joins)
    try {
      val t0 = System.nanoTime()
      // listeners registered BEFORE construction: query bodies that
      // localCheckpoint run jobs during fn() itself
      val df = graft.SparkEntry.queries(query)(spark, sfDir)
      // execute the query's OWN plan (df.count() would plan a different
      // aggregate and leave these metrics blank)
      val outRows = df.queryExecution.toRdd.count()
      val sec = (System.nanoTime() - t0) / 1e9
      Thread.sleep(1000) // let the listener bus drain stage/execution events
      Measure(query, sfDir.split('/').last, n, outRows,
        maxJoinRows(df.queryExecution.executedPlan),
        math.max(maxJoinRows(df.queryExecution.executedPlan), joins.joinMax.get()),
        math.max(maxComparedRows(df.queryExecution.executedPlan), joins.cmpMax.get()),
        tally.read.get(), tally.write.get(), sec)
    } finally {
      spark.sparkContext.removeSparkListener(tally)
      spark.listenerManager.unregister(joins)
    }
  }

  /** Least-squares slope of ln(y) on ln(x) — the fitted growth exponent. */
  def slope(points: Seq[(Long, Long)]): Double = {
    val pts = points.filter(p => p._1 > 0 && p._2 > 0)
      .map(p => (math.log(p._1.toDouble), math.log(p._2.toDouble)))
    require(pts.size >= 2, s"need >= 2 positive points, got $pts")
    val mx = pts.map(_._1).sum / pts.size
    val my = pts.map(_._2).sum / pts.size
    pts.map(p => (p._1 - mx) * (p._2 - my)).sum /
      pts.map(p => (p._1 - mx) * (p._1 - mx)).sum
  }

  def main(args: Array[String]): Unit = {
    val sfs = Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config(graft.Tables.NanosKey, "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val families = BandedFamilies ++ WitnessFamilies ++ SimilarityFamilies ++
      GraphFamilies ++ PipelineFamilies ++ CrawlFamilies
    val measures = for (q <- families; sf <- sfs) yield {
      val m = measure(spark, sf, q)
      println(f"${m.query}%-28s ${m.sf}%-8s n=${m.n}%7d out=${m.outRows}%9d " +
        f"pairing=${m.pairingJoinRows}%10d allExec=${m.joinRowsAllExec}%10d " +
        f"cmpMax=${m.cmpRowsMax}%10d shufR=${m.shuffleReadB}%12d sec=${m.sec}%6.2f")
      m
    }

    val byQuery = measures.groupBy(_.query)
    // a JOIN-FREE family (q_frontier_batches: one per-domain window,
    // no join node in any execution) has zero pairing rows at EVERY
    // size — its pairing-growth exponent is recorded as 0.0 (the
    // strongest possible scale statement). That claim needs all-zero
    // evidence (ADVICE r15): a family with positive pairing rows at
    // only ONE measured size is UNMEASURABLE (NaN -> null in the
    // JSON), not join-free — 0.0 must never be the default of a
    // failed fit.
    def slopeOrZero(points: Seq[(Long, Long)]): Double =
      if (points.count(p => p._1 > 0 && p._2 > 0) >= 2) slope(points)
      else if (points.forall(_._2 == 0L)) 0.0
      else Double.NaN
    val exponents = families.map { q =>
      val ms = byQuery(q).sortBy(_.n)
      q -> Map(
        "joinRows" -> slopeOrZero(ms.map(m => (m.n, m.pairingJoinRows))),
        "shuffleRead" -> slope(ms.map(m => (m.n, m.shuffleReadB))),
        "outRows" -> slope(ms.map(m => (m.n, m.outRows))))
    }
    exponents.foreach { case (q, e) =>
      println(f"$q%-28s joinRows^${e("joinRows")}%5.2f shuffle^${e("shuffleRead")}%5.2f " +
        f"out^${e("outRows")}%5.2f")
    }

    val json = new StringBuilder("{\n  \"measures\": [\n")
    json ++= measures.map(m =>
      s"""    {"query":"${m.query}","sf":"${m.sf}","n":${m.n},"outRows":${m.outRows},""" +
      s""""joinRowsMax":${m.joinRowsMax},"joinRowsAllExec":${m.joinRowsAllExec},""" +
      s""""cmpRowsMax":${m.cmpRowsMax},""" +
      s""""brutePairs":${m.brutePairs},""" +
      s""""pruningPct":${f"${100.0 * m.pairingJoinRows / math.max(1L, m.brutePairs)}%.2f"},""" +
      s""""shuffleReadB":${m.shuffleReadB},""" +
      s""""shuffleWriteB":${m.shuffleWriteB},"sec":${f"${m.sec}%.3f"}}""").mkString(",\n")
    json ++= "\n  ],\n  \"growthExponents\": {\n"
    // NaN = "not fit" (see slopeOrZero) — JSON has no NaN literal, so it
    // lands as null and a consumer cannot mistake it for a measured 0.0
    def expJson(v: Double): String = if (v.isNaN) "null" else f"$v%.3f"
    json ++= exponents.map { case (q, e) =>
      s"""    "$q": {"joinRows":${expJson(e("joinRows"))},""" +
      s""""shuffleRead":${expJson(e("shuffleRead"))},"outRows":${expJson(e("outRows"))}}"""
    }.mkString(",\n")
    json ++= "\n  },\n  \"note\": \"exponents are least-squares slopes of ln(metric) vs " +
      "ln(corpus rows) across sf0.001/0.01/0.1 (documents corpora at sf0.001 and sf0.01 " +
      "are both 500 docs, embeddings 500/500/2000, so each fit has two distinct sizes). " +
      "joinRowsMax = heaviest join output in the FINAL plan (the pairing stage for " +
      "every non-checkpointing family); joinRowsAllExec = heaviest join across ALL " +
      "executions in the window (a QueryExecutionListener — the only way to see joins " +
      "inside localCheckpoint jobs, i.e. the iterative KnnGraph rounds, but it also " +
      "counts feature-computation joins like the shared simhash tokenize pass, so the " +
      "exponents use it only for the q_knn_graph twins); cmpRowsMax = true comparison " +
      "count of the heaviest non-equi join; pruningPct = pairing rows as a percent of " +
      "all n(n-1)/2 pairs. Banded dedup families' pairing " +
      "work must track the answer size (outRows + n), never the brute n^2 line; " +
      "q_dedup_embed is the all-pairs witness whose cmpRowsMax grows at exactly n^2. " +
      "Similarity family: q_sim_topk_queryset's cell join is a constant-factor " +
      "nprobe/ncells prune of the brute |Q|*n kernel (ratio suite-pinned, exponent ~2 " +
      "because BOTH sides scale); q_knn_graph's descent rounds are O(n*k^2)-bounded " +
      "equi-joins (near-linear exponent); q_knn_graph_search adds fixed-|Q| beam rounds " +
      "on top of one build round, so its growth is the build's; q_knn_graph_append " +
      "(insert a 20%-of-corpus batch into the 80% graph) pays the beam-link search " +
      "rounds plus one refinement round over the merged graph, so its heaviest join " +
      "must track the same O(n*k^2) bound as the build it avoids re-running. " +
      "Graph family (pagerank/communities over the near-dup graph, allExec tally like " +
      "the knn twins - rounds run inside localCheckpoint jobs): every round is O(|E|) " +
      "equi-joins, and |E| grows like the exact shingle join that builds it " +
      "(q_dedup_near ~n^1.0), so near-linear exponents, far under the n^2 line. " +
      "Exact-substring family (q_dedup_substr_xxh batch / q_dedup_substr_inc " +
      "index-backed): the window equi-join's output is the repeated-window " +
      "occurrence list — linear in corpus tokens, measured ~n^1.0, never doc x doc; " +
      "the incremental form's tally includes its cold index build (fresh probe JVM). " +
      "Round-11 pipeline family: q_decontaminate_fuzzy's containment join emits only " +
      "cross-split shared-shingle pairs (~n^0.8 measured); q_shard_write's heaviest " +
      "join is the n-row rank/offsets pairing (n^1.0 exactly); " +
      "q_text_perplexity_bigram's scoring joins emit one row per corpus token " +
      "(n^0.99); q_quality_probe (allExec tally - the gate memoizes features to " +
      "parquet so the final scoring plan is join-free) grows n^1.0 through its " +
      "feature/fit joins. Round-14 crawl/pack family: q_frontier_new is one anti " +
      "equi-join on the canonical url (both sides = extracted links, ~n^1); " +
      "q_frontier_new_bloom replaces it with a broadcast bitset probe (its " +
      "heaviest join is the memoized extraction build); q_frontier_batches(_" +
      "priority) is a per-domain window over distinct canons plus (priority " +
      "form) one map-combining parent aggregate; q_pack_chunks' heaviest join " +
      "is the orderBuckets-row offset table broadcast onto the corpus - all " +
      "must grow ~n^1.\"\n}\n"
    java.nio.file.Files.write(java.nio.file.Paths.get("SCALE_GROWTH.json"),
      json.toString.getBytes("UTF-8"))
    println("wrote SCALE_GROWTH.json")
    spark.stop()
  }
}
