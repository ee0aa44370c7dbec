package graft.tools

import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}

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
    "q_dedup_winnow_xxh", "q_dedup_embed_lsh", "q_dedup_incremental")

  /** Quadratic / exact witnesses: q_dedup_embed is the all-pairs
    * brute-force cosine join BY DESIGN; q_dedup_near is the exact
    * shared-shingle join (superlinear only through shared-feature
    * frequency, the thing HotCap bounds in the banded twins). */
  val WitnessFamilies: Seq[String] = Seq("q_dedup_embed", "q_dedup_near")

  /** Which table drives each family's x-axis. */
  def tableFor(query: String): String =
    if (query.contains("embed")) "embeddings" else "documents"

  final case class Measure(query: String, sf: String, n: Long, outRows: Long,
      joinRowsMax: Long, cmpRowsMax: Long, shuffleReadB: Long, shuffleWriteB: Long,
      sec: Double) {
    /** All-pairs comparison count a brute-force engine would pay on the
      * same corpus — the denominator of the pruning ratio. */
    def brutePairs: Long = n * (n - 1) / 2
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
    spark.sparkContext.addSparkListener(tally)
    try {
      val t0 = System.nanoTime()
      // listener registered BEFORE construction: query bodies that
      // localCheckpoint run jobs during fn() itself
      val df = graft.SparkEntry.queries(query)(spark, sfDir)
      // execute the query's OWN plan (df.count() would plan a different
      // aggregate and leave these metrics blank)
      val outRows = df.queryExecution.toRdd.count()
      val sec = (System.nanoTime() - t0) / 1e9
      Thread.sleep(500) // let the listener bus drain stage-completed events
      Measure(query, sfDir.split('/').last, n, outRows,
        maxJoinRows(df.queryExecution.executedPlan),
        maxComparedRows(df.queryExecution.executedPlan),
        tally.read.get(), tally.write.get(), sec)
    } finally spark.sparkContext.removeSparkListener(tally)
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

    val families = BandedFamilies ++ WitnessFamilies
    val measures = for (q <- families; sf <- sfs) yield {
      val m = measure(spark, sf, q)
      println(f"${m.query}%-28s ${m.sf}%-8s n=${m.n}%7d out=${m.outRows}%9d " +
        f"joinMax=${m.joinRowsMax}%10d cmpMax=${m.cmpRowsMax}%10d " +
        f"shufR=${m.shuffleReadB}%12d sec=${m.sec}%6.2f")
      m
    }

    val byQuery = measures.groupBy(_.query)
    val exponents = families.map { q =>
      val ms = byQuery(q).sortBy(_.n)
      q -> Map(
        "joinRows" -> slope(ms.map(m => (m.n, m.joinRowsMax))),
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
      s""""joinRowsMax":${m.joinRowsMax},"cmpRowsMax":${m.cmpRowsMax},""" +
      s""""brutePairs":${m.brutePairs},""" +
      s""""pruningPct":${f"${100.0 * m.joinRowsMax / math.max(1L, m.brutePairs)}%.2f"},""" +
      s""""shuffleReadB":${m.shuffleReadB},""" +
      s""""shuffleWriteB":${m.shuffleWriteB},"sec":${f"${m.sec}%.3f"}}""").mkString(",\n")
    json ++= "\n  ],\n  \"growthExponents\": {\n"
    json ++= exponents.map { case (q, e) =>
      s"""    "$q": {"joinRows":${f"${e("joinRows")}%.3f"},""" +
      s""""shuffleRead":${f"${e("shuffleRead")}%.3f"},"outRows":${f"${e("outRows")}%.3f"}}"""
    }.mkString(",\n")
    json ++= "\n  },\n  \"note\": \"exponents are least-squares slopes of ln(metric) vs " +
      "ln(corpus rows) across sf0.001/0.01/0.1 (documents corpora at sf0.001 and sf0.01 " +
      "are both 500 docs, so the fit has two distinct sizes). joinRowsMax = heaviest " +
      "pairing-stage rows; cmpRowsMax = true comparison count of the heaviest non-equi " +
      "join (brute witness only); pruningPct = joinRowsMax as a percent of all n(n-1)/2 " +
      "pairs. Banded families' pairing work must track the answer size (outRows + n), " +
      "never the brute n^2 line; q_dedup_embed is the all-pairs witness whose cmpRowsMax " +
      "grows at exactly n^2.\"\n}\n"
    java.nio.file.Files.write(java.nio.file.Paths.get("SCALE_GROWTH.json"),
      json.toString.getBytes("UTF-8"))
    println("wrote SCALE_GROWTH.json")
    spark.stop()
  }
}
