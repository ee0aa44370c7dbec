package graft.tools

import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.QueryExecution
import org.apache.spark.sql.functions._
import org.apache.spark.sql.util.QueryExecutionListener

/** Measures what the SubstrIndex bloom seen-filter buys per daily batch:
  * wall time (median of 3) AND rows scanned from the stored `win/` key
  * set, bloom-forced vs exact, on (a) the real last-20% slice (mostly
  * novel + the planted repeats) and (b) a fully-novel batch (every token
  * prefixed — zero candidate keys, so the bloom path provably never
  * reads `win/`). Output equality is asserted on every pair. Numbers
  * land in BASELINE.md; the auto-gate (BloomMinIndexBytes) exists
  * because the fixed costs visible here only pay off past a real
  * index-side read.
  *
  * Run: sbt 'Test/runMain graft.tools.SubstrBloomProbe [sfDir]'
  */
object SubstrBloomProbe {
  private def median(xs: Seq[Double]): Double = { val s = xs.sorted; s(s.length / 2) }

  private final class WinScanTally extends QueryExecutionListener {
    val rows = new AtomicLong
    override def onSuccess(f: String, qe: QueryExecution, d: Long): Unit =
      ScaleProbe.allNodes(qe.executedPlan)
        .filter(n => n.nodeName.contains("Scan") && n.toString.contains("/win"))
        .foreach(n => n.metrics.get("numOutputRows").foreach(m => rows.addAndGet(m.value)))
    override def onFailure(f: String, qe: QueryExecution, e: Exception): Unit = ()
  }

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config(graft.Tables.NanosKey, "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val docs = graft.Tables(spark, sfDir, "documents").select("doc_id", "text")
    val cut = docs.agg((max(col("doc_id")) * 8 / 10).cast("long")).head().getLong(0)
    val seed = docs.filter(col("doc_id") < cut)
    val real = docs.filter(col("doc_id") >= cut)
    val novel = real.select(
      (col("doc_id") + 10000000L).as("doc_id"),
      expr("array_join(transform(split(text, ' '), t -> concat('zq', t)), ' ')").as("text"))

    val base = java.nio.file.Files.createTempDirectory("substr-bloom-probe").toString
    graft.operators.SubstrIndex.build(seed, s"$base/idx", w = 12)
    val indexKeys = spark.read.parquet(s"$base/idx/win").count()

    def run(useBloom: Boolean, batch: org.apache.spark.sql.DataFrame): (Double, Long, Seq[Seq[Any]]) = {
      var rows: Seq[Seq[Any]] = Nil
      val tally = new WinScanTally
      spark.listenerManager.register(tally)
      try {
        val t = median((1 to 3).map { _ =>
          val t0 = System.nanoTime()
          rows = graft.operators.SubstrIndex
            .dedupAgainst(s"$base/idx", batch, useBloom = Some(useBloom))
            .orderBy("doc_id", "span_start").collect().map(_.toSeq.toVector).toVector
          graft.operators.SubstrIndex.sweep(spark)
          (System.nanoTime() - t0) / 1e9
        })
        Thread.sleep(1000) // drain the async listener bus
        (t, tally.rows.get() / 3, rows) // per-run average over the 3 runs
      } finally spark.listenerManager.unregister(tally)
    }

    println(s"[substr-bloom] stored index keys: $indexKeys")
    for ((label, batch) <- Seq(("real_tail_20pct", real), ("fully_novel", novel))) {
      val (tB, scanB, rB) = run(useBloom = true, batch)
      val (tX, scanX, rX) = run(useBloom = false, batch)
      require(rB == rX, s"$label: bloom path diverged from exact path")
      println(f"[substr-bloom] $label%-16s bloom: ${tB}%6.3f s, win-scan $scanB%8d rows | " +
        f"exact: ${tX}%6.3f s, win-scan $scanX%8d rows | spans=${rB.size}")
    }
    spark.stop()
  }
}
