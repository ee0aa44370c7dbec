package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config(Tables.NanosKey, "true") // events.ts is TIMESTAMP(NANOS)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Prime the JVM/codegen/parquet-footer paths so the first timed query
    // doesn't absorb ~6s of one-off warmup (measured at sf0.1).
    SparkEntry.entry(spark).count()
    // A failed query must NOT be reported as a (fast) normal timing: record
    // it as -1 so regressions are visible, keep it out of the total, and
    // list it under "failed".
    // Best-of-2 per query: the second run sees warm code caches / parquet
    // footers, so min() strips one-off JIT+IO noise and run-to-run variance
    // stays sub-second (BASELINE.md variance note) — sub-second deltas then
    // mean plans, not weather.
    val results = SparkEntry.queries.map { case (name, fn) =>
      // each run fails independently: one transient failure must not
      // discard the other run's valid timing (a query that worked once is
      // not "failed" — losing its time is the false regression signal this
      // code exists to avoid)
      def once(): Option[Double] =
        try {
          val t0 = System.nanoTime()
          fn(spark, sfDir).count()
          Some((System.nanoTime() - t0) / 1e9)
        } catch { case e: Throwable =>
          System.err.println(s"[bench] $name failed: ${e.getMessage}"); None
        }
      val times = Seq(once(), once()).flatten
      name -> (if (times.isEmpty) -1.0 else times.min)
    }
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val failed = results.filter(_._2 < 0).keys.toSeq.sorted
      .map("\"" + _ + "\"").mkString("[", ",", "]")
    val total = results.values.filter(_ >= 0).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"failed":$failed,"sf":"$sfDir"}""")
    spark.stop()
  }
}
