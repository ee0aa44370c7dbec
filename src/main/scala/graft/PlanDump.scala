package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

/** Optimization-round instrumentation (guide §1): for each matching
  * declared query, dump `.explain("formatted")` to a file (the judge's
  * plan evidence — plans/r{N}/<query>_{before,after}.txt) and time the
  * query with the SAME action the bench uses (count) plus a stage-level
  * breakdown from a SparkListener (jobs, stages, task time, shuffle
  * bytes) so the expensive stage — not the expensive query — is what
  * gets optimized. Never run while a bench window is live.
  *
  * args: <outDir> <nameRegex> <suffix>   e.g. plans/r17 'q_knn_graph$' before
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val (outDir, re, suffix) = (args(0), args(1).r, args(2))
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config(Tables.NanosKey, "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()

    // stage metrics accumulator — names are (jobId, description)
    val stages = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    val jobs = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    val jobStart = new java.util.concurrent.ConcurrentHashMap[Int, Long]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(e: SparkListenerJobStart): Unit =
        jobStart.put(e.jobId, e.time)
      override def onJobEnd(e: SparkListenerJobEnd): Unit = {
        val t0 = Option(jobStart.get(e.jobId)).getOrElse(e.time)
        jobs.add(f"job ${e.jobId}%4d  wall=${(e.time - t0) / 1e3}%7.3fs")
      }
      override def onStageCompleted(e: SparkListenerStageCompleted): Unit = {
        val si = e.stageInfo
        val m = si.taskMetrics
        val wall = (for {a <- si.completionTime; b <- si.submissionTime}
          yield (a - b) / 1e3).getOrElse(-1.0)
        stages.add(f"stage ${si.stageId}%4d tasks=${si.numTasks}%4d " +
          f"wall=$wall%7.3fs taskTime=${m.executorRunTime / 1e3}%8.3fs " +
          f"shufR=${m.shuffleReadMetrics.totalBytesRead / 1e6}%9.2fMB " +
          f"shufW=${m.shuffleWriteMetrics.bytesWritten / 1e6}%9.2fMB " +
          f"in=${m.inputMetrics.bytesRead / 1e6}%8.2fMB  ${si.name.takeWhile(_ != '\n')}")
      }
    })

    // same warmup as Bench so codegen/parquet-footer one-offs don't
    // pollute the first profiled query
    SparkEntry.entry(spark).count()

    SparkEntry.queries.toSeq.filter(kv => re.findFirstIn(kv._1).isDefined)
      .foreach { case (name, fn) =>
        try {
          val df = fn(spark, sfDir)
          val plan = df.queryExecution.explainString(
            org.apache.spark.sql.execution.FormattedMode)
          java.nio.file.Files.writeString(
            java.nio.file.Paths.get(s"$outDir/${name}_$suffix.txt"), plan)
          // timed exactly as Bench times it: three counts, report each
          stages.clear(); jobs.clear()
          val times = (1 to 3).map { _ =>
            val t0 = System.nanoTime()
            fn(spark, sfDir).count()
            (System.nanoTime() - t0) / 1e9
          }
          println(s"== $name  times=${times.map(t => f"$t%.3f").mkString(", ")}")
          jobs.forEach(j => println(s"   $j"))
          stages.forEach(st => println(s"   $st"))
          graft.queries.LlmOps.clearShared()
          spark.sparkContext.getPersistentRDDs.values
            .foreach(_.unpersist(blocking = false))
        } catch { case e: Throwable =>
          System.err.println(s"[plandump] $name failed: ${e.getMessage}")
        }
      }
    spark.stop()
  }
}
