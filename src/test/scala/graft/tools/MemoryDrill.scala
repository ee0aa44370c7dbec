package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Constrained-memory spill drill: run the heaviest gated queries at
  * sf0.1 and emit an order-independent content hash per query, so a run
  * under a deliberately small heap (SPARK_DRIVER_MEM=1g — Spark local
  * mode's executor memory IS the driver JVM heap) can be diffed against
  * the default-heap run. Completion under 1g proves the spill paths
  * (hash-agg fallback, external sort, TopKPerKey sorter degrade) engage
  * instead of OOMing; identical hashes prove spilling never changes
  * results.
  *
  * Drive (recorded in BASELINE.md):
  *   sbt 'Test/runMain graft.tools.MemoryDrill /tmp/drill_8g.json'
  *   SPARK_DRIVER_MEM=1g sbt 'Test/runMain graft.tools.MemoryDrill /tmp/drill_1g.json'
  *   diff /tmp/drill_8g.json /tmp/drill_1g.json   # hashes must be identical
  *
  * The hash is sum(xxhash64(to_json(struct(cols in name order)))) + count:
  * row-order independent (the driver's own t2 gate sorts before hashing
  * for the same reason) and computed distributed, so the drill itself adds
  * no driver-side memory load beyond one row per query.
  */
object MemoryDrill {
  /** Heaviest queries by BENCH_r05/r06 wall-clock, plus q_topk_per_key
    * (the custom operator with its own spill fallback) and q_dedup_cluster
    * (iterative checkpointing under pressure). */
  val Heaviest: Seq[String] = Seq(
    "q_dedup_minhash_sketch", "q_dedup_incremental", "q_dedup_winnow",
    "q_dedup_embed", "q_dedup_minhash", "q_curate", "q_ml_stump_best",
    "q_dedup_minhash_sketch_xxh", "q_dedup_simhash64", "q_ann_ivf_trained",
    "q_topk_per_key", "q_dedup_cluster")

  def contentHash(df: org.apache.spark.sql.DataFrame): (String, Long) = {
    val cols = df.columns.sorted.map(col)
    // DECIMAL(38,0) sum: order-independent and overflow-free under ANSI
    // (50k rows x |long| ~ 4.6e23 << 1e38)
    val r = df.select(to_json(struct(cols: _*)).as("j"))
      .agg(sum(xxhash64(col("j")).cast("decimal(38,0)")).as("h"), count(lit(1)).as("n"))
      .collect()(0)
    (if (r.isNullAt(0)) "0" else r.getDecimal(0).toBigInteger.toString, r.getLong(1))
  }

  def main(args: Array[String]): Unit = {
    val out = args.headOption.getOrElse("/tmp/memory_drill.json")
    val sfDir = args.lift(1).getOrElse("/root/testdata/sf0.1")
    // SPARK_GRAFT_MEM_FRACTION squeezes the unified pool far below what
    // any heap size can (Spark refuses heaps under ~450MB, and sf0.1's
    // working set fits even there): fraction=0.05 of a 512m heap leaves
    // ~10MB of execution+storage total, forcing every sort/agg to spill
    val memFraction = sys.env.getOrElse("SPARK_GRAFT_MEM_FRACTION", "0.6")
    val parts = sys.env.getOrElse("SPARK_GRAFT_SHUFFLE_PARTS", "32")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", parts)
      .config("spark.memory.fraction", memFraction)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config(graft.Tables.NanosKey, "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val heapMb = Runtime.getRuntime.maxMemory() / (1024 * 1024)
    println(s"[drill] heap ${heapMb}MB, sf $sfDir")

    // spill tally: stage-level memory/disk bytes spilled, the machine
    // evidence that a small heap actually exercised the spill paths
    val spilledMem = new java.util.concurrent.atomic.AtomicLong
    val spilledDisk = new java.util.concurrent.atomic.AtomicLong
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onStageCompleted(
          e: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
        val tm = e.stageInfo.taskMetrics
        if (tm != null) {
          spilledMem.addAndGet(tm.memoryBytesSpilled)
          spilledDisk.addAndGet(tm.diskBytesSpilled)
        }
      }
    })
    val rows = Heaviest.map { q =>
      // per-query sweep, as in Bench: the drill measures each query's own
      // memory behavior, not a checkpoint backlog's
      graft.queries.LlmOps.clearShared()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = true))
      val t0 = System.nanoTime()
      val (h, n) = contentHash(graft.SparkEntry.queries(q)(spark, sfDir))
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"[drill] $q%-28s rows=$n%8d hash=$h%24s ${sec}%6.2f s")
      s"""  "$q": {"rows":$n,"hash":"$h"}"""
    }
    Thread.sleep(500)
    println(s"[drill] total spilled: mem=${spilledMem.get} disk=${spilledDisk.get} bytes")
    // heap size deliberately NOT in the file: the two runs' outputs must
    // be byte-identical when results agree, so plain diff is the check
    java.nio.file.Files.write(java.nio.file.Paths.get(out),
      ("{\n" + rows.mkString(",\n") + "\n}\n").getBytes("UTF-8"))
    println(s"[drill] wrote $out (heap ${heapMb}MB)")
    spark.stop()
  }
}
