package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** sfDir -> named DataFrames. Schemas come from parquet footers (no inference).
  * Scans stay vectorized + column-pruned; never cache here — each query owns
  * its plan so Catalyst can push filters/projections into the scan.
  */
object Tables {
  val names: Seq[String] = Seq("region", "nation", "customer", "supplier",
    "part", "orders", "lineitem", "events", "documents", "embeddings")

  /** events.ts is parquet TIMESTAMP(NANOS), which Spark 4.x rejects unless
    * this legacy conf maps it to raw int64 nanos. Our own sessions (Bench,
    * Verify, SparkSpec) set it at construction; this guard only covers
    * driver-owned sessions handed to SparkEntry, where the conf is a hard
    * prerequisite for reading `events` at all (idempotent, checked first to
    * avoid gratuitous conf writes on every scan).
    */
  def ensureNanosConf(spark: SparkSession): Unit =
    if (spark.conf.get(NanosKey, "false") != "true")
      spark.conf.set(NanosKey, "true")

  val NanosKey = "spark.sql.legacy.parquet.nanosAsLong"

  def apply(spark: SparkSession, dir: String, name: String): DataFrame =
    if (name == "events") {
      ensureNanosConf(spark)
      // `ts DIV 1000` truncates ns → µs toward zero — identical to DuckDB's
      // CAST(ts AS TIMESTAMP) on the same file, so both engines see the same
      // microsecond timestamps. (For pre-1970 nanos truncation-toward-zero
      // and floor would differ; harness data is all post-epoch, and the
      // parity contract is truncation, matching DuckDB.)
      spark.read.parquet(s"$dir/events.parquet")
        .withColumn("ts", org.apache.spark.sql.functions.timestamp_micros(
          org.apache.spark.sql.functions.expr("ts DIV 1000")))
    } else {
      spark.read.parquet(s"$dir/$name.parquet")
    }
}
