package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** sfDir -> named DataFrames. Schemas come from parquet footers (no inference).
  * Scans stay vectorized + column-pruned; never cache here — each query owns
  * its plan so Catalyst can push filters/projections into the scan.
  */
object Tables {
  val names: Seq[String] = Seq("region", "nation", "customer", "supplier",
    "part", "orders", "lineitem", "events", "documents", "embeddings")

  /** events.ts has shipped as parquet TIMESTAMP(NANOS) in some testdata
    * generations, which Spark 4.x rejects unless this legacy conf maps it
    * to raw int64 nanos. Our own sessions (Bench, Verify, SparkSpec) set
    * it at construction; this guard only covers driver-owned sessions
    * handed to SparkEntry, where the conf is a hard prerequisite for
    * reading a NANOS `events` at all (idempotent, checked first to avoid
    * gratuitous conf writes on every scan). Harmless for µs files — the
    * conf only changes how NANOS columns are typed.
    */
  def ensureNanosConf(spark: SparkSession): Unit =
    if (spark.conf.get(NanosKey, "false") != "true")
      spark.conf.set(NanosKey, "true")

  val NanosKey = "spark.sql.legacy.parquet.nanosAsLong"

  def apply(spark: SparkSession, dir: String, name: String): DataFrame =
    if (name == "events") {
      ensureNanosConf(spark)
      // The testdata generator has shipped events.ts both as
      // TIMESTAMP(NANOS) and as plain timestamp[us]; adapt to what the
      // footer actually says so a regenerated dataset can't break every
      // events query (it did once — round 7).
      val raw = spark.read.parquet(s"$dir/events.parquet")
      raw.schema("ts").dataType match {
        case org.apache.spark.sql.types.LongType =>
          // NANOS read as int64 under NanosKey. `ts DIV 1000` truncates
          // ns → µs toward zero — identical to DuckDB's CAST(ts AS
          // TIMESTAMP) on the same file, so both engines see the same
          // microsecond timestamps. (For pre-1970 nanos truncation-
          // toward-zero and floor would differ; harness data is all
          // post-epoch, and the parity contract is truncation.)
          raw.withColumn("ts", org.apache.spark.sql.functions.timestamp_micros(
            org.apache.spark.sql.functions.expr("ts DIV 1000")))
        case org.apache.spark.sql.types.TimestampNTZType =>
          // µs file inferred as TIMESTAMP_NTZ (Spark 4 default for
          // tz-less parquet). Cast to TIMESTAMP under the UTC session
          // timezone every graft session pins — value-preserving, and it
          // keeps every downstream query seeing the TimestampType they
          // were written against (DuckDB reads the same file as naive
          // TIMESTAMP, so parity is unchanged).
          raw.withColumn("ts", org.apache.spark.sql.functions.col("ts")
            .cast(org.apache.spark.sql.types.TimestampType))
        case _ => raw // already TimestampType
      }
    } else {
      spark.read.parquet(s"$dir/$name.parquet")
    }
}
