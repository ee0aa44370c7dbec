package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** sfDir -> named DataFrames. Schemas come from parquet footers (no inference).
  * Scans stay vectorized + column-pruned; never cache here — each query owns
  * its plan so Catalyst can push filters/projections into the scan.
  */
object Tables {
  val names: Seq[String] = Seq("region", "nation", "customer", "supplier",
    "part", "orders", "lineitem", "events", "documents", "embeddings")

  def apply(spark: SparkSession, dir: String, name: String): DataFrame =
    if (name == "events") {
      // events.ts is parquet TIMESTAMP(NANOS), which Spark 4.x rejects by
      // default. Read the raw int64 nanos and floor-divide to micros — the
      // same truncation DuckDB applies in CAST(ts AS TIMESTAMP), so both
      // engines see identical microsecond timestamps.
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      spark.read.parquet(s"$dir/events.parquet")
        .withColumn("ts", org.apache.spark.sql.functions.timestamp_micros(
          org.apache.spark.sql.functions.expr("ts DIV 1000")))
    } else {
      spark.read.parquet(s"$dir/$name.parquet")
    }
}
