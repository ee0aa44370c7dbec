package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Hive-style partitioned parquet layout — the 100 TB table organization.
  *
  * A fact table partitioned on a low-cardinality predicate column (event
  * date, event_type, lang, source shard) turns every query that filters on
  * that column into a directory-listing prune: Catalyst resolves the
  * partition filter BEFORE the scan, so a day query over a year of data
  * touches 1/365th of the files regardless of cluster size. The suite
  * asserts the prune is visible in the physical plan (PartitionFilters +
  * partition count), not just that results are correct.
  *
  * Rules of thumb encoded here:
  *  - partition columns must be low-cardinality (directories are metadata;
  *    10k+ partitions stress the driver's listing, millions break it);
  *  - dynamic overwrite (partitionOverwriteMode=dynamic) replaces only the
  *    partitions present in the incoming batch — the idempotent daily-load
  *    primitive (re-running a day never touches other days);
  *  - within a partition, files should be ~128 MB-1 GB: repartition on the
  *    partition column before writing to avoid the small-files problem
  *    (one file per task per partition otherwise).
  */
object PartitionedLayout {

  /** Write `df` partitioned by `cols`, one file per partition directory
    * (repartition on the partition columns first — the small-files guard). */
  def writePartitioned(df: DataFrame, path: String, cols: String*): Unit =
    df.repartition(cols.map(org.apache.spark.sql.functions.col): _*)
      .write.mode(SaveMode.Overwrite)
      .partitionBy(cols: _*)
      .parquet(path)

  /** Append `df` into an existing partitioned layout (new files land in
    * their partition directories; existing files are untouched). The
    * DAILY-ADD primitive: unlike [[overwritePartitions]] it is NOT
    * idempotent — re-running the same batch duplicates it — so callers
    * own dedup/versioning (e.g. IvfIndex.appendToIndex's batch contract). */
  def appendPartitions(df: DataFrame, path: String, cols: String*): Unit =
    df.repartition(cols.map(org.apache.spark.sql.functions.col): _*)
      .write.mode(SaveMode.Append)
      .partitionBy(cols: _*)
      .parquet(path)

  /** Overwrite ONLY the partitions present in `df` (idempotent re-load). */
  def overwritePartitions(df: DataFrame, path: String, cols: String*): Unit = {
    val spark = df.sparkSession
    val prev = spark.conf.getOption("spark.sql.sources.partitionOverwriteMode")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try df.write.mode(SaveMode.Overwrite).partitionBy(cols: _*).parquet(path)
    finally prev match {
      case Some(v) => spark.conf.set("spark.sql.sources.partitionOverwriteMode", v)
      case None => spark.conf.unset("spark.sql.sources.partitionOverwriteMode")
    }
  }

  def read(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)
}
