package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** CSV / JSON-lines sources and sinks with EXPLICIT schemas.
  *
  * Policy (100 TB): never infer schema — inference is a full extra pass over
  * the data and can silently change types between runs; the caller always
  * passes a StructType. FAILFAST so a malformed row stops the job instead of
  * becoming a silent null (same fail-loudly contract as MultiLabelText).
  * Both formats are splittable line-based scans; timestamps are pinned to
  * UTC ISO-8601 so round-trips are bytewise stable.
  */
object Delimited {

  private val TsFormat = "yyyy-MM-dd'T'HH:mm:ss.SSSSSSXXX"

  def readCsv(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read
      .schema(schema)
      .option("header", "true")
      .option("mode", "FAILFAST")
      .option("timestampFormat", TsFormat)
      .csv(path)

  def writeCsv(df: DataFrame, path: String): Unit =
    df.write
      .option("header", "true")
      .option("timestampFormat", TsFormat)
      .mode("overwrite")
      .csv(path)

  def readJsonLines(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read
      .schema(schema)
      .option("mode", "FAILFAST")
      .option("timestampFormat", TsFormat)
      .json(path)

  def writeJsonLines(df: DataFrame, path: String): Unit =
    df.write
      .option("timestampFormat", TsFormat)
      .option("ignoreNullFields", "false")
      .mode("overwrite")
      .json(path)
}
