package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Join strategies for the shapes that hurt at 100 TB.
  *
  * - Bucketing: co-locate both sides of a recurring fact-fact equi join by
  *   writing them bucketed+sorted on the join key; Spark then plans the
  *   join with ZERO exchanges (verified by BucketedJoinSuite on the plan).
  *   At cluster scale this is the difference between a full shuffle of the
  *   big table per query and none.
  * - Salting: break a hot key across `numSalts` sub-keys; the small side is
  *   replicated numSalts times, the large side's salt is derived
  *   deterministically from a row hash so results are reproducible. AQE's
  *   skew-join handles moderate skew automatically; salting is for the
  *   pathological single-key case AQE cannot split (one key > one task).
  */
object ScaleJoins {

  /** Write both sides bucketed+sorted on the key into the session catalog. */
  def writeBucketed(df: DataFrame, table: String, key: String,
                    numBuckets: Int): Unit =
    df.write.mode("overwrite")
      .bucketBy(numBuckets, key)
      .sortBy(key)
      .saveAsTable(table)

  /** Equi join of two same-bucketing tables — exchange-free by layout. */
  def bucketedEquiJoin(spark: SparkSession, leftTable: String,
                       rightTable: String, leftKey: String,
                       rightKey: String): DataFrame =
    spark.table(leftTable)
      .join(spark.table(rightTable), col(leftKey) === col(rightKey))

  /** Skew-safe equi join: `large` keeps one row per input row (salt derived
    * from xxhash64 of the whole row — deterministic), `small` is exploded
    * to every salt. Result set is identical to the plain equi join. */
  def saltedJoin(large: DataFrame, small: DataFrame, largeKey: String,
                 smallKey: String, numSalts: Int): DataFrame = {
    val salted = large.withColumn("_salt",
      pmod(xxhash64(large.columns.map(col).toSeq: _*), lit(numSalts)))
    val replicated = small.withColumn("_salt",
      explode(sequence(lit(0L), lit(numSalts - 1L))))
    salted.join(replicated,
        col(largeKey) === col(smallKey) && salted("_salt") === replicated("_salt"))
      .drop("_salt")
  }
}
