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

  /** Drop every row whose `keys`-group exceeds `cap` rows — the
    * stop-shingle / stop-fingerprint / hot-bucket guard the LSH dedup band
    * joins need before their self-join: a band bucket of B rows emits
    * B·(B-1)/2 candidate pairs, so one boilerplate-heavy key (every doc
    * sharing a licence header) turns the join quadratic. Hot keys are few
    * by definition, so the over-cap key set broadcasts; the anti join adds
    * no shuffle of `df` beyond the counting aggregation.
    *
    * Dropping, not salting: a self-join's output really is quadratic in
    * the bucket — salting only spreads the same B²/2 pairs across tasks,
    * which helps a skewed *task* but not a corpus where the pairs
    * themselves are the cost. A key hot enough to hit the cap carries no
    * dedup signal (it matches everything), exactly like a stopword. */
  def dropHotKeys(df: DataFrame, keys: Seq[String], cap: Int): DataFrame = {
    require(cap >= 1, s"cap must be >= 1, got $cap")
    val hot = df.groupBy(keys.map(col): _*).agg(count(lit(1)).as("_n"))
      .filter(col("_n") > cap).select(keys.map(col): _*)
    df.join(broadcast(hot), keys, "left_anti")
  }

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
