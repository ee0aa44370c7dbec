package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Backward as-of join without the pair blowup.
  *
  * The window-over-pairs formulation (q_join_asof's oracle-friendly shape)
  * joins every left row to ALL earlier right rows before ranking — O(pairs
  * per key), quadratic under hot keys. This operator uses the union-merge
  * formulation instead: tag both sides, union, one sort per key over
  * (ts, tag, tiebreak), and `last(right, ignoreNulls)` over the running
  * frame gives every left row its latest right row with ts <= left.ts.
  * ONE shuffle + ONE sort, linear in rows — the shape that survives 100 TB
  * (and exactly what a native merge-join as-of would do; Spark 4.1 has no
  * built-in as-of, SURVEY §2.2).
  *
  * Right rows at exactly left.ts ARE visible (backward-inclusive), matching
  * the pair formulation's `rts <= lts`. Among equal-ts right rows the
  * winner is the LAST under `rightTieBreak` ascending — pass the mirror of
  * the pair form's DESC ranking.
  *
  * Skew: one pathological key (a single user with billions of rows) lands
  * on one sort task. The running-frame window cannot be salted the way an
  * equi join can (state crosses salt boundaries); the mitigation is range-
  * splitting that key by time and stitching the last carry row of each
  * range forward — only worth building when a profile shows the hot key.
  */
object AsOfJoin {

  def asofBackward(left: DataFrame, right: DataFrame, key: String,
                   leftTs: String, rightTs: String,
                   rightTieBreak: String): DataFrame = {
    // fail loudly: a non-integral tiebreak would silently cast to null and
    // make equal-ts winners depend on shuffle order
    right.schema(rightTieBreak).dataType match {
      case org.apache.spark.sql.types.LongType | org.apache.spark.sql.types.IntegerType |
           org.apache.spark.sql.types.ShortType | org.apache.spark.sql.types.ByteType => ()
      case other => throw new IllegalArgumentException(
        s"rightTieBreak '$rightTieBreak' must be an integral column, got ${other.sql}")
    }
    val leftCols = left.columns
    val rightCols = right.columns
    val l = left.select(
      col(key).as("_k"), col(leftTs).as("_t"), lit(1).as("_tag"),
      lit(null).cast("long").as("_tie"),
      struct(leftCols.map(col): _*).as("_l"),
      lit(null).cast(right.select(struct(rightCols.map(col): _*)).schema.head.dataType)
        .as("_r"))
    val r = right.select(
      col(key).as("_k"), col(rightTs).as("_t"), lit(0).as("_tag"),
      // and fail loudly at RUNTIME on a null tiebreak value: nulls sort
      // first, so among equal-ts right rows two null-tiebreak rows would
      // make the 'last' winner depend on shuffle order — exactly the
      // nondeterminism this column exists to prevent
      when(col(rightTieBreak).isNotNull, col(rightTieBreak).cast("long"))
        .otherwise(raise_error(lit(
          s"asofBackward: null value in tiebreak column '$rightTieBreak'")))
        .as("_tie"),
      lit(null).cast(left.select(struct(leftCols.map(col): _*)).schema.head.dataType)
        .as("_l"),
      struct(rightCols.map(col): _*).as("_r"))
    val w = Window.partitionBy("_k")
      .orderBy(col("_t"), col("_tag"), col("_tie"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    l.unionByName(r)
      .withColumn("_m", last(col("_r"), ignoreNulls = true).over(w))
      .filter(col("_tag") === 1)
      .select(col("_l").as("l"), col("_m").as("r"))
      .select(leftCols.map(c => col(s"l.$c")) ++
        rightCols.map(c => col(s"r.$c").as(s"r_$c")): _*)
  }
}
