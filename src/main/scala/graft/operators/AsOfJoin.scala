package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ByteType, IntegerType, LongType, ShortType, TimestampType}

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
  * Skew: [[asofBackward]]'s running-frame window puts one pathological key
  * (a single user with billions of rows) on one sort task, and it cannot be
  * salted the way an equi join can (running state crosses salt boundaries).
  * [[asofBackwardSplit]] is the designed mitigation: range-split every
  * key's timeline into fixed-width slots, run the same running-frame window
  * per (key, slot) — the hot key now spans as many tasks as it spans slots
  * — and stitch slot boundaries with a carry row (the last right row of all
  * earlier slots), computed on a frame of one row per (key, slot).
  */
object AsOfJoin {

  /** Tag, project and union the two sides into the merge frame:
    * (_k, _t, _tag 1=left/0=right, _tie, _l, _r). Shared by both
    * formulations — one tagging contract, one set of guards. */
  private def merged(left: DataFrame, right: DataFrame, key: String,
                     leftTs: String, rightTs: String,
                     rightTieBreak: String): DataFrame = {
    // fail loudly: a non-integral tiebreak would silently cast to null and
    // make equal-ts winners depend on shuffle order
    right.schema(rightTieBreak).dataType match {
      case LongType | IntegerType | ShortType | ByteType => ()
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
    l.unionByName(r)
  }

  /** Final projection back to the public contract: left columns verbatim,
    * matched right columns prefixed `r_` (null structs fan out to null
    * columns — the unmatched-left case). */
  private def project(matched: DataFrame, leftCols: Array[String],
                      rightCols: Array[String]): DataFrame =
    matched.select(col("_l").as("l"), col("_m").as("r"))
      .select(leftCols.map(c => col(s"l.$c")) ++
        rightCols.map(c => col(s"r.$c").as(s"r_$c")): _*)

  /** [[asofBackwardSplit]] with the slot width DERIVED from the data — the
    * self-tuning form: one profiling aggregation finds the hottest key
    * (most rows across both sides) and sizes slots so that key lands
    * ~`targetRowsPerSlot` rows per sort task; every other key has fewer
    * rows per slot by construction. Keys that fit the target in one slot
    * — including every key when no skew exists — make this exactly
    * [[asofBackward]]'s plan plus the one profile pass. The profile
    * collect is ONE row (a meta row, not data). */
  def asofBackwardSplitAuto(left: DataFrame, right: DataFrame, key: String,
                            leftTs: String, rightTs: String,
                            rightTieBreak: String,
                            targetRowsPerSlot: Long = 1L << 20): DataFrame = {
    val w = autoWidth(left, right, key, leftTs, rightTs, targetRowsPerSlot)
    if (w == 0L) asofBackward(left, right, key, leftTs, rightTs, rightTieBreak)
    else asofBackwardSplit(left, right, key, leftTs, rightTs, rightTieBreak, w)
  }

  /** The slot width [[asofBackwardSplitAuto]] derives from the data (0 =
    * unsplit) — the profile pass alone, exposed as a pure function so
    * callers and suites can inspect the decision without shared mutable
    * JVM state (concurrent auto-joins each get their own local width). */
  private[graft] def autoWidth(left: DataFrame, right: DataFrame, key: String,
                               leftTs: String, rightTs: String,
                               targetRowsPerSlot: Long): Long = {
    require(targetRowsPerSlot > 0, s"need targetRowsPerSlot > 0, got $targetRowsPerSlot")
    def side(df: DataFrame, ts: String) = {
      val t = df.schema(ts).dataType match {
        case TimestampType => unix_micros(col(ts))
        case _ => col(ts).cast("long")
      }
      df.select(col(key).as("_k"), t.as("_t"))
    }
    val prof = side(left, leftTs).unionByName(side(right, rightTs))
      .groupBy("_k")
      .agg(count(lit(1)).as("n"), min("_t").as("lo"), max("_t").as("hi"))
      .orderBy(col("n").desc, col("_k")).limit(1)
      .collect()
    prof.headOption.map { h =>
      val (n, span) = (h.getAs[Long]("n"), h.getAs[Long]("hi") - h.getAs[Long]("lo"))
      if (n <= targetRowsPerSlot || span <= 0) 0L
      else math.max(1L, span / math.max(1L, n / targetRowsPerSlot))
    }.getOrElse(0L)
  }

  /** NEAREST as-of from two union-merge passes — the linear-sort
    * composition of the either-direction match (q_join_asof_nearest's
    * pair-form semantics) that survives hot keys: a backward pass picks
    * each left row's latest right at-or-before, a second backward pass
    * over NEGATED time picks its earliest right at-or-after, and a per-row
    * argmin on |delta| picks between them. Two linear sorts + one
    * left-id equi join — never the per-key pair blowup.
    *
    * Tie rules (matching the pair form's (delta, direction, id) ranking):
    * equal |delta| across directions goes BACKWARD; equal ts within a
    * direction goes to the SMALLEST `rightTieBreak` (the passes run with
    * the negated tiebreak, so "last under ascending" lands on the min).
    *
    * `leftId` must be unique per left row (it keys the join between the
    * two passes). Output: left columns verbatim, matched right columns as
    * `r_<col>`, plus `delta_us` (microseconds if the ts columns are
    * timestamps, raw units if integral; null when the key has no right
    * rows at all — the unmatched-left case, kept like [[asofBackward]]). */
  def asofNearest(left: DataFrame, right: DataFrame, key: String,
                  leftId: String, leftTs: String, rightTs: String,
                  rightTieBreak: String): DataFrame = {
    def micros(df: DataFrame, c: String): Column = df.schema(c).dataType match {
      case TimestampType => unix_micros(col(c))
      case _ => col(c).cast("long")
    }
    val l2 = left.withColumn("_lus", micros(left, leftTs))
    val r2 = right.withColumn("_rus", micros(right, rightTs))
      .withColumn("_negtie", -col(rightTieBreak).cast("long"))
    val b = asofBackward(l2, r2, key, "_lus", "_rus", "_negtie")
    val f = asofBackward(l2.withColumn("_nlus", -col("_lus")),
      r2.withColumn("_nrus", -col("_rus")), key, "_nlus", "_nrus", "_negtie")
    val rightCols = r2.columns // includes _rus: the chosen side's ts
    def pass(df: DataFrame, out: String): DataFrame = df.select(
      col(leftId).as("_id") +: col("_lus") +:
        left.columns.map(col) :+
        // null-match detection via the never-null-on-right tiebreak
        when(col("r__negtie").isNotNull,
          struct(rightCols.map(c => col(s"r_$c").as(c)): _*)).as(out): _*)
    val bb = pass(b, "_mb")
    val ff = pass(f, "_mf").select("_id", "_mf")
    val db = col("_lus") - col("_mb._rus")
    val df_ = col("_mf._rus") - col("_lus")
    val chosen = when(col("_mb").isNull, col("_mf"))
      .when(col("_mf").isNull, col("_mb"))
      .when(df_ < db, col("_mf"))
      .otherwise(col("_mb")) // equal |delta| goes backward
    bb.join(ff, "_id")
      .withColumn("_m", chosen)
      .select(left.columns.map(col) ++
        right.columns.map(c => col(s"_m.$c").as(s"r_$c")) :+
        abs(col("_m._rus") - col("_lus")).as("delta_us"): _*)
  }

  def asofBackward(left: DataFrame, right: DataFrame, key: String,
                   leftTs: String, rightTs: String,
                   rightTieBreak: String): DataFrame = {
    val w = Window.partitionBy("_k")
      .orderBy(col("_t"), col("_tag"), col("_tie"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    project(
      merged(left, right, key, leftTs, rightTs, rightTieBreak)
        .withColumn("_m", last(col("_r"), ignoreNulls = true).over(w))
        .filter(col("_tag") === 1),
      left.columns, right.columns)
  }

  /** [[asofBackward]] with the hot-key mitigation built in: identical
    * results (suite-pinned), but the per-key sort is RANGE-SPLIT into
    * fixed-width time slots of `slotWidthMicros` microseconds, so a single
    * pathological key's rows spread over (its time span / slot width)
    * tasks instead of one.
    *
    * Three-stage plan, every stage linear and skew-split:
    *   1. in-slot pass: the running `last(right)` window over
    *      (_k, _slot) — the hot key's rows are in different partitions
    *      per slot;
    *   2. carry: one row per (key, slot) — `max_by(right, (ts, tie))`
    *      partial-aggregates map-side — then the latest right row of all
    *      STRICTLY EARLIER slots via a running window over the tiny
    *      per-slot frame (rows per key = its non-empty slots);
    *   3. stitch: left rows with no in-slot match coalesce to their
    *      slot's carry (equi-join on (_k, _slot) — also skew-split).
    *
    * Pick `slotWidthMicros` from the profile that showed the hot key:
    * width ~ (hot key's span / desired split count). Keys spanning fewer
    * than two slots degenerate to exactly [[asofBackward]]'s shape.
    * Timestamps are slotted on `unix_micros`; integral ts columns are
    * slotted on their raw value (width then shares their unit). */
  def asofBackwardSplit(left: DataFrame, right: DataFrame, key: String,
                        leftTs: String, rightTs: String,
                        rightTieBreak: String,
                        slotWidthMicros: Long): DataFrame = {
    require(slotWidthMicros > 0, s"slot width must be > 0, got $slotWidthMicros")
    val micros: Column = left.schema(leftTs).dataType match {
      case TimestampType => unix_micros(col("_t"))
      case _ => col("_t").cast("long")
    }
    val u = merged(left, right, key, leftTs, rightTs, rightTieBreak)
      // floor of a double division: micros magnitudes (~1.7e15) are exact
      // in double (< 2^53), so the slot id is exact
      .withColumn("_slot", floor(micros / lit(slotWidthMicros.toDouble)))
    val wIn = Window.partitionBy("_k", "_slot")
      .orderBy(col("_t"), col("_tag"), col("_tie"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val inSlot = u.withColumn("_m", last(col("_r"), ignoreNulls = true).over(wIn))
      .filter(col("_tag") === 1)
    // one row per (key, slot) — including right-empty slots, whose null
    // _sl lets the running last skip them while still anchoring the join
    val slotLast = u.groupBy("_k", "_slot")
      .agg(max_by(col("_r"),
        when(col("_tag") === 0, struct(col("_t"), col("_tie")))).as("_sl"))
    val wCarry = Window.partitionBy("_k").orderBy("_slot")
      .rowsBetween(Window.unboundedPreceding, -1)
    val carry = slotLast
      .withColumn("_c", last(col("_sl"), ignoreNulls = true).over(wCarry))
      .select(col("_k"), col("_slot"), col("_c"))
    project(
      inSlot.join(carry, Seq("_k", "_slot"), "left")
        .withColumn("_m", coalesce(col("_m"), col("_c"))),
      left.columns, right.columns)
  }
}
