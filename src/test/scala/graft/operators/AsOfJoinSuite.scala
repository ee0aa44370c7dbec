package graft.operators

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

class AsOfJoinSuite extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("union-merge as-of equals the pair-join formulation on events") {
    val e = Tables(spark, sf, "events")
    val p = e.filter(col("event_type") === "purchase")
      .select(col("event_id").as("purchase_id"), col("user_id"), col("ts").as("pts"))
    val v = e.filter(col("event_type") === "view")
      .select(col("event_id").as("view_id"), col("user_id"), col("ts").as("vts"))

    // reference: pair join + rank (q_join_asof's shape)
    val j = p.join(v.withColumnRenamed("user_id", "v_user"),
      col("user_id") === col("v_user") && col("vts") <= col("pts"))
    val w = Window.partitionBy("purchase_id").orderBy(col("vts").desc, col("view_id").desc)
    val expected = j.withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
      .select("purchase_id", "view_id")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

    // merge formulation: equal-ts ties broken by view_id ASC picking the
    // LAST = highest view_id, mirroring the DESC rank above
    val got = AsOfJoin.asofBackward(p, v, "user_id", "pts", "vts", "view_id")
      .filter(col("r_view_id").isNotNull)
      .select("purchase_id", "r_view_id")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

    assert(expected.nonEmpty)
    assert(got === expected)
  }

  test("null tiebreak value fails loudly instead of shuffle-order winners") {
    import spark.implicits._
    val l = Seq((1L, 100L, "a")).toDF("k", "t", "lv")
    val r = Seq((1L, Some(90L), "x"), (1L, None, "y"))
      .toDF("k", "tie", "rv")
      .select(col("k"), lit(90L).as("t"), col("tie"), col("rv"))
    val e = intercept[Exception] {
      AsOfJoin.asofBackward(l, r, "k", "t", "t", "tie").collect()
    }
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => Option(x.getMessage).toSeq ++ messages(x.getCause))
    assert(messages(e).exists(_.contains("null value in tiebreak column")),
      s"unexpected failure: $e")
  }

  test("range-split as-of equals the unsplit form on events, at widths spanning one to many slots") {
    val e = Tables(spark, sf, "events")
    val p = e.filter(col("event_type") === "purchase")
      .select(col("event_id").as("purchase_id"), col("user_id"), col("ts").as("pts"))
    val v = e.filter(col("event_type") === "view")
      .select(col("event_id").as("view_id"), col("user_id"), col("ts").as("vts"))
    def pairs(df: org.apache.spark.sql.DataFrame): Map[Long, Long] =
      df.filter(col("r_view_id").isNotNull).select("purchase_id", "r_view_id")
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val expected = pairs(AsOfJoin.asofBackward(p, v, "user_id", "pts", "vts", "view_id"))
    assert(expected.nonEmpty)
    // 1 hour (many slots over the corpus), 1 day, and a width past the
    // whole span (degenerates to one slot = the unsplit shape)
    for (width <- Seq(3_600_000_000L, 86_400_000_000L, 4_000_000_000_000_000L)) {
      val got = pairs(AsOfJoin.asofBackwardSplit(
        p, v, "user_id", "pts", "vts", "view_id", width))
      assert(got === expected, s"split(width=$width) diverged from unsplit")
    }
  }

  test("range-split: carry crosses right-empty slots; boundary rows stay backward-inclusive") {
    import spark.implicits._
    // slots of width 100: right only in slot 0; left rows in slots 0,2,3
    // (slot 1 entirely empty, slot 2 has no right rows) — every left match
    // must come from the slot-0 carry across the gap. Plus a right row at
    // exactly a slot boundary (t=300) matched by a left row at the same t.
    val l = Seq((1L, 50L, "a"), (1L, 250L, "b"), (1L, 320L, "c"),
      (2L, 310L, "d")).toDF("k", "t", "lv")
    val r = Seq((1L, 40L, 1L, "x"), (1L, 45L, 2L, "y"), (2L, 300L, 3L, "z"))
      .toDF("k", "t", "tie", "rv")
    val got = AsOfJoin.asofBackwardSplit(l, r, "k", "t", "t", "tie", 100L)
      .select("k", "lv", "r_rv")
      .collect().map(x => (x.getLong(0), x.getString(1),
        if (x.isNullAt(2)) null else x.getString(2))).toSet
    assert(got === Set((1L, "a", "y"), (1L, "b", "y"), (1L, "c", "y"),
      (2L, "d", "z")))
  }

  test("auto split: hot key drives the width; quiet data stays unsplit; results equal the base form") {
    import spark.implicits._
    // hot key 1: 400 rows over span 4000; quiet key 2: 4 rows
    val l = ((1 to 200).map(i => (1L, i * 20L, i.toLong)) ++
      Seq((2L, 50L, 900L), (2L, 70L, 901L))).toDF("k", "t", "lid")
    val r = ((1 to 200).map(i => (1L, i * 20L - 5L, 1000L + i)) ++
      Seq((2L, 60L, 2000L), (2L, 45L, 2001L))).toDF("k", "t", "tie")
    def pairs(df: org.apache.spark.sql.DataFrame) =
      df.filter(col("r_tie").isNotNull).select("lid", "r_tie")
        .collect().map(x => x.getLong(0) -> x.getLong(1)).toMap
    val base = pairs(AsOfJoin.asofBackward(l, r, "k", "t", "t", "tie"))
    // target 50 rows/slot: the hot key (404 union rows... 402 on key 1)
    // must split into multiple slots
    val auto = pairs(AsOfJoin.asofBackwardSplitAuto(l, r, "k", "t", "t", "tie",
      targetRowsPerSlot = 50))
    val hotWidth = AsOfJoin.autoWidth(l, r, "k", "t", "t", targetRowsPerSlot = 50)
    assert(hotWidth > 0, "hot key must trigger a split")
    assert(hotWidth < 4000, "width must be below the hot key's span")
    assert(auto === base, "auto split diverged from the base form")
    // generous target -> unsplit path, same answer
    val quiet = pairs(AsOfJoin.asofBackwardSplitAuto(l, r, "k", "t", "t", "tie"))
    assert(AsOfJoin.autoWidth(l, r, "k", "t", "t", 1L << 20) === 0L,
      "default target must not split 402 rows")
    assert(quiet === base)
  }

  test("nearest: backward wins exact-distance ties, min-id wins equal-ts, no-right keys keep null") {
    import spark.implicits._
    val l = Seq((1L, 10L, 100L), (1L, 11L, 200L), (2L, 20L, 50L), (3L, 30L, 70L))
      .toDF("k", "lid", "t")
    val r = Seq(
      (1L, 5L, 90L),  // 10 before lid=10
      (1L, 6L, 110L), // 10 after lid=10 -> tie, backward (id 5) wins
      (1L, 7L, 199L), (1L, 8L, 199L), // equal-ts backward pair -> min id 7
      (2L, 9L, 60L))  // only a future row for lid=20
      .toDF("k", "rid", "t")
    val got = AsOfJoin.asofNearest(l, r, "k", "lid", "t", "t", "rid")
      .select("lid", "r_rid", "delta_us")
      .collect().map(x => (x.getLong(0),
        if (x.isNullAt(1)) null else x.getLong(1),
        if (x.isNullAt(2)) null else x.getLong(2))).toSet
    assert(got === Set((10L, 5L, 10L), (11L, 7L, 1L), (20L, 9L, 10L),
      (30L, null, null)))
  }

  test("left rows with no prior right row survive with null match") {
    import spark.implicits._
    val l = Seq((1L, 100L, "a"), (2L, 50L, "b")).toDF("k", "t", "lv")
    val r = Seq((1L, 90L, "x"), (1L, 100L, "y"), (2L, 60L, "z")).toDF("k", "t", "rv")
    val got = AsOfJoin.asofBackward(l, r, "k", "t", "t", "t")
      .select("k", "lv", "r_rv")
      .collect().map(x => (x.getLong(0), x.getString(1),
        if (x.isNullAt(2)) null else x.getString(2))).toSet
    // k=1 at t=100: right 'y' at exactly t=100 is visible (backward-inclusive)
    // k=2 at t=50: right 'z' is at t=60 (future) -> null
    assert(got === Set((1L, "a", "y"), (2L, "b", null)))
  }
}
