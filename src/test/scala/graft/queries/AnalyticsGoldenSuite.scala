package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Hand-computed goldens for the round-4 analytics batch (OHLC candles,
  * EWMA, deterministic mode, interval-overlap join, regex scalars, Flesch
  * readability). The gated queries read `Tables(dir, name)`, so the crafted
  * inputs are written as parquet into a temp sfDir and the REAL query
  * closures run on them — the golden exercises the exact production plan,
  * not a reimplementation. events.ts is written as raw int64 nanos, the
  * same physical shape `nanosAsLong` gives the harness tables.
  */
class AnalyticsGoldenSuite extends SparkSpec {

  private lazy val dir: String = {
    val d = java.nio.file.Files.createTempDirectory("graft-golden").toString
    val s = spark
    import s.implicits._

    val ns = 1000000000L
    val base = 1700000000L * ns // 2023-11-14 22:13:20 UTC
    // user 1 / type a: values 1..10 one second apart; user 2 / type b:
    // constant 5.0 — candles and EWMA are hand-derivable for both.
    val ev =
      (1 to 10).map(i => (i.toLong, base + i * ns, 1L, "a", i.toDouble, "{}")) ++
        (1 to 9).map(i => (100L + i, base + i * ns, 2L, "b", 5.0, "{}"))
    ev.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .coalesce(1).write.parquet(s"$d/events.parquet")

    Seq(
      (1L, "Hello world. This is fun!", "en", "t", 25L),
      (2L, "xyz qrst", "en", "t", 8L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.parquet(s"$d/documents.parquet")

    Seq(
      (1L, "azure frosted metallic", "B", "STANDARD BRUSHED", 1, 1.0),
      (2L, "bolt", "B", "SMALL ANODIZED", 1, 1.0),
      (3L, "a bc def", "B", "X", 1, 1.0))
      .toDF("p_partkey", "p_name", "p_brand", "p_type", "p_size", "p_retailprice")
      .coalesce(1).write.parquet(s"$d/part.parquet")
    d
  }

  test("q_ts_ohlc: candles match hand-derived open/high/low/close") {
    val got = TimeSeries.queries("q_ts_ohlc")(spark, dir).collect()
      .map(r => (r.getString(0), r.getString(1),
        r.getDouble(2), r.getDouble(3), r.getDouble(4), r.getDouble(5), r.getLong(6)))
    assert(got.toSeq === Seq(
      ("2023-11-14", "a", 1.0, 10.0, 1.0, 10.0, 10L),
      ("2023-11-14", "b", 5.0, 5.0, 5.0, 5.0, 9L)))
  }

  test("q_ts_lttb: edge buckets anchor extremes, middle bucket keeps the spike") {
    val s = spark
    import s.implicits._
    val d = java.nio.file.Files.createTempDirectory("graft-lttb").toString
    val ns = 1000000000L
    val hour = 3600L * ns
    val base = 1700006400L * ns // 2023-11-15 00:00:00 UTC — bucket-aligned
    // one series, three 6h buckets; bucket 1 has an unmistakable spike
    Seq(
      (1L, base + 0 * hour, 1L, "a", 1.0, "{}"),
      (2L, base + 1 * hour, 1L, "a", 2.0, "{}"),
      (3L, base + 7 * hour, 1L, "a", 1.0, "{}"),
      (4L, base + 8 * hour, 1L, "a", 50.0, "{}"), // spike
      (5L, base + 9 * hour, 1L, "a", 1.0, "{}"),
      (6L, base + 13 * hour, 1L, "a", 1.0, "{}"),
      (7L, base + 14 * hour, 1L, "a", 3.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .coalesce(1).write.parquet(s"$d/events.parquet")
    val got = TimeSeries.queries("q_ts_lttb")(spark, d).collect()
      .map(r => (r.getString(1), r.getLong(2), r.getDouble(4)))
    assert(got.toSeq === Seq(
      ("2023-11-15 00:00:00", 1L, 1.0),   // first bucket: min-ts anchor
      ("2023-11-15 06:00:00", 4L, 50.0),  // spike wins max triangle area
      ("2023-11-15 12:00:00", 7L, 3.0)))  // last bucket: max-ts anchor
  }

  test("q_ts_ewma: trailing-8 decay-0.5 averages match exact hand arithmetic") {
    // weights 0.5^i are exact powers of two and values are small integers,
    // so num and den are exact doubles: num(v)=sum_{i<8}(v-i)*0.5^i and
    // each +1 step adds exactly den=1.9921875. Expected values verified by
    // hand: 14.0078125/den, 16/den, 17.9921875/den -> 7.0314/8.0314/9.0314.
    val got = TimeSeries.queries("q_ts_ewma")(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(got.toSeq === Seq(
      (8L, 1L, 7.0314), (9L, 1L, 8.0314), (10L, 1L, 9.0314),
      (108L, 2L, 5.0), (109L, 2L, 5.0)))
  }

  test("q_text_readability: Flesch score matches hand-computed counts") {
    val got = LlmOps.queries("q_text_readability")(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4)))
    assert(got.toSeq === Seq(
      // 5 words, 2 sentences ('.'/'!'), 6 vowel groups:
      // 206.835 - 1.015*2.5 - 84.6*1.2 = 102.7775
      (1L, 5L, 2L, 6L, 102.7775),
      // no sentence punctuation -> floor of 1; 'y' counts as a vowel group:
      // 206.835 - 1.015*2 - 84.6*0.5 = 162.505
      (2L, 2L, 1L, 1L, 162.505)))
  }

  test("q_scalar_regex: extract-all / count / replace / rlike goldens") {
    val got = Scalars.queries("q_scalar_regex")(spark, dir).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getString(3), r.getLong(4)))
    assert(got.toSeq === Seq(
      (1L, "azure frosted metallic", 8L, "_z_r_ fr_st_d m_t_ll_c", 1L),
      (2L, "bolt", 1L, "b_lt", 0L),
      (3L, "", 2L, "_ bc d_f", 0L)))
  }

  test("q_scalar_struct: field access and positional equality goldens") {
    val got = Scalars.queries("q_scalar_struct")(spark, dir).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
    // brand is "B" everywhere, never 'Brand#13'
    assert(got.toSeq === Seq((1L, "B", 2L, 0L), (2L, "B", 2L, 0L), (3L, "B", 2L, 0L)))
  }

  test("q_scalar_cast: try_cast nulls, round-trips, and floor semantics") {
    val got = Scalars.queries("q_scalar_cast")(spark, dir).collect()
      .map(r => (r.getLong(0), r.isNullAt(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
    // first words are alphabetic -> null; size 1 round-trips; price 1.0
    // floors to 1; '20'+'1' -> 201; brand 'B' is never a date
    assert(got.toSeq === Seq(
      (1L, true, 1L, 1L, 201L, 1L),
      (2L, true, 1L, 1L, 201L, 1L),
      (3L, true, 1L, 1L, 201L, 1L)))
  }

  test("q_ts_attribution: crafted stream credits the hand-derived channels") {
    // user 1 / type "a" and user 2 / type "b" contain no purchase/touch
    // types at all -> attribution over this dir must be empty (no
    // purchases), which pins the filter rather than silently passing
    assert(TimeSeries.queries("q_ts_attribution")(spark, dir).collect().isEmpty)
  }

  test("q_split_leakage_safe: no near-dup pair crosses sides; both sides populated") {
    // the END-TO-END leakage property, independent of how the split is
    // built: join the actual near-dup pairs against the assignment and
    // demand zero cross-side pairs — a per-doc coin (what this op
    // exists to prevent) fails it with high probability
    val sf = "/root/testdata/sf0.01"
    val split = graft.SparkEntry.queries("q_split_leakage_safe")(spark, sf)
    val side = split.select(col("doc_id"), col("side"))
    val pairs = graft.SparkEntry.queries("q_dedup_near")(spark, sf)
      .select(col("d1"), col("d2"))
    val crossers = pairs
      .join(side.select(col("doc_id").as("d1"), col("side").as("s1")), "d1")
      .join(side.select(col("doc_id").as("d2"), col("side").as("s2")), "d2")
      .filter(col("s1") =!= col("s2"))
    assert(crossers.count() === 0L, "a near-dup pair crossed the split")
    val bySide = split.groupBy("side").count()
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    assert(bySide.getOrElse("train", 0L) > 0 && bySide.getOrElse("test", 0L) > 0)
    // the hash is balanced-ish despite sequential cluster reps
    val frac = bySide("train").toDouble / (bySide("train") + bySide("test"))
    assert(frac > 0.7 && frac < 0.9, s"train fraction $frac drifted from 0.8")
  }

  test("knuthHash32: split multiply == rep·A mod 2³² past the int64 overflow bound") {
    import spark.implicits._
    // reps above ~3.47e9 overflow the naive rep*2654435761 in BIGINT (the
    // r9 ADVICE finding: Spark wrapped negative → every such doc 'train',
    // DuckDB errored); the 16×16 split form must equal the exact
    // arbitrary-precision product for all of them
    val reps = Seq(0L, 1L, 12345L, 2147483647L, 3469999999L, 3470000001L,
      4294967295L, 4294967296L, 1L << 40, (1L << 62) + 987654321L)
    val got = reps.toDF("cluster_rep")
      .selectExpr("cluster_rep", LlmOps.knuthHash32("cluster_rep") + " AS h")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    reps.foreach { r =>
      val exp = ((BigInt(r) * BigInt(2654435761L)) % BigInt(4294967296L)).toLong
      assert(got(r) === exp, s"rep $r: got ${got(r)}, want $exp")
      assert(got(r) >= 0, s"rep $r hashed negative — the overflow wrap is back")
    }
  }
}
