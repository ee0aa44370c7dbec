package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Streaming temporal join: event-time enrichment against the committed
  * dimension history, exactly-once state versioning, bounded per-key
  * history, and batch/stream agreement through the shared AsOfJoin code
  * path. */
class TemporalJoinSuite extends SparkSpec {

  private def tmp(name: String): String =
    java.nio.file.Files.createTempDirectory(name).toString

  private def facts(rows: (Long, Long, Long)*): DataFrame = {
    import spark.implicits._
    rows.toDF("k", "t", "fact_id")
  }
  private def dims(rows: (Long, Long, Long, String)*): DataFrame = {
    import spark.implicits._
    rows.toDF("k", "t", "dim_id", "dim_value")
  }
  private def enrichedMap(out: String): Map[Long, Option[String]] =
    TemporalJoin.enriched(spark, out)
      .select("fact_id", "r_dim_value").collect()
      .map(r => r.getLong(0) -> Option(r.getString(1))).toMap

  test("facts match the dimension version current at their EVENT time, across batches") {
    val st = tmp("tj-state"); val out = tmp("tj-out")
    // batch 0: two versions of k=1 plus facts landing before/between/after
    TemporalJoin.applyBatch(
      facts((1L, 5L, 100L), (1L, 15L, 101L), (1L, 25L, 102L)),
      dims((1L, 10L, 1L, "v1"), (1L, 20L, 2L, "v2")),
      "k", "t", "dim_id", st, out, batchId = 0L)
    // batch 1: a late fact at t=12 still sees v1 (retained history), a
    // new version v3 arrives, a fact after it sees v3; a fresh key's
    // fact before any of its versions matches null
    TemporalJoin.applyBatch(
      facts((1L, 12L, 103L), (1L, 35L, 104L), (2L, 8L, 105L)),
      dims((1L, 30L, 3L, "v3"), (2L, 9L, 4L, "w1")),
      "k", "t", "dim_id", st, out, batchId = 1L)
    assert(enrichedMap(out) === Map(
      100L -> None, 101L -> Some("v1"), 102L -> Some("v2"),
      103L -> Some("v1"), 104L -> Some("v3"), 105L -> None))
  }

  test("in-order stream equals the batch as-of over the full dimension table") {
    val st = tmp("tj-eq-state"); val out = tmp("tj-eq-out")
    val allDims = dims((1L, 10L, 1L, "a"), (1L, 30L, 2L, "b"),
      (2L, 5L, 3L, "c"), (2L, 50L, 4L, "d"))
    val allFacts = facts((1L, 12L, 200L), (1L, 31L, 201L), (2L, 6L, 202L),
      (2L, 60L, 203L), (2L, 4L, 204L))
    // split by time so every dimension version is committed at or before
    // the batch its dependent facts arrive in (the in-order case)
    TemporalJoin.applyBatch(allFacts.filter(col("t") <= 12),
      allDims.filter(col("t") <= 10), "k", "t", "dim_id", st, out, 0L)
    TemporalJoin.applyBatch(allFacts.filter(col("t") > 12),
      allDims.filter(col("t") > 10), "k", "t", "dim_id", st, out, 1L)
    val batch = graft.operators.AsOfJoin
      .asofBackward(allFacts, allDims, "k", "t", "t", "dim_id")
      .select("fact_id", "r_dim_value").collect()
      .map(r => r.getLong(0) -> Option(r.getString(1))).toMap
    assert(enrichedMap(out) === batch,
      "in-order stream enrichment must equal the batch as-of")
  }

  test("retry of a batch is idempotent; history cap bounds state and expires old versions") {
    val st = tmp("tj-retry-state"); val out = tmp("tj-retry-out")
    TemporalJoin.applyBatch(facts((1L, 15L, 300L)),
      dims((1L, 10L, 1L, "v1"), (1L, 12L, 2L, "v2")),
      "k", "t", "dim_id", st, out, 0L, historyPerKey = 2)
    val once = enrichedMap(out)
    // at-least-once redelivery of batch 0: recomputes from the same
    // (absent) predecessor and overwrites its own dirs
    TemporalJoin.applyBatch(facts((1L, 15L, 300L)),
      dims((1L, 10L, 1L, "v1"), (1L, 12L, 2L, "v2")),
      "k", "t", "dim_id", st, out, 0L, historyPerKey = 2)
    assert(enrichedMap(out) === once)
    // cap 2: v3 arrives in batch 1 — facts of THAT batch still see the
    // full visible history (enrich happens before the fold), then v1 is
    // evicted from the committed state for every later batch
    TemporalJoin.applyBatch(facts((1L, 11L, 301L)),
      dims((1L, 20L, 3L, "v3")),
      "k", "t", "dim_id", st, out, 1L, historyPerKey = 2)
    assert(enrichedMap(out)(301L) === Some("v1"),
      "the arrival batch still sees the pre-fold history")
    assert(spark.read.parquet(s"$st/v1").count() === 2, "state must stay capped")
    // batch 2: the same-time fact now sits below the retention horizon
    // (only v2@12, v3@20 survive) and matches null
    TemporalJoin.applyBatch(facts((1L, 11L, 302L)), dims(),
      "k", "t", "dim_id", st, out, 2L, historyPerKey = 2)
    assert(enrichedMap(out)(302L) === None,
      "a fact below the retention horizon matches null")
  }

  test("time horizon: watermark eviction makes too-late facts match null; in-order facts unaffected") {
    val st = tmp("tj-hor-state"); val out = tmp("tj-hor-out")
    val hor = Some(20L)
    // batch 0: versions at t=10, t=30 -> frontier 30, horizon 20 keeps both
    TemporalJoin.applyBatch(
      facts((1L, 12L, 500L), (1L, 31L, 501L)),
      dims((1L, 10L, 1L, "v1"), (1L, 30L, 2L, "v2")),
      "k", "t", "dim_id", st, out, 0L, historyPerKey = 100, timeHorizon = hor)
    // batch 1: v3 at t=60 pushes the frontier; v1@10 and v2@30 fall below
    // 60-20=40 and are evicted from the committed state
    TemporalJoin.applyBatch(facts(), dims((1L, 60L, 3L, "v3")),
      "k", "t", "dim_id", st, out, 1L, historyPerKey = 100, timeHorizon = hor)
    assert(spark.read.parquet(s"$st/v1").select("dim_value")
      .collect().map(_.getString(0)).toSet === Set("v3"),
      "versions below the watermark must be evicted")
    // batch 2: a fact at t=35 is older than every retained version -> null
    // (the Flink contract: below-watermark versions are unmatchable); a
    // fact at t=61 sees v3
    TemporalJoin.applyBatch(facts((1L, 35L, 502L), (1L, 61L, 503L)), dims(),
      "k", "t", "dim_id", st, out, 2L, historyPerKey = 100, timeHorizon = hor)
    assert(enrichedMap(out) === Map(
      500L -> Some("v1"), 501L -> Some("v2"),
      502L -> None, 503L -> Some("v3")))
  }

  test("time horizon bounds state under a bursty key; in-order stream still equals batch as-of") {
    val st = tmp("tj-burst-state"); val out = tmp("tj-burst-out")
    // 50 versions of one key, 5 apart; horizon 30 keeps only versions
    // within 30 of the newest — state is bounded by the horizon window,
    // not the version count
    val burst = (1 to 50).map(i => (1L, i * 5L, i.toLong, s"v$i"))
    TemporalJoin.applyBatch(facts(), dims(burst: _*),
      "k", "t", "dim_id", st, out, 0L, historyPerKey = 1000, timeHorizon = Some(30L))
    val kept = spark.read.parquet(s"$st/v0").select("t")
      .collect().map(_.getLong(0)).sorted
    assert(kept.forall(_ >= 250L - 30L) && kept.length === 7,
      s"horizon must bound the burst: kept ${kept.mkString(",")}")
    // facts within the retained window agree with the batch as-of over
    // the full history (in-order equality where retention is invisible)
    TemporalJoin.applyBatch(facts((1L, 248L, 600L), (1L, 230L, 601L)), dims(),
      "k", "t", "dim_id", st, out, 1L, historyPerKey = 1000, timeHorizon = Some(30L))
    val batch = graft.operators.AsOfJoin.asofBackward(
      facts((1L, 248L, 600L), (1L, 230L, 601L)), dims(burst: _*),
      "k", "t", "t", "dim_id")
      .select("fact_id", "r_dim_value").collect()
      .map(r => r.getLong(0) -> Option(r.getString(1))).toMap
    val got = enrichedMap(out).filter(e => Set(600L, 601L)(e._1))
    assert(got === batch, "in-window facts must equal the batch as-of")
  }

  test("snapshot directory prunes itself to current + retry window") {
    val st = tmp("tj-prune-state"); val out = tmp("tj-prune-out")
    for (b <- 0L to 5L)
      TemporalJoin.applyBatch(facts((1L, b * 10L + 5L, 700L + b)),
        dims((1L, b * 10L, b, s"v$b")),
        "k", "t", "dim_id", st, out, b)
    val dirs = new java.io.File(st).list().filter(_.startsWith("v")).sorted
    assert(dirs.toSeq === Seq("v4", "v5"),
      s"snapshots must prune to predecessor + current, found ${dirs.mkString(",")}")
    // a retry of the newest batch still finds its predecessor
    TemporalJoin.applyBatch(facts((1L, 55L, 705L)),
      dims((1L, 50L, 5L, "v5")),
      "k", "t", "dim_id", st, out, 5L)
    assert(enrichedMap(out)(705L) === Some("v5"))
  }

  test("MemoryStream end-to-end: tagged union drives the sink batch-by-batch") {
    import spark.implicits._
    implicit val sc = spark.sqlContext
    val st = tmp("tj-ms-state"); val out = tmp("tj-ms-out")
    // tagged union schema: kind, k, t, fact_id, dim_id, dim_value
    val mem = MemoryStream[(String, Long, Long, Long, Long, String)]
    val tagged = mem.toDF()
      .toDF("kind", "k", "t", "fact_id", "dim_id", "dim_value")
    val q = TemporalJoin.enrichSink(tagged, "kind",
      factCols = Seq("k", "t", "fact_id"),
      dimCols = Seq("k", "t", "dim_id", "dim_value"),
      "k", "t", "dim_id", st, out,
      checkpointDir = Some(tmp("tj-ms-ckpt")))
    try {
      mem.addData(("dim", 1L, 10L, -1L, 1L, "v1"), ("fact", 1L, 15L, 400L, -1L, null))
      q.processAllAvailable()
      mem.addData(("dim", 1L, 20L, -1L, 2L, "v2"), ("fact", 1L, 25L, 401L, -1L, null))
      q.processAllAvailable()
    } finally q.stop()
    val m = enrichedMap(out)
    assert(m(400L) === Some("v1") && m(401L) === Some("v2"))
  }
}
