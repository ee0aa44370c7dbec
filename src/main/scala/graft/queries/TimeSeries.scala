package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables
import dsl._

/** Batch time-series over `events`: tumbling/sliding windows via the window()
  * generator (the same shape Structured Streaming uses — see
  * graft.streaming.EventStreams), and gap-based sessionization via
  * lag + cumulative sum (one shuffle on user_id, streaming-friendly state).
  */
object TimeSeries {

  private val GapUs = 30L * 60 * 1000000 // 30-minute session gap, microseconds

  /** Gap-based sessionization over an events-shaped frame (ts, user_id,
    * event_id). New session iff gap strictly greater than 30 min — the same
    * boundary as streaming session_window, whose end-touching sessions MERGE
    * (an event exactly 30:00 after its predecessor stays in the session;
    * verified empirically at the boundary in EventStreamsSuite). */
  def sessionize(events: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    val wo = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
    val wc = wo.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    events
      .withColumn("us", unix_micros(col("ts")))
      .withColumn("new_sess",
        when(col("us") - lag(col("us"), 1).over(wo) > GapUs, 1)
          .when(lag(col("us"), 1).over(wo).isNull, 1)
          .otherwise(0))
      .withColumn("session_id", sum(col("new_sess")).over(wc))
      .groupBy("user_id", "session_id")
      .agg(count(lit(1)).as("n_events"),
        (max(col("us")) - min(col("us"))).as("duration_us"))
      .orderBy("user_id", "session_id")
  }

  val queries: Map[String, Q] = Map(

    "q_ts_tumbling" -> ((s, d) => Tables(s, d, "events")
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"), moneySum(col("value")).as("sum_value"))
      .select(tstr(col("w.start")).as("hour"), col("event_type"), col("n"), col("sum_value"))
      .orderBy("hour", "event_type")),

    // Oracle since round 5: each event of a 1h-window/30min-slide belongs
    // to EXACTLY the two windows starting at slide_floor(ts) and
    // slide_floor(ts) - 30min, so DuckDB emulates the generator with an
    // UNNEST([0,1]) per event — no brittle window arithmetic left.
    "q_ts_sliding" -> ((s, d) => Tables(s, d, "events")
      .groupBy(window(col("ts"), "1 hour", "30 minutes").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(tstr(col("w.start")).as("wstart"), tstr(col("w.end")).as("wend"),
        col("event_type"), col("n"))
      .orderBy("wstart", "event_type")),

    "q_ts_sessionize_batch" -> ((s, d) => sessionize(Tables(s, d, "events"))),

    // Batch replay of the streaming CDC upsert sink (streaming.
    // EventStreams.applyCdcBatch): the events table arrives as THREE
    // deterministic micro-batches (batch b = events with event_id % 3 = b,
    // applied in id order), each batch merging its per-user (ts, event_id)
    // argmax into a versioned parquet snapshot directory; the query
    // returns the final committed snapshot. EventStreamsSuite proves the
    // sink is batch-split invariant and retry-idempotent, so this replay
    // IS the streaming result — and the DuckDB argmax oracle makes the
    // streaming module driver-visible instead of suite-only. Timestamps
    // travel as epoch micros (the snapshot's own storage precision).
    "q_cdc_snapshot" -> ((s, d) => {
      import s.implicits._
      val ev = Tables(s, d, "events")
        .select(col("event_id"), col("ts"), col("user_id"), col("event_type"), col("value"))
        .as[graft.streaming.EventStreams.Event]
      // deterministic per-(session, corpus) dir: replays overwrite the same
      // three v<id> snapshot versions instead of leaking a directory per
      // invocation (Bench runs this 3+ times per bench)
      val stateDir = graft.operators.Scratch.dir(
        "graft-cdc-replay", s.sparkContext.applicationId, d)
      (0L to 2L).foreach { b =>
        graft.streaming.EventStreams.applyCdcBatch(
          ev.filter(col("event_id") % 3 === b), stateDir, b)
      }
      graft.streaming.EventStreams.cdcSnapshot(s, stateDir)
        .select(col("user_id"), unix_micros(col("ts")).as("ts_us"),
          col("event_id"), col("value"))
        .orderBy("user_id")
    }),

    // Resample + gap-fill: per-user hourly grid from the user's first to
    // last observed hour, LOCF (last observation carried forward) of the
    // rounded hourly mean. The grid is generator arithmetic (sequence ->
    // explode, map-side); the fill is ONE running window per user — the
    // standard time-series densification a feature pipeline runs before
    // fixed-step models. Scale: output is sum of per-user spans; the only
    // shuffles are the hourly agg and the per-user window, both on
    // user_id. LOCF carries the ALREADY-ROUNDED dmean, so no float op
    // happens after the fill — engines can't drift.
    "q_ts_resample" -> ((s, d) => {
      val hourly = Tables(s, d, "events")
        .select(col("user_id"), date_trunc("hour", col("ts")).as("hour"), col("value"))
        .groupBy("user_id", "hour").agg(dmean(col("value")).as("v"))
      val grid = hourly.groupBy("user_id")
        .agg(min("hour").as("h0"), max("hour").as("h1"))
        .select(col("user_id"),
          explode(sequence(col("h0"), col("h1"), expr("interval 1 hour"))).as("hour"))
      val w = Window.partitionBy("user_id").orderBy("hour")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      grid.join(hourly, Seq("user_id", "hour"), "left_outer")
        .withColumn("v_filled", last(col("v"), ignoreNulls = true).over(w))
        .withColumn("is_gap", col("v").isNull.cast("long"))
        .select(col("user_id"), tstr(col("hour")).as("hour"),
          col("v_filled"), col("is_gap"))
        .orderBy("user_id", "hour")
    }),

    // Linear-interpolation gap fill — the resample twin for quantities
    // where LOCF is wrong (sensor readings, prices between trades): each
    // missing grid hour takes prev + (next - prev) * elapsed/span from the
    // bracketing OBSERVED hours. The bracketing values/hours are two
    // running windows per user (one forward, one backward-looking frame),
    // so the plan shape and scale story are identical to q_ts_resample.
    // Grid endpoints are observed by construction (h0/h1 = min/max), so
    // every gap is interior and prev/next are always present. Float
    // parity: prev/next are the ALREADY-4dp-rounded hourly means, so a
    // half-span gap lands EXACTLY on the x.xxxx5 rounding boundary —
    // where Spark's round() (decimal-string HALF_UP) and DuckDB's round()
    // (binary) disagree by 1 ulp. The final rounding is therefore written
    // as floor(x*1e4 + 0.5)/1e4 — the same ieee754 ops in both engines,
    // bit-identical by construction at every value including boundaries.
    "q_ts_interp" -> ((s, d) => {
      val hourly = Tables(s, d, "events")
        .select(col("user_id"), date_trunc("hour", col("ts")).as("hour"), col("value"))
        .groupBy("user_id", "hour").agg(dmean(col("value")).as("v"))
      val grid = hourly.groupBy("user_id")
        .agg(min("hour").as("h0"), max("hour").as("h1"))
        .select(col("user_id"),
          explode(sequence(col("h0"), col("h1"), expr("interval 1 hour"))).as("hour"))
      val wPast = Window.partitionBy("user_id").orderBy("hour")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val wFut = Window.partitionBy("user_id").orderBy("hour")
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
      grid.join(hourly, Seq("user_id", "hour"), "left_outer")
        .withColumn("pv", last(col("v"), ignoreNulls = true).over(wPast))
        .withColumn("nv", first(col("v"), ignoreNulls = true).over(wFut))
        .withColumn("ph",
          last(when(col("v").isNotNull, col("hour")), ignoreNulls = true).over(wPast))
        .withColumn("nh",
          first(when(col("v").isNotNull, col("hour")), ignoreNulls = true).over(wFut))
        .withColumn("v_interp",
          when(col("v").isNotNull, col("v"))
            .otherwise(
              floor((col("pv") + (col("nv") - col("pv")) *
                ((unix_timestamp(col("hour")) - unix_timestamp(col("ph"))).cast("double") /
                  (unix_timestamp(col("nh")) - unix_timestamp(col("ph")))))
                * 10000.0 + 0.5) / 10000.0))
        .withColumn("is_gap", col("v").isNull.cast("long"))
        .select(col("user_id"), tstr(col("hour")).as("hour"),
          col("v_interp"), col("is_gap"))
        .orderBy("user_id", "hour")
    }),

    // Ordered funnel (view -> click -> purchase): a user converts a step
    // only if it happens STRICTLY AFTER their first qualifying previous
    // step — the product-analytics query every event pipeline ships.
    // Three conditional min-aggregations over one scan + one shuffle on
    // user_id; no self-joins (the naive k-way join form shuffles the
    // events table once per step).
    "q_ts_funnel" -> ((s, d) => {
      val e = Tables(s, d, "events")
        .select(col("user_id"), col("event_type"), unix_micros(col("ts")).as("us"))
      val perUser = e.groupBy("user_id").agg(
        min(when(col("event_type") === "view", col("us"))).as("v_us"))
      val withC = e.join(perUser, "user_id")
        .groupBy("user_id").agg(
          first(col("v_us")).as("v_us"),
          min(when(col("event_type") === "click" && col("us") > col("v_us"),
            col("us"))).as("c_us"))
      val withP = e.join(withC, "user_id")
        .groupBy("user_id").agg(
          first(col("v_us")).as("v_us"), first(col("c_us")).as("c_us"),
          min(when(col("event_type") === "purchase" && col("us") > col("c_us"),
            col("us"))).as("p_us"))
      withP.agg(
        count(lit(1)).as("n_users"),
        sum(when(col("v_us").isNotNull, 1L).otherwise(0L)).as("step_view"),
        sum(when(col("c_us").isNotNull, 1L).otherwise(0L)).as("step_click"),
        sum(when(col("p_us").isNotNull, 1L).otherwise(0L)).as("step_purchase"))
    }),

    // Rolling z-score anomaly ranking: each event scored against its
    // user's trailing 20-event window (exact decimal moment sums — the
    // q_agg_stats discipline, with its documented precondition: moments
    // must stay inside double's exact range, true for this value scale;
    // money/latency-magnitude metrics would widen the final rounding
    // instead), top-20 by rounded |z|. Flatlined windows (variance <= 0,
    // including tiny negative cancellation residue) are filtered BEFORE
    // the sqrt/divide: Spark would yield NaN/Inf where DuckDB yields NULL
    // division or a hard sqrt out-of-range error — the one place the two
    // engines genuinely disagree. A monitoring pass over quality metrics
    // is exactly this query at 100 TB: one user_id shuffle, one running
    // window, distributed top-k.
    "q_ts_anomaly" -> ((s, d) => {
      val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
        .rowsBetween(-19, Window.currentRow)
      val x = col("value").cast("decimal(18,4)")
      val scored = Tables(s, d, "events")
        .select(col("event_id"), col("user_id"), col("ts"), col("value"))
        .withColumn("n", count(lit(1)).over(w))
        .withColumn("sx", sum(x).over(w).cast("double"))
        .withColumn("sxx", sum(x * x).over(w).cast("double"))
        .filter(col("n") === 20) // full windows only
        .withColumn("mean", col("sx") / col("n"))
        .withColumn("variance",
          (col("sxx") - col("sx") * col("sx") / col("n")) / (col("n") - 1))
        .filter(col("variance") > 0)
        .withColumn("z", round((col("value") - col("mean")) / sqrt(col("variance")), 4))
      val wr = Window.orderBy(abs(col("z")).desc, col("event_id"))
      scored.orderBy(abs(col("z")).desc, col("event_id")).limit(20)
        .withColumn("rank", row_number().over(wr))
        .select(col("rank"), col("event_id"), col("user_id"), col("z"))
        .orderBy("rank")
    }),

    // SCD Type-2 history: collapse each customer's order-status timeline
    // into validity intervals — one row per status CHANGE with
    // [valid_from, valid_to) bounds (open current interval = null). Two
    // per-key windows (change detection via lag, interval close via lead
    // on the change rows); the dimension-table versioning move every
    // warehouse refresh performs.
    "q_scd2" -> ((s, d) => {
      val wo = Window.partitionBy("o_custkey").orderBy(col("o_orderdate"), col("o_orderkey"))
      val changes = Tables(s, d, "orders")
        .select(col("o_custkey"), col("o_orderstatus"), col("o_orderdate"), col("o_orderkey"))
        .withColumn("prev", lag(col("o_orderstatus"), 1).over(wo))
        .filter(col("prev").isNull || col("prev") =!= col("o_orderstatus"))
      val wc = Window.partitionBy("o_custkey").orderBy(col("o_orderdate"), col("o_orderkey"))
      changes
        .withColumn("valid_to", lead(col("o_orderdate"), 1).over(wc))
        // the change row's orderkey is the unique tiebreak: several status
        // flips can share one (custkey, date) and row order must not be
        // engine-dependent
        .select(col("o_custkey"), col("o_orderkey").as("change_id"),
          col("o_orderstatus").as("status"),
          dstr(col("o_orderdate")).as("valid_from"), dstr(col("valid_to")).as("valid_to"))
        .orderBy("o_custkey", "valid_from", "change_id")
    }),

    // Cohort retention: users grouped by their first-activity DAY, then
    // distinct-active-user counts at each day offset — the engagement
    // matrix behind every retention curve. One pass for cohorts (min-ts
    // agg), one equi join back, one distinct-count agg; all shuffles on
    // user_id / (cohort, offset).
    "q_ts_retention" -> ((s, d) => {
      val e = Tables(s, d, "events")
        .select(col("user_id"), to_date(col("ts")).as("day"))
      val cohort = e.groupBy("user_id").agg(min("day").as("cohort_day"))
      e.join(cohort, "user_id")
        .select(col("user_id"), col("cohort_day"),
          datediff(col("day"), col("cohort_day")).cast("long").as("offset_days"))
        .groupBy("cohort_day", "offset_days")
        .agg(countDistinct(col("user_id")).as("active_users"))
        .select(dstr(col("cohort_day")).as("cohort_day"), col("offset_days"),
          col("active_users"))
        .orderBy("cohort_day", "offset_days")
    }),

    // OHLC downsampling: per (day, event_type) open/high/low/close of
    // `value` — the market-data candle / metrics-rollup shape. open/close
    // are positional (first/last by (ts, event_id)) so they ride a full-
    // frame window over the SAME keys the groupBy uses: one shuffle total,
    // and the window state per key is O(1). Values are carried doubles
    // (no float arithmetic), so parity is exact without rounding.
    "q_ts_ohlc" -> ((s, d) => {
      val wf = Window.partitionBy("day", "event_type")
        .orderBy(col("us"), col("event_id"))
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
      Tables(s, d, "events")
        .select(to_date(col("ts")).as("day"), col("event_type"),
          unix_micros(col("ts")).as("us"), col("event_id"), col("value"))
        .withColumn("open", first(col("value")).over(wf))
        .withColumn("close", last(col("value")).over(wf))
        .groupBy("day", "event_type")
        .agg(min(col("open")).as("open"), max(col("value")).as("high"),
          min(col("value")).as("low"), min(col("close")).as("close"),
          count(lit(1)).as("n"))
        .select(dstr(col("day")).as("day"), col("event_type"),
          col("open"), col("high"), col("low"), col("close"), col("n"))
        .orderBy("day", "event_type")
    }),

    // Exponentially weighted moving average over the trailing 8 events per
    // user (decay 0.5, weights normalized). Written as an explicit lag
    // chain rather than a recursive state column: every term is
    // whole-stage-codegen'd, the window shuffles once on user_id, and the
    // 0.5^i weights are exact powers of two, so multiply-and-left-
    // associated-add is the SAME ieee754 sequence in both engines —
    // bit-identical before the belt-and-braces round(4). Full windows
    // only (rn >= 8), mirroring q_ts_anomaly's discipline.
    "q_ts_ewma" -> ((s, d) => {
      val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
      val num = (0 until 8)
        .map(i => lag(col("value"), i).over(w) * lit(math.pow(0.5, i)))
        .reduceLeft(_ + _)
      val den = (0 until 8).map(math.pow(0.5, _)).sum // 1.9921875, exact
      Tables(s, d, "events")
        .select(col("event_id"), col("user_id"), col("ts"), col("value"))
        .withColumn("rn", row_number().over(w))
        .withColumn("ewma_raw", num)
        .filter(col("rn") >= 8)
        .select(col("event_id"), col("user_id"),
          round(col("ewma_raw") / lit(den), 4).as("ewma"))
        .orderBy("event_id")
    }),

    // VWAP: per (day, event_type) volume-weighted mean of `value` with
    // props.k as the volume. Both factors are exact in DECIMAL (value is
    // 2-dp, k integral), so the weighted sums are order-independent and
    // one double divide at the end is bit-identical in both engines. One
    // partial-combining shuffle on the (day, type) key — the canonical
    // market-bar / metrics-rollup shape at any scale.
    "q_ts_vwap" -> ((s, d) => Tables(s, d, "events")
      .select(to_date(col("ts")).as("day"), col("event_type"),
        col("value").cast("decimal(18,4)").as("px"),
        get_json_object(col("props"), "$.k").cast("decimal(18,0)").as("qty"))
      .filter(col("qty") > 0)
      .groupBy("day", "event_type")
      .agg(sum(col("px") * col("qty")).as("pv"), sum(col("qty")).as("v"),
        count(lit(1)).as("n"))
      .select(dstr(col("day")).as("day"), col("event_type"),
        round(col("pv").cast("double") / col("v").cast("double"), 4).as("vwap"),
        col("n"))
      .orderBy("day", "event_type")),

    // Cumulative distinct users per day — the growth-dashboard staple.
    // Distinctness is rewritten as "first-seen day per user" (one hash agg
    // keyed by user), so no day ever re-scans history; the running total
    // is a window over the per-day NEW-user counts, whose input is O(#days)
    // rows — a partition-less window over a frame that small is fine at
    // any corpus scale.
    "q_ts_cum_distinct" -> ((s, d) => {
      val firstSeen = Tables(s, d, "events")
        .groupBy("user_id").agg(min(to_date(col("ts"))).as("day"))
      val w = Window.orderBy("day")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      firstSeen.groupBy("day").agg(count(lit(1)).as("new_users"))
        .withColumn("cum_users", sum(col("new_users")).over(w))
        .select(dstr(col("day")).as("day"), col("new_users"), col("cum_users"))
        .orderBy("day")
    }),

    // Last-touch attribution: each purchase credits the user's most recent
    // preceding touch event (click/view/signup); purchases with no prior
    // touch are 'direct'. ONE user-partitioned window (last ignoreNulls
    // over unbounded..-1 preceding) — the same single shuffle any
    // per-user sessionization pays, then a 5-row channel rollup. The
    // (ts, event_id) order is a total order, so the credited touch is
    // deterministic under any partitioning.
    "q_ts_attribution" -> ((s, d) => {
      val wo = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
        .rowsBetween(Window.unboundedPreceding, -1)
      Tables(s, d, "events")
        .withColumn("touch",
          when(col("event_type").isin("click", "view", "signup"), col("event_type")))
        .withColumn("last_touch", last(col("touch"), ignoreNulls = true).over(wo))
        .filter(col("event_type") === "purchase")
        .select(coalesce(col("last_touch"), lit("direct")).as("channel"), col("user_id"))
        .groupBy("channel")
        .agg(count(lit(1)).as("n_purchases"),
          countDistinct("user_id").as("n_users"))
        .orderBy("channel")
    }),

    // Inter-event gap statistics per user — the arrival-process profile
    // (bot detection, engagement scoring). Gaps are integral microsecond
    // lag-diffs, so the sums are exact and the only doubles are the final
    // divides. One user window + one user agg sharing the same key.
    // LTTB-style visualization downsampling (largest-triangle-three-
    // buckets, the parallel mean-anchor variant every TSDB ships for
    // dashboard rendering): per (event_type, 6h bucket), keep the ONE
    // point whose triangle against the NEIGHBOR BUCKETS' centroids has
    // maximum area; edge buckets keep their extreme point (true LTTB
    // anchors the raw endpoints). Sequential LTTB chains on the
    // previously SELECTED point — unparallelizable; anchoring on bucket
    // centroids makes every bucket independent: one centroid aggregate,
    // one tiny lag/lead window over ~|buckets| rows, one argmax
    // aggregate — all partitioned by event_type, no corpus-scale window.
    // Centroids are exact (long ts sums, decimal value sums), the area
    // algebra is the identical IEEE expression in both engines, and ties
    // break on min event_id, so the DuckDB rank-window oracle
    // hash-matches the struct-max argmax.
    "q_ts_lttb" -> ((s, d) => {
      val bucketUs = 6L * 3600 * 1000000L
      val e = Tables(s, d, "events")
        .select(col("event_id"), col("event_type"), col("value"),
          unix_micros(col("ts")).as("us"))
        .withColumn("bkt", expr(s"us DIV $bucketUs"))
      val cent = e.groupBy("event_type", "bkt")
        .agg(count(lit(1)).as("n"), sum(col("us")).as("sus"),
          sum(col("value").cast("decimal(22,6)")).as("sval"))
        .select(col("event_type"), col("bkt"),
          (col("sus").cast("double") / col("n")).as("cx"),
          (col("sval").cast("double") / col("n")).as("cy"))
      val w = Window.partitionBy("event_type").orderBy("bkt")
      val nb = cent
        .withColumn("px", lag("cx", 1).over(w)).withColumn("py", lag("cy", 1).over(w))
        .withColumn("nx", lead("cx", 1).over(w)).withColumn("ny", lead("cy", 1).over(w))
      val x = col("us").cast("double")
      val area = abs((col("px") - col("nx")) * (col("value") - col("py")) -
        (col("px") - x) * (col("ny") - col("py")))
      e.join(nb, Seq("event_type", "bkt"))
        .withColumn("score",
          when(col("px").isNull, -x).when(col("nx").isNull, x).otherwise(area))
        .groupBy("event_type", "bkt")
        .agg(max(struct(col("score"), (-col("event_id")).as("nid"),
          col("us"), col("value"))).as("m"))
        .select(col("event_type"),
          tstr(timestamp_micros(col("bkt") * bucketUs)).as("bucket_start"),
          (-col("m.nid")).as("event_id"),
          tstr(timestamp_micros(col("m.us"))).as("ts"),
          col("m.value").as("value"))
        .orderBy("event_type", "bucket_start")
    }),

    "q_ts_gap_stats" -> ((s, d) => {
      val wo = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
      Tables(s, d, "events")
        .withColumn("us", unix_micros(col("ts")))
        .withColumn("gap_us", col("us") - lag(col("us"), 1).over(wo))
        .filter(col("gap_us").isNotNull)
        .groupBy("user_id")
        .agg(count(lit(1)).as("n_gaps"),
          sum("gap_us").as("sum_us"),
          max("gap_us").as("max_us"),
          min("gap_us").as("min_us"))
        .select(col("user_id"), col("n_gaps"),
          round(col("sum_us").cast("double") / col("n_gaps") / lit(1e6), 4).as("avg_gap_s"),
          round(col("max_us").cast("double") / lit(1e6), 4).as("max_gap_s"),
          round(col("min_us").cast("double") / lit(1e6), 4).as("min_gap_s"))
        .orderBy("user_id")
    }),

    // Hourly event rate with share-of-hour per type: one (hour, type) hash
    // agg, then the share window rides the already-tiny (hour, type) frame
    // partitioned by hour — never the raw events. The integer/integer
    // divide is the only double.
    "q_ts_rate" -> ((s, d) => {
      val wh = Window.partitionBy("hour")
      Tables(s, d, "events")
        .groupBy(date_trunc("hour", col("ts")).as("hour"), col("event_type"))
        .agg(count(lit(1)).as("n"))
        .withColumn("share",
          round(col("n").cast("double") / sum(col("n")).over(wh), 4))
        .select(tstr(col("hour")).as("hour"), col("event_type"), col("n"), col("share"))
        .orderBy("hour", "event_type")
    }),

    // Day-of-week × hour-of-day activity heatmap — the load-profile rollup
    // behind every usage dashboard. 7×24 output keys, so the partial aggs
    // collapse map-side almost entirely; the mean goes through the exact
    // DECIMAL-sum contract. dow is ISO (1=Monday..7=Sunday) in both engines.
    "q_ts_heatmap" -> ((s, d) => Tables(s, d, "events")
      .select((weekday(col("ts")) + 1).cast("long").as("dow"),
        hour(col("ts")).cast("long").as("hod"), col("value"))
      .groupBy("dow", "hod")
      .agg(count(lit(1)).as("n"), dmean(col("value")).as("avg_value"))
      .orderBy("dow", "hod")),
  )

  val oracles: Map[String, String] = Map(
    // identical centroid/area algebra; rank window (score DESC, event_id)
    // = the Spark side's max(struct(score, -event_id)) tiebreak
    "q_ts_lttb" ->
      """WITH e AS (SELECT event_id, event_type, value,
        |                  epoch_us(CAST(ts AS TIMESTAMP)) AS us,
        |                  epoch_us(CAST(ts AS TIMESTAMP)) // 21600000000 AS bkt
        |           FROM events),
        |cent AS (SELECT event_type, bkt,
        |                CAST(SUM(us) AS DOUBLE) / COUNT(*) AS cx,
        |                CAST(SUM(CAST(value AS DECIMAL(22,6))) AS DOUBLE) / COUNT(*) AS cy
        |         FROM e GROUP BY 1, 2),
        |nb AS (SELECT event_type, bkt,
        |              lag(cx) OVER (PARTITION BY event_type ORDER BY bkt) AS px,
        |              lag(cy) OVER (PARTITION BY event_type ORDER BY bkt) AS py,
        |              lead(cx) OVER (PARTITION BY event_type ORDER BY bkt) AS nx,
        |              lead(cy) OVER (PARTITION BY event_type ORDER BY bkt) AS ny
        |       FROM cent),
        |scored AS (SELECT e.event_type, e.bkt, e.event_id, e.us, e.value,
        |                  CASE WHEN px IS NULL THEN -CAST(e.us AS DOUBLE)
        |                       WHEN nx IS NULL THEN CAST(e.us AS DOUBLE)
        |                       ELSE ABS((px - nx) * (e.value - py)
        |                                - (px - CAST(e.us AS DOUBLE)) * (ny - py))
        |                  END AS score
        |           FROM e JOIN nb USING (event_type, bkt)),
        |ranked AS (SELECT *, row_number() OVER (PARTITION BY event_type, bkt
        |                                        ORDER BY score DESC, event_id) AS rn
        |           FROM scored)
        |SELECT event_type,
        |       strftime(make_timestamp(bkt * 21600000000), '%Y-%m-%d %H:%M:%S') AS bucket_start,
        |       event_id,
        |       strftime(make_timestamp(us), '%Y-%m-%d %H:%M:%S') AS ts,
        |       value
        |FROM ranked WHERE rn = 1
        |ORDER BY event_type, bucket_start""".stripMargin,

    "q_ts_tumbling" ->
      """SELECT strftime(date_trunc('hour', CAST(ts AS TIMESTAMP)), '%Y-%m-%d %H:%M:%S') AS hour,
        |  event_type, count(*) AS n,
        |  CAST(SUM(CAST(value AS DECIMAL(22,6))) AS DOUBLE) AS sum_value
        |FROM events GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    "q_ts_sliding" ->
      """WITH e AS (SELECT epoch_us(CAST(ts AS TIMESTAMP)) AS us, event_type FROM events),
        |w AS (SELECT (us // 1800000000 - k) * 1800000000 AS ws_us, event_type
        |      FROM e, UNNEST([0, 1]) AS t(k))
        |SELECT strftime(make_timestamp(ws_us), '%Y-%m-%d %H:%M:%S') AS wstart,
        |       strftime(make_timestamp(ws_us + 3600000000), '%Y-%m-%d %H:%M:%S') AS wend,
        |       event_type, count(*) AS n
        |FROM w GROUP BY ws_us, event_type ORDER BY wstart, event_type""".stripMargin,

    "q_cdc_snapshot" ->
      """SELECT user_id, epoch_us(ts_us) AS ts_us, event_id, value
        |FROM (SELECT user_id, CAST(ts AS TIMESTAMP) AS ts_us, event_id, value,
        |        row_number() OVER (PARTITION BY user_id
        |                           ORDER BY CAST(ts AS TIMESTAMP) DESC, event_id DESC) AS rn
        |      FROM events)
        |WHERE rn = 1 ORDER BY user_id""".stripMargin,

    "q_ts_sessionize_batch" ->
      """WITH e AS (
        |  SELECT user_id, event_id, epoch_us(CAST(ts AS TIMESTAMP)) AS us FROM events
        |), flagged AS (
        |  SELECT user_id, event_id, us,
        |    CASE WHEN lag(us, 1) OVER w IS NULL THEN 1
        |         WHEN us - lag(us, 1) OVER w > 1800000000 THEN 1
        |         ELSE 0 END AS new_sess
        |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id)
        |), sess AS (
        |  SELECT user_id, us,
        |    CAST(SUM(new_sess) OVER (PARTITION BY user_id ORDER BY us, event_id
        |                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id
        |  FROM flagged
        |)
        |SELECT user_id, session_id, count(*) AS n_events,
        |       max(us) - min(us) AS duration_us
        |FROM sess GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    "q_ts_resample" ->
      s"""WITH hourly AS (
         |  SELECT user_id, date_trunc('hour', CAST(ts AS TIMESTAMP)) AS hour,
         |         ${sqlMean("value")} AS v
         |  FROM events GROUP BY 1, 2),
         |grid AS (
         |  SELECT user_id, unnest(generate_series(h0, h1, INTERVAL 1 HOUR)) AS hour
         |  FROM (SELECT user_id, min(hour) AS h0, max(hour) AS h1 FROM hourly GROUP BY 1)),
         |filled AS (
         |  SELECT g.user_id, g.hour, h.v,
         |         last_value(h.v IGNORE NULLS) OVER (
         |           PARTITION BY g.user_id ORDER BY g.hour
         |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS v_filled
         |  FROM grid g LEFT JOIN hourly h ON g.user_id = h.user_id AND g.hour = h.hour)
         |SELECT user_id, strftime(hour, '%Y-%m-%d %H:%M:%S') AS hour,
         |       v_filled, CAST(v IS NULL AS BIGINT) AS is_gap
         |FROM filled ORDER BY user_id, hour""".stripMargin,

    "q_ts_interp" ->
      s"""WITH hourly AS (
         |  SELECT user_id, date_trunc('hour', CAST(ts AS TIMESTAMP)) AS hour,
         |         ${sqlMean("value")} AS v
         |  FROM events GROUP BY 1, 2),
         |grid AS (
         |  SELECT user_id, unnest(generate_series(h0, h1, INTERVAL 1 HOUR)) AS hour
         |  FROM (SELECT user_id, min(hour) AS h0, max(hour) AS h1 FROM hourly GROUP BY 1)),
         |f AS (
         |  SELECT g.user_id, g.hour, h.v,
         |    last_value(h.v IGNORE NULLS) OVER wp AS pv,
         |    first_value(h.v IGNORE NULLS) OVER wf AS nv,
         |    last_value(CASE WHEN h.v IS NOT NULL THEN g.hour END IGNORE NULLS) OVER wp AS ph,
         |    first_value(CASE WHEN h.v IS NOT NULL THEN g.hour END IGNORE NULLS) OVER wf AS nh
         |  FROM grid g LEFT JOIN hourly h ON g.user_id = h.user_id AND g.hour = h.hour
         |  WINDOW wp AS (PARTITION BY g.user_id ORDER BY g.hour
         |                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
         |         wf AS (PARTITION BY g.user_id ORDER BY g.hour
         |                ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING))
         |SELECT user_id, strftime(hour, '%Y-%m-%d %H:%M:%S') AS hour,
         |  CASE WHEN v IS NOT NULL THEN v
         |       ELSE FLOOR((pv + (nv - pv) *
         |              (CAST(epoch(hour) - epoch(ph) AS DOUBLE) / (epoch(nh) - epoch(ph))))
         |              * 10000.0 + 0.5) / 10000.0
         |  END AS v_interp,
         |  CAST(v IS NULL AS BIGINT) AS is_gap
         |FROM f ORDER BY user_id, hour""".stripMargin,

    "q_ts_anomaly" ->
      """WITH scored AS (
        |  SELECT event_id, user_id, value,
        |    count(*) OVER w AS n,
        |    CAST(SUM(CAST(value AS DECIMAL(18,4))) OVER w AS DOUBLE) AS sx,
        |    CAST(SUM(CAST(value AS DECIMAL(18,4)) * CAST(value AS DECIMAL(18,4))) OVER w AS DOUBLE) AS sxx
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY CAST(ts AS TIMESTAMP), event_id
        |               ROWS BETWEEN 19 PRECEDING AND CURRENT ROW)),
        |v AS (
        |  SELECT event_id, user_id, value, sx, n,
        |         (sxx - sx * sx / n) / (n - 1) AS variance
        |  FROM scored WHERE n = 20),
        |z AS (
        |  SELECT event_id, user_id,
        |         ROUND((value - sx / n) / sqrt(variance), 4) AS z
        |  FROM v WHERE variance > 0)
        |SELECT rank, event_id, user_id, z FROM (
        |  SELECT event_id, user_id, z,
        |         row_number() OVER (ORDER BY abs(z) DESC, event_id) AS rank
        |  FROM z)
        |WHERE rank <= 20 ORDER BY rank""".stripMargin,

    "q_scd2" ->
      """WITH changes AS (
        |  SELECT o_custkey, o_orderkey, o_orderstatus, o_orderdate
        |  FROM (
        |    SELECT o_custkey, o_orderkey, o_orderstatus, o_orderdate,
        |           lag(o_orderstatus, 1) OVER w AS prev
        |    FROM orders
        |    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey))
        |  WHERE prev IS NULL OR prev <> o_orderstatus)
        |SELECT o_custkey, o_orderkey AS change_id, o_orderstatus AS status,
        |       strftime(o_orderdate, '%Y-%m-%d') AS valid_from,
        |       strftime(lead(o_orderdate, 1) OVER w2, '%Y-%m-%d') AS valid_to
        |FROM changes
        |WINDOW w2 AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
        |ORDER BY o_custkey, valid_from, change_id""".stripMargin,

    "q_ts_funnel" ->
      """WITH e AS (SELECT user_id, event_type, epoch_us(CAST(ts AS TIMESTAMP)) AS us FROM events),
        |v AS (SELECT user_id, min(CASE WHEN event_type = 'view' THEN us END) AS v_us
        |      FROM e GROUP BY 1),
        |c AS (SELECT e.user_id, min(v.v_us) AS v_us,
        |             min(CASE WHEN e.event_type = 'click' AND e.us > v.v_us THEN e.us END) AS c_us
        |      FROM e JOIN v USING (user_id) GROUP BY 1),
        |p AS (SELECT e.user_id, min(c.v_us) AS v_us, min(c.c_us) AS c_us,
        |             min(CASE WHEN e.event_type = 'purchase' AND e.us > c.c_us THEN e.us END) AS p_us
        |      FROM e JOIN c USING (user_id) GROUP BY 1)
        |SELECT count(*) AS n_users,
        |  CAST(SUM(CASE WHEN v_us IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS step_view,
        |  CAST(SUM(CASE WHEN c_us IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS step_click,
        |  CAST(SUM(CASE WHEN p_us IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS step_purchase
        |FROM p""".stripMargin,

    "q_ts_retention" ->
      """WITH e AS (SELECT user_id, CAST(CAST(ts AS TIMESTAMP) AS DATE) AS day FROM events),
        |cohort AS (SELECT user_id, min(day) AS cohort_day FROM e GROUP BY 1),
        |m AS (SELECT e.user_id, c.cohort_day,
        |             CAST(e.day - c.cohort_day AS BIGINT) AS offset_days
        |      FROM e JOIN cohort c USING (user_id))
        |SELECT strftime(cohort_day, '%Y-%m-%d') AS cohort_day, offset_days,
        |       count(DISTINCT user_id) AS active_users
        |FROM m GROUP BY m.cohort_day, offset_days
        |ORDER BY 1, 2""".stripMargin,

    "q_ts_ohlc" ->
      """WITH e AS (
        |  SELECT CAST(CAST(ts AS TIMESTAMP) AS DATE) AS day, event_type,
        |         epoch_us(CAST(ts AS TIMESTAMP)) AS us, event_id, value
        |  FROM events),
        |w AS (
        |  SELECT day, event_type, value,
        |         first_value(value) OVER wf AS open,
        |         last_value(value) OVER wf AS close
        |  FROM e
        |  WINDOW wf AS (PARTITION BY day, event_type ORDER BY us, event_id
        |                ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING))
        |SELECT strftime(day, '%Y-%m-%d') AS day, event_type,
        |       min(open) AS open, max(value) AS high, min(value) AS low,
        |       min(close) AS close, count(*) AS n
        |FROM w GROUP BY day, event_type ORDER BY 1, 2""".stripMargin,

    "q_ts_ewma" ->
      """SELECT event_id, user_id, ROUND(num / 1.9921875, 4) AS ewma FROM (
        |  SELECT event_id, user_id,
        |    row_number() OVER w AS rn,
        |    value * 1.0 + lag(value, 1) OVER w * 0.5
        |      + lag(value, 2) OVER w * 0.25 + lag(value, 3) OVER w * 0.125
        |      + lag(value, 4) OVER w * 0.0625 + lag(value, 5) OVER w * 0.03125
        |      + lag(value, 6) OVER w * 0.015625 + lag(value, 7) OVER w * 0.0078125
        |      AS num
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY CAST(ts AS TIMESTAMP), event_id))
        |WHERE rn >= 8 ORDER BY event_id""".stripMargin,

    "q_ts_vwap" ->
      """SELECT strftime(day, '%Y-%m-%d') AS day, event_type,
        |       ROUND(CAST(sum(px * qty) AS DOUBLE) / CAST(sum(qty) AS DOUBLE), 4) AS vwap,
        |       count(*) AS n
        |FROM (
        |  SELECT CAST(CAST(ts AS TIMESTAMP) AS DATE) AS day, event_type,
        |         CAST(value AS DECIMAL(18,4)) AS px,
        |         CAST(json_extract_string(props, '$.k') AS DECIMAL(18,0)) AS qty
        |  FROM events)
        |WHERE qty > 0
        |GROUP BY day, event_type ORDER BY 1, 2""".stripMargin,

    "q_ts_cum_distinct" ->
      """WITH f AS (SELECT user_id, min(CAST(CAST(ts AS TIMESTAMP) AS DATE)) AS day
        |           FROM events GROUP BY user_id),
        |n AS (SELECT day, count(*) AS new_users FROM f GROUP BY day)
        |SELECT strftime(day, '%Y-%m-%d') AS day, new_users,
        |       CAST(sum(new_users) OVER (ORDER BY day
        |         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_users
        |FROM n ORDER BY day""".stripMargin,

    "q_ts_attribution" ->
      """WITH e AS (SELECT user_id, event_type, CAST(ts AS TIMESTAMP) AS t, event_id,
        |                  CASE WHEN event_type IN ('click','view','signup')
        |                       THEN event_type END AS touch
        |           FROM events),
        |a AS (SELECT event_type, user_id,
        |             last_value(touch IGNORE NULLS) OVER (
        |               PARTITION BY user_id ORDER BY t, event_id
        |               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS last_touch
        |      FROM e)
        |SELECT COALESCE(last_touch, 'direct') AS channel,
        |       count(*) AS n_purchases, count(DISTINCT user_id) AS n_users
        |FROM a WHERE event_type = 'purchase'
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    "q_ts_gap_stats" ->
      """WITH g AS (SELECT user_id,
        |                  epoch_us(CAST(ts AS TIMESTAMP))
        |                    - lag(epoch_us(CAST(ts AS TIMESTAMP))) OVER (
        |                        PARTITION BY user_id
        |                        ORDER BY CAST(ts AS TIMESTAMP), event_id) AS gap_us
        |           FROM events)
        |SELECT user_id, count(*) AS n_gaps,
        |       ROUND(CAST(sum(gap_us) AS DOUBLE) / count(*) / 1e6, 4) AS avg_gap_s,
        |       ROUND(CAST(max(gap_us) AS DOUBLE) / 1e6, 4) AS max_gap_s,
        |       ROUND(CAST(min(gap_us) AS DOUBLE) / 1e6, 4) AS min_gap_s
        |FROM g WHERE gap_us IS NOT NULL
        |GROUP BY user_id ORDER BY user_id""".stripMargin,

    "q_ts_rate" ->
      """WITH h AS (SELECT date_trunc('hour', CAST(ts AS TIMESTAMP)) AS hour,
        |                  event_type, count(*) AS n
        |           FROM events GROUP BY 1, 2)
        |SELECT strftime(hour, '%Y-%m-%d %H:%M:%S') AS hour, event_type, n,
        |       ROUND(CAST(n AS DOUBLE) / sum(n) OVER (PARTITION BY hour), 4) AS share
        |FROM h ORDER BY 1, 2""".stripMargin,

    "q_ts_heatmap" ->
      s"""SELECT isodow(CAST(ts AS TIMESTAMP)) AS dow,
         |       CAST(hour(CAST(ts AS TIMESTAMP)) AS BIGINT) AS hod,
         |       count(*) AS n, ${sqlMean("value")} AS avg_value
         |FROM events GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
  )
}
