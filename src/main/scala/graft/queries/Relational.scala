package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables
import dsl._

/** Scans, filters, joins, aggregations, sorts and set operations.
  *
  * Spark-first notes (100 TB design intent, verified on .explain):
  *  - dim joins (region/nation/customer-sized) are explicitly broadcast;
  *    fact-fact joins shuffle on their equi keys and stay sort-merge, with
  *    AQE free to re-plan at runtime.
  *  - filters/projections are plain Column expressions so Catalyst pushes
  *    them into the parquet scan (PushedFilters / pruned ReadSchema).
  *  - aggregates are hash aggregates with partial (map-side) combine; sums
  *    use integer-exact DECIMAL accumulation (see [[dsl.moneySum]]) which is
  *    also what makes them deterministic under any partitioning.
  */
object Relational {

  val queries: Map[String, Q] = Map(

    // ---- scans ----------------------------------------------------------
    "q_scan_project" -> ((s, d) => Tables(s, d, "lineitem")
      .select("l_orderkey", "l_linenumber", "l_quantity", "l_returnflag")
      .orderBy("l_orderkey", "l_linenumber")),

    "q_scan_pruned" -> ((s, d) => Tables(s, d, "lineitem")
      .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1997-01-01").cast("timestamp"))
      .select(col("l_orderkey"), col("l_linenumber"), dstr(col("l_shipdate")).as("ship"),
        col("l_quantity"))
      .orderBy("l_orderkey", "l_linenumber")),

    // ---- filters / predicates ------------------------------------------
    "q_filter_compound" -> ((s, d) => Tables(s, d, "lineitem")
      .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1997-01-01").cast("timestamp") &&
        col("l_discount").between(0.05, 0.07) && col("l_quantity") < 24)
      .agg(moneySum(col("l_extendedprice") * col("l_discount")).as("revenue"))),

    "q_case_when" -> ((s, d) => Tables(s, d, "orders")
      .select(when(col("o_totalprice") < 100000, "low")
        .when(col("o_totalprice") < 300000, "mid")
        .otherwise("high").as("tier"))
      .groupBy("tier").agg(count(lit(1)).as("n"))
      .orderBy("tier")),

    // ---- joins ----------------------------------------------------------
    "q_join_broadcast" -> ((s, d) => Tables(s, d, "nation")
      .join(broadcast(Tables(s, d, "region")), col("n_regionkey") === col("r_regionkey"))
      .select("n_nationkey", "n_name", "r_name")
      .orderBy("n_nationkey")),

    "q_join_shuffle" -> ((s, d) => Tables(s, d, "lineitem")
      .join(Tables(s, d, "orders"), col("l_orderkey") === col("o_orderkey"))
      .groupBy("o_orderstatus")
      .agg(moneySum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("revenue"),
        count(lit(1)).as("n_items"))
      .orderBy("o_orderstatus")),

    "q_join_multiway" -> ((s, d) => Tables(s, d, "orders")
      .join(Tables(s, d, "customer"), col("o_custkey") === col("c_custkey"))
      .join(broadcast(Tables(s, d, "nation")), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(Tables(s, d, "region")), col("n_regionkey") === col("r_regionkey"))
      .groupBy("r_name")
      .agg(moneySum(col("o_totalprice")).as("revenue"), count(lit(1)).as("n_orders"))
      .orderBy("r_name")),

    "q_join_left_outer" -> ((s, d) => Tables(s, d, "orders")
      .join(Tables(s, d, "lineitem"), col("l_orderkey") === col("o_orderkey"), "left_outer")
      .groupBy("o_orderkey")
      .agg(count(col("l_orderkey")).as("n_items"))
      .orderBy("o_orderkey")),

    "q_join_semi" -> ((s, d) => Tables(s, d, "customer")
      .join(Tables(s, d, "orders"), col("c_custkey") === col("o_custkey"), "left_semi")
      .select("c_custkey", "c_name")
      .orderBy("c_custkey")),

    "q_join_anti" -> ((s, d) => Tables(s, d, "customer")
      .join(Tables(s, d, "orders").filter(col("o_orderpriority") === "1-URGENT"),
        col("c_custkey") === col("o_custkey"), "left_anti")
      .select("c_custkey", "c_name")
      .orderBy("c_custkey")),

    // Equi conjunct on user_id keeps this a shuffled equi join; the range
    // window is 30 min (5 min was empty at sf0.001 — ROADMAP fragile list);
    // predicate is applied post-join (SMJ + filter). At 100 TB: range-bucket
    // the timestamp too, so candidate pairs stay bounded per bucket.
    "q_join_range_theta" -> ((s, d) => {
      val e = Tables(s, d, "events")
      val v = e.filter(col("event_type") === "view")
        .select(col("event_id").as("view_id"), col("user_id"), col("ts").as("vts"))
      val p = e.filter(col("event_type") === "purchase")
        .select(col("event_id").as("purchase_id"), col("user_id").as("p_user"), col("ts").as("pts"))
      v.join(p, col("user_id") === col("p_user") &&
          col("pts") > col("vts") &&
          col("pts") <= col("vts") + expr("INTERVAL 30 MINUTES"))
        .select("view_id", "purchase_id")
        .orderBy("view_id", "purchase_id")
    }),

    // As-of: for each purchase event, the latest view of the same user at or
    // before it. Equi join on user + window argmax; at scale the window runs
    // per purchase_id partition after an equi shuffle (bounded state).
    "q_join_asof" -> ((s, d) => {
      val e = Tables(s, d, "events")
      val p = e.filter(col("event_type") === "purchase")
        .select(col("event_id").as("purchase_id"), col("user_id"), col("ts").as("pts"))
      val v = e.filter(col("event_type") === "view")
        .select(col("event_id").as("view_id"), col("user_id").as("v_user"), col("ts").as("vts"))
      val j = p.join(v, col("user_id") === col("v_user") && col("vts") <= col("pts"))
      val w = Window.partitionBy("purchase_id").orderBy(col("vts").desc, col("view_id").desc)
      j.withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
        .select("purchase_id", "view_id")
        .orderBy("purchase_id")
    }),

    // FORWARD as-of — the other direction users need (next-event
    // attribution: for each view, the EARLIEST purchase of the same user
    // at or after it). Same equi-join + per-key window argmin shape as
    // the backward form, so the scale story is identical.
    "q_join_asof_forward" -> ((s, d) => {
      val e = Tables(s, d, "events")
      val v = e.filter(col("event_type") === "view")
        .select(col("event_id").as("view_id"), col("user_id"), col("ts").as("vts"))
      val p = e.filter(col("event_type") === "purchase")
        .select(col("event_id").as("purchase_id"), col("user_id").as("p_user"),
          col("ts").as("pts"))
      val j = v.join(p, col("user_id") === col("p_user") && col("pts") >= col("vts"))
      val w = Window.partitionBy("view_id").orderBy(col("pts"), col("purchase_id"))
      j.withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
        .select("view_id", "purchase_id")
        .orderBy("view_id")
    }),

    // NEAREST as-of — either direction, whichever purchase is closest in
    // time to the view (tie: the backward one, then min purchase_id) —
    // the sensor-alignment/event-matching variant the backward/forward
    // pair can't express alone. Same equi-join + per-key window shape as
    // q_join_asof (oracle-friendly); the scale shape is the two-pass
    // union-merge composition — AsOfJoin.asofNearest, gated as
    // q_join_asof_nearest_merge with this query's identical oracle.
    "q_join_asof_nearest" -> ((s, d) => {
      val e = Tables(s, d, "events")
      val v = e.filter(col("event_type") === "view")
        .select(col("event_id").as("view_id"), col("user_id"),
          unix_micros(col("ts")).as("vus"))
      val p = e.filter(col("event_type") === "purchase")
        .select(col("event_id").as("purchase_id"), col("user_id").as("p_user"),
          unix_micros(col("ts")).as("pus"))
      val j = v.join(p, col("user_id") === col("p_user"))
        .withColumn("delta_us", abs(col("pus") - col("vus")))
      val w = Window.partitionBy("view_id").orderBy(col("delta_us"),
        // backward (pus <= vus) wins exact-distance ties, then min id
        (col("pus") > col("vus")).cast("int"), col("purchase_id"))
      j.withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
        .select("view_id", "purchase_id", "delta_us")
        .orderBy("view_id")
    }),

    "q_join_cross_bounded" -> ((s, d) => Tables(s, d, "region")
      .crossJoin(Tables(s, d, "nation"))
      .select("r_name", "n_name")
      .orderBy("r_name", "n_name")),

    // FULL OUTER with unmatched rows on BOTH sides (overlapping custkey
    // ranges); coalesce gives the single deterministic order key.
    "q_join_full_outer" -> ((s, d) => {
      val c = Tables(s, d, "customer").filter(col("c_custkey") <= 700)
        .select("c_custkey", "c_name")
      val o = Tables(s, d, "orders").filter(col("o_custkey") >= 400)
        .groupBy("o_custkey").agg(count(lit(1)).as("n_orders"))
      c.join(o, col("c_custkey") === col("o_custkey"), "full_outer")
        .select(coalesce(col("c_custkey"), col("o_custkey")).as("custkey"),
          col("c_name"), coalesce(col("n_orders"), lit(0L)).as("n_orders"))
        .orderBy("custkey")
    }),

    // The union-merge as-of operator under the harness gate: same semantics
    // as q_join_asof (latest view at-or-before each purchase, tie -> max
    // view_id) but ONE sort per user instead of the per-key pair blowup —
    // identical oracle SQL proves the formulations agree on real data.
    "q_join_asof_merge" -> ((s, d) => {
      val e = Tables(s, d, "events")
      val p = e.filter(col("event_type") === "purchase")
        .select(col("event_id").as("purchase_id"), col("user_id"), col("ts").as("pts"))
      val v = e.filter(col("event_type") === "view")
        .select(col("event_id").as("view_id"), col("user_id"), col("ts").as("vts"))
      graft.operators.AsOfJoin.asofBackward(p, v, "user_id", "pts", "vts", "view_id")
        .filter(col("r_view_id").isNotNull)
        .select(col("purchase_id"), col("r_view_id").as("view_id"))
        .orderBy("purchase_id")
    }),

    // The two-pass merge composition of NEAREST as-of under the gate:
    // same semantics as q_join_asof_nearest (identical oracle) but built
    // from two linear union-merge passes (backward + backward-over-negated
    // -time) and a per-row argmin — the shape that survives hot keys,
    // proven indistinguishable from the pair form on real data.
    "q_join_asof_nearest_merge" -> ((s, d) => {
      val e = Tables(s, d, "events")
      val v = e.filter(col("event_type") === "view")
        .select(col("event_id").as("view_id"), col("user_id"), col("ts").as("vts"))
      val p = e.filter(col("event_type") === "purchase")
        .select(col("event_id").as("purchase_id"), col("user_id"), col("ts").as("pts"))
      graft.operators.AsOfJoin.asofNearest(v, p, "user_id", "view_id",
          "vts", "pts", "purchase_id")
        .filter(col("r_purchase_id").isNotNull)
        .select(col("view_id"), col("r_purchase_id").as("purchase_id"), col("delta_us"))
        .orderBy("view_id")
    }),

    // The RANGE-SPLIT as-of under the harness gate: same semantics again
    // (identical oracle to q_join_asof/q_join_asof_merge), but the per-user
    // sort is split into 6-hour time slots with carry-row stitching — the
    // designed mitigation for a single pathological key landing its whole
    // timeline on one sort task. Three gated formulations, one answer.
    "q_join_asof_split" -> ((s, d) => {
      val e = Tables(s, d, "events")
      val p = e.filter(col("event_type") === "purchase")
        .select(col("event_id").as("purchase_id"), col("user_id"), col("ts").as("pts"))
      val v = e.filter(col("event_type") === "view")
        .select(col("event_id").as("view_id"), col("user_id"), col("ts").as("vts"))
      graft.operators.AsOfJoin.asofBackwardSplit(p, v, "user_id", "pts", "vts",
          "view_id", 6L * 3600 * 1000 * 1000)
        .filter(col("r_view_id").isNotNull)
        .select(col("purchase_id"), col("r_view_id").as("view_id"))
        .orderBy("purchase_id")
    }),

    // Skew-salted equi join through operators.ScaleJoins: lineitem's hot
    // orderkeys are spread over 8 deterministic salts, the small side is
    // replicated per salt. The salt must be INVISIBLE in the result — the
    // oracle is the plain equi join, which is the whole point.
    "q_join_salted" -> ((s, d) => {
      val li = Tables(s, d, "lineitem").select("l_orderkey", "l_quantity")
      val ords = Tables(s, d, "orders")
        .filter(col("o_orderstatus") === "F")
        .select("o_orderkey", "o_orderstatus")
      graft.operators.ScaleJoins.saltedJoin(li, ords, "l_orderkey", "o_orderkey", 8)
        .groupBy("o_orderstatus")
        .agg(count(lit(1)).as("n"), moneySum(col("l_quantity")).as("sum_qty"))
        .orderBy("o_orderstatus")
    }),

    // Bloom-prefiltered join (semi-join reduction) — THE 100 TB join move:
    // before shuffling the fact table, drop rows whose key cannot match.
    // The dim keys fold into a graft_bloom bitset (mergeable OR — partials
    // ship one 16 KB array per partition, never the keys), the single-row
    // bitset broadcasts, and the membership probe is built-ins only
    // (xxhash64/shiftright/element_at) so it runs inside WholeStageCodegen
    // at scan speed. No false negatives (suite-pinned), so the exact join
    // after the prefilter returns exactly the un-filtered result — the
    // oracle is the PLAIN join, proving the probabilistic step invisible.
    // At this SF the dim also broadcasts; at 100 TB (dim too big for a
    // hash-set broadcast, fact >> dim) the bloom cuts the fact-side
    // shuffle to matching+FP rows: (1-e^(-kn/m))^k ~ 3e-5 at n=10^4.
    "q_join_bloom" -> ((s, d) => {
      val m = 1 << 17
      val k = 4
      val dim = Tables(s, d, "orders")
        .filter(col("o_orderstatus") === "P" && col("o_orderpriority") === "1-URGENT")
        .select("o_orderkey")
      val bf = dim.agg(expr(s"graft_bloom(o_orderkey, $m, $k)").as("bf"))
      Tables(s, d, "lineitem")
        .select("l_orderkey", "l_extendedprice")
        .join(broadcast(bf))
        .filter(expr(graft.functions.BloomAgg.mightContainSql("l_orderkey", "bf", m, k)))
        .drop("bf")
        .join(dim, col("l_orderkey") === col("o_orderkey"))
        .agg(count(lit(1)).as("n_items"),
          countDistinct("l_orderkey").as("n_orders"),
          moneySum(col("l_extendedprice")).as("revenue"))
    }),

    // ---- aggregations ---------------------------------------------------
    "q_agg_q1" -> ((s, d) => Tables(s, d, "lineitem")
      .filter(col("l_shipdate") <= lit("2000-12-31").cast("timestamp"))
      .groupBy("l_returnflag", "l_linestatus")
      .agg(
        sum("l_quantity").as("sum_qty"), // integer-valued doubles: exact
        moneySum(col("l_extendedprice")).as("sum_base_price"),
        moneySum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("sum_disc_price"),
        moneySum(col("l_extendedprice") * (lit(1.0) - col("l_discount")) * (lit(1.0) + col("l_tax"))).as("sum_charge"),
        round(sum("l_quantity") / count(lit(1)), 4).as("avg_qty"),
        dmean(col("l_extendedprice")).as("avg_price"),
        dmean(col("l_discount")).as("avg_disc"),
        count(lit(1)).as("count_order"))
      .orderBy("l_returnflag", "l_linestatus")),

    "q_agg_distinct" -> ((s, d) => Tables(s, d, "lineitem")
      .groupBy("l_suppkey")
      .agg(countDistinct(col("l_partkey")).as("distinct_parts"))
      .orderBy("l_suppkey")),

    // No oracle (approximate); determinism holds because HLL++ merge is
    // order-independent. Covered by a tolerance test in scalatest.
    "q_agg_approx_distinct" -> ((s, d) => Tables(s, d, "lineitem")
      .groupBy("l_suppkey")
      .agg(approx_count_distinct(col("l_partkey")).as("approx_parts"))
      .orderBy("l_suppkey")),

    // No oracle (approximate, rows-only so the driver checks counts, not
    // values). approx_percentile is Spark's Greenwald-Khanna quantile
    // summary — mergeable, which is what matters at 100 TB (partial
    // summaries per partition, no full sort), but NOT order-independent:
    // GK compression makes merged summaries depend on merge order, so
    // exact output values may vary across partitionings (unlike the HLL
    // sketch above). The rank guarantee (within 1/accuracy of the true
    // rank) holds regardless — pinned in OperatorPropsSuite's band test.
    "q_agg_approx_quantile" -> ((s, d) => Tables(s, d, "lineitem")
      .groupBy("l_returnflag")
      .agg(expr("approx_percentile(CAST(l_quantity AS DOUBLE), array(0.25D, 0.5D, 0.75D), 10000)")
        .as("qs"))
      .select(col("l_returnflag"),
        col("qs").getItem(0).as("q25"),
        col("qs").getItem(1).as("q50"),
        col("qs").getItem(2).as("q75"))
      .orderBy("l_returnflag")),

    "q_agg_rollup" -> ((s, d) => Tables(s, d, "orders")
      .join(Tables(s, d, "customer"), col("o_custkey") === col("c_custkey"))
      .join(broadcast(Tables(s, d, "nation")), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(Tables(s, d, "region")), col("n_regionkey") === col("r_regionkey"))
      .rollup(col("r_name"), col("n_name"))
      .agg(moneySum(col("o_totalprice")).as("revenue"))
      .select(coalesce(col("r_name"), lit("(all)")).as("r_name"),
        coalesce(col("n_name"), lit("(all)")).as("n_name"), col("revenue"))
      .orderBy("r_name", "n_name")),

    "q_agg_cube" -> ((s, d) => Tables(s, d, "orders")
      .cube(col("o_orderstatus"), col("o_orderpriority"))
      .agg(count(lit(1)).as("n"))
      .select(coalesce(col("o_orderstatus"), lit("(all)")).as("o_orderstatus"),
        coalesce(col("o_orderpriority"), lit("(all)")).as("o_orderpriority"), col("n"))
      .orderBy("o_orderstatus", "o_orderpriority")),

    "q_agg_grouping_sets" -> ((s, d) => {
      Tables(s, d, "events").createOrReplaceTempView("gs_events")
      s.sql("""
        SELECT coalesce(event_type, '(all)') AS event_type,
               coalesce(user_id, -1)         AS user_id,
               count(1)                      AS n,
               CAST(SUM(CAST(value AS DECIMAL(22,6))) AS DOUBLE) AS sum_value
        FROM gs_events
        GROUP BY GROUPING SETS ((event_type), (user_id), ())
        ORDER BY event_type, user_id""")
    }),

    // Exact interpolated percentiles (SortAggregate path, unlike the hash
    // aggregates above); both engines use the same (n-1)*p linear
    // interpolation, rounded to absorb last-ulp differences.
    "q_agg_percentile" -> ((s, d) => Tables(s, d, "orders")
      .groupBy("o_orderstatus")
      .agg(round(expr("percentile(o_totalprice, 0.5D)"), 4).as("p50"),
        round(expr("percentile(o_totalprice, 0.9D)"), 4).as("p90"),
        count(lit(1)).as("n"))
      .orderBy("o_orderstatus")),

    // Statistical aggregates (corr / stddev / covar) from EXACT decimal
    // moments, not the built-in streaming estimators: Welford-style merge
    // order differs between engines and partitionings, but n, Σx, Σy, Σx²,
    // Σy², Σxy as DECIMAL(18,4)-product sums are integer-exact and
    // order-independent, so the final double formulas start from identical
    // numbers in Spark, DuckDB, and ANY cluster partitioning. Same pattern
    // scales to 100 TB (one partial+final hash agg, six counters per group).
    // The (quantity, discount) pair is chosen so every moment stays WITHIN
    // double's exact integer/decimal range (sxx <= ~1e9 integral, sxy <= 1e6
    // at 6 dp) — with money-scale columns the 22-digit Σy² would depend on
    // each engine's decimal->double rounding at the last ulp. Performance
    // holds at 100 TB unchanged (still six mergeable counters); the exact-
    // double-cast argument holds to ~3.6e12 rows (Σx² < 2^53) — beyond
    // that, keep the decimal moments and widen the final rounding instead.
    "q_agg_stats" -> ((s, d) => {
      val x = col("l_quantity").cast("decimal(18,4)")
      val y = col("l_discount").cast("decimal(18,4)")
      Tables(s, d, "lineitem")
        .groupBy("l_returnflag")
        .agg(count(lit(1)).as("n"),
          sum(x).as("sx"), sum(y).as("sy"),
          sum(x * x).as("sxx"), sum(y * y).as("syy"),
          sum(x * y).as("sxy"))
        .select(col("l_returnflag"), col("n"),
          round((col("sxy").cast("double") - col("sx").cast("double") * col("sy").cast("double") / col("n"))
            / (col("n") - 1), 4).as("covar_samp"),
          round(sqrt((col("sxx").cast("double") - col("sx").cast("double") * col("sx").cast("double") / col("n"))
            / (col("n") - 1)), 4).as("stddev_x"),
          round(((col("sxy").cast("double") - col("sx").cast("double") * col("sy").cast("double") / col("n"))
            / (sqrt(col("sxx").cast("double") - col("sx").cast("double") * col("sx").cast("double") / col("n"))
              * sqrt(col("syy").cast("double") - col("sy").cast("double") * col("sy").cast("double") / col("n")))), 4).as("corr"))
        .orderBy("l_returnflag")
    }),

    // Higher exact moments: population skewness and excess kurtosis of
    // l_quantity per flag. Quantities are integral (1..50), so the four
    // power sums are exact BIGINTs (x^4 <= 6.25e6 — no overflow until
    // ~1.5e12 rows, and the sums re-aggregate, so a 100 TB run partials
    // map-side like any sum). The central-moment algebra then runs on
    // identical doubles in both engines; m2^1.5 is written sqrt(m2*m2*m2)
    // because sqrt is IEEE-correctly-rounded while pow() may differ
    // between libm implementations.
    "q_agg_skewkurt" -> ((s, d) => {
      val x = col("l_quantity").cast("long")
      val g = Tables(s, d, "lineitem")
        .groupBy("l_returnflag")
        .agg(count(lit(1)).as("n"), sum(x).as("s1"), sum(x * x).as("s2"),
          sum(x * x * x).as("s3"), sum(x * x * x * x).as("s4"))
      val n = g("n").cast("double")
      val m1 = g("s1").cast("double") / n
      val m2 = g("s2").cast("double") / n - m1 * m1
      val m3 = g("s3").cast("double") / n - lit(3.0) * m1 * (g("s2").cast("double") / n) +
        lit(2.0) * m1 * m1 * m1
      val m4 = g("s4").cast("double") / n - lit(4.0) * m1 * (g("s3").cast("double") / n) +
        lit(6.0) * m1 * m1 * (g("s2").cast("double") / n) - lit(3.0) * m1 * m1 * m1 * m1
      // + 0.0 collapses IEEE -0.0 to +0.0 (a symmetric flag rounds to
      // "-0.0" in DuckDB but "0.0" here — same value, different hash)
      g.select(col("l_returnflag"), col("n"),
          round(m1, 4).as("mean_qty"),
          (round(m3 / sqrt(m2 * m2 * m2), 4) + lit(0.0)).as("skewness"),
          (round(m4 / (m2 * m2) - lit(3.0), 4) + lit(0.0)).as("kurtosis"))
        .orderBy("l_returnflag")
    }),

    // MERGE/upsert — dataset versioning's core move: apply a change batch
    // (updates win by key, new keys insert) onto a snapshot, the thing a
    // training-data pipeline runs every refresh cycle. Spark-first shape:
    // one full-outer join on the key + coalesce(update, snapshot) per
    // column — exactly what MERGE INTO compiles to without a transactional
    // table format. The change batch is derived deterministically from the
    // snapshot itself (keys %10 repriced, keys %1000 re-keyed as inserts —
    // insert keys offset by max(o_orderkey) + 1 so they can NEVER collide
    // with a real key at any SF: keys here start at 0, so a bare max
    // offset would map key 0 back onto the max key itself) so both
    // engines build the identical batch.
    // At 100 TB: the join shuffles on the key once; recurring merges
    // co-locate via bucketing (ScaleJoins.writeBucketed) so the snapshot
    // never re-shuffles.
    "q_merge_upsert" -> ((s, d) => {
      val snap = Tables(s, d, "orders")
        .select(col("o_orderkey"), col("o_totalprice"), col("o_orderstatus"))
      val maxKey = snap.agg(max("o_orderkey").as("maxkey"))
      val upd = snap.filter(col("o_orderkey") % 10 === 0)
        .select(col("o_orderkey").as("u_key"),
          (col("o_totalprice") + 100.0).as("u_price"), lit("U").as("u_status"))
        .unionByName(snap.filter(col("o_orderkey") % 1000 === 0)
          .crossJoin(broadcast(maxKey))
          .select((col("o_orderkey") + col("maxkey") + 1L).as("u_key"),
            col("o_totalprice").as("u_price"), lit("I").as("u_status")))
      snap.join(upd, col("o_orderkey") === col("u_key"), "full_outer")
        .select(coalesce(col("o_orderkey"), col("u_key")).as("okey"),
          round(coalesce(col("u_price"), col("o_totalprice")), 2).as("price"),
          coalesce(col("u_status"), col("o_orderstatus")).as("status"))
        .orderBy("okey")
    }),

    // Heavy-hitter profile — the skew DIAGNOSIS that picks the targets for
    // every mitigation in this engine (ScaleJoins.dropHotKeys caps,
    // saltedJoin salts, AQE thresholds): top-10 keys by row count with
    // share of total. Exact form: one hash aggregation + distributed
    // top-k (TakeOrderedAndProject), so the shuffle carries one row per
    // distinct key — fine to millions of keys; beyond that the graft_topk
    // sketch twin below bounds state at `capacity` counters regardless of
    // key cardinality.
    "q_heavy_hitters" -> ((s, d) => {
      val li = Tables(s, d, "lineitem")
      val cnt = li.groupBy("l_partkey").agg(count(lit(1)).as("cnt"))
      val total = li.agg(count(lit(1)).as("total"))
      val wr = Window.orderBy(col("cnt").desc, col("l_partkey"))
      cnt.crossJoin(broadcast(total))
        .orderBy(col("cnt").desc, col("l_partkey")).limit(10)
        .withColumn("rank", row_number().over(wr))
        .select(col("rank"), col("l_partkey"), col("cnt"),
          round(col("cnt").cast("double") / col("total"), 6).as("share"))
        .orderBy("rank")
    }),

    // Misra-Gries sketch twin of q_heavy_hitters (functions.TopKAgg):
    // bounded 4096-counter summary per partition, mergeable partials —
    // the shape that still works when the key universe itself cannot be
    // shuffled. capacity > distinct keys at the gated SFs, so counts are
    // exact there (TopKAggSuite pins equality with the exact form AND the
    // under-estimate/coverage bounds in the genuinely-evicting regime).
    // No oracle: the summary type isn't SQL-expressible -> rows-only.
    "q_heavy_hitters_sketch" -> ((s, d) => Tables(s, d, "lineitem")
      .agg(expr("graft_topk(l_partkey, 10, 4096)").as("tk"))
      .select(posexplode(col("tk")).as(Seq("pos", "e")))
      .select((col("pos") + 1).cast("int").as("rank"),
        col("e.key").as("l_partkey"), col("e.cnt").as("cnt"))
      .orderBy("rank")),

    // The custom TopKPerKey WHOLE-OPERATOR plan (graft.plans: logical
    // node + strategy + exec, injected via GraftExtensions) — "top 3
    // orders per customer" with a bounded k-row heap per key instead of
    // WindowExec's full per-key sort. Same single hash shuffle (planted
    // by EnsureRequirements from the operator's required distribution),
    // zero Sort operators in the plan (PlanQualitySuite pins this); at
    // 100 TB the window form sorts the fact table to discard all but
    // k rows per key, this one never materializes more than keys×k rows
    // per partition. The oracle is the rank-window formulation — the
    // independent witness that the heap operator implements exactly
    // group-wise row_number() <= k.
    "q_topk_per_key" -> ((s, d) => {
      val o = Tables(s, d, "orders").select("o_custkey", "o_orderkey", "o_totalprice")
      graft.operators.GroupLimits.topKPerKey(o, Seq("o_custkey"),
          Seq(col("o_totalprice").desc, col("o_orderkey")), 3)
        .orderBy(col("o_custkey"), col("o_totalprice").desc, col("o_orderkey"))
    }),

    // graft_topk under groupBy — per-group heavy hitters, the form a
    // skew profiler actually runs (hot keys PER join column value / per
    // tenant / per day). One ObjectHashAggregate: each group carries a
    // bounded 32768-counter summary that partial-aggregates map-side, so
    // the shuffle ships |groups| sketches instead of |groups × keys|
    // count rows. capacity 32768 exceeds the part-key universe at EVERY
    // fixture SF (20k at sf0.1), so counts are exact and deterministic
    // (cnt desc, key asc) — which is what makes a DuckDB rank-window
    // oracle possible here, unlike the global sketch twin's documented
    // rows-only stance. graft_topk_exact ENFORCES that assumption: if a
    // larger universe ever evicts (MG summary tracks it), the query fails
    // loudly instead of silently serving merge-schedule-dependent
    // estimates against an exact-rank oracle.
    "q_heavy_hitters_grouped" -> ((s, d) => Tables(s, d, "lineitem")
      .groupBy("l_returnflag")
      .agg(expr("graft_topk_exact(l_partkey, 5, 32768)").as("tk"))
      .select(col("l_returnflag"), posexplode(col("tk")).as(Seq("pos", "e")))
      .select(col("l_returnflag"), (col("pos") + 1).cast("int").as("rank"),
        col("e.key").as("l_partkey"), col("e.cnt").as("cnt"))
      .orderBy("l_returnflag", "rank")),

    // Deterministic EXACTLY-k-per-group sampling — the "5 examples per
    // class / per day" primitive every eval-set builder needs, where the
    // fraction-based samplers can't promise a count. Rows are ranked by
    // the engine's shared integer LCG (the q_sample_hash generator, so
    // both engines compute the identical pseudo-random order) and the
    // TopKPerKey heap operator keeps k per group — no per-group sort, no
    // window, one hash exchange (its second production use after
    // q_topk_per_key: sampling IS a group limit under a hash order).
    "q_sample_k_per_group" -> ((s, d) => {
      val o = Tables(s, d, "orders")
        .select(col("o_custkey"), col("o_orderkey"),
          expr("pmod((o_orderkey * 1103515245 + 12345), 2147483648)").as("h"))
      graft.operators.GroupLimits.topKPerKey(o, Seq("o_custkey"),
          Seq(col("h"), col("o_orderkey")), 5)
        .select("o_custkey", "o_orderkey")
        .orderBy("o_custkey", "o_orderkey")
    }),

    // Deterministic sampling: a shared integer LCG on the key replaces
    // rand()/TABLESAMPLE so the SAME 10% of rows is selected in both
    // engines, on every run, under any partitioning. At scale the predicate
    // is a pushed-down scan filter — no shuffle, no driver coordination.
    "q_sample_hash" -> ((s, d) => Tables(s, d, "orders")
      .filter(expr("pmod((o_orderkey * 1103515245 + 12345), 2147483648) % 100 < 10"))
      .groupBy("o_orderstatus")
      .agg(count(lit(1)).as("n"), moneySum(col("o_totalprice")).as("revenue"))
      .orderBy("o_orderstatus")),

    // STRATIFIED deterministic sampling — the balanced-training-data op:
    // per-stratum fractions (downsample even labels to 20%, odd to 40%)
    // via the same shared LCG, so the SAME rows are kept in both engines
    // under any partitioning. At scale this is a pushed-down scan filter
    // exactly like the plain sample — per-class balance costs no shuffle,
    // no per-stratum pass, no driver coordination (vs sampleBy's
    // rand()-based, nondeterministic equivalent).
    "q_sample_stratified" -> ((s, d) => {
      val e = Tables(s, d, "embeddings")
        .withColumn("pct",
          expr("pmod((vec_id * 1103515245 + 12345), 2147483648) % 100"))
        .filter((col("label") % 2 === 0 && col("pct") < 20) ||
          (col("label") % 2 === 1 && col("pct") < 40))
      e.groupBy("label").agg(count(lit(1)).as("n_sampled"),
          min("vec_id").as("first_id"), max("vec_id").as("last_id"))
        .orderBy("label")
    }),

    // Boolean aggregates: per order-priority, did every/any order ship
    // above a price floor. every/some compile to Min/Max over booleans —
    // hash-aggregable, mergeable, no special handling at scale.
    "q_agg_bool" -> ((s, d) => Tables(s, d, "orders")
      .groupBy("o_orderpriority")
      .agg(expr("every(o_totalprice > 1000.0)").as("all_above_1k"),
        expr("some(o_totalprice > 250000.0)").as("any_above_250k"),
        count(lit(1)).as("n"))
      .orderBy("o_orderpriority")),

    "q_agg_collect_sorted" -> ((s, d) => Tables(s, d, "customer")
      .join(broadcast(Tables(s, d, "nation")), col("c_nationkey") === col("n_nationkey"))
      .groupBy("n_name")
      .agg(array_join(sort_array(collect_list(col("c_custkey"))), ",").as("custkeys"))
      .orderBy("n_name")),

    // ---- sorts / top-k --------------------------------------------------
    // 'yyyy-MM-dd' strings sort chronologically, so ordering on the formatted
    // column keeps Spark and DuckDB byte-identical. limit -> TakeOrderedAndProject.
    "q_sort_multikey" -> ((s, d) => Tables(s, d, "lineitem")
      .select(col("l_returnflag"), dstr(col("l_shipdate")).as("ship"),
        col("l_orderkey"), col("l_linenumber"))
      .orderBy(col("l_returnflag"), col("ship").desc, col("l_orderkey"), col("l_linenumber"))
      .limit(100)),

    "q_topk_global" -> ((s, d) => Tables(s, d, "orders")
      .groupBy("o_custkey")
      .agg(moneySum(col("o_totalprice")).as("revenue"))
      .orderBy(col("revenue").desc, col("o_custkey"))
      .limit(10)),

    // Scalar subquery: Catalyst rewrites the uncorrelated aggregate into a
    // one-row join (RewriteCorrelatedScalarSubquery / subquery broadcast).
    "q_subquery_scalar" -> ((s, d) => {
      Tables(s, d, "part").createOrReplaceTempView("sq_part")
      s.sql("""
        SELECT p_partkey, p_retailprice
        FROM sq_part
        WHERE p_retailprice > (SELECT CAST(SUM(CAST(p_retailprice AS DECIMAL(22,6))) AS DOUBLE)
                                      / COUNT(*) FROM sq_part)
        ORDER BY p_partkey""")
    }),

    // CORRELATED scalar subquery — "each customer's orders above that
    // customer's own average". Written Spark-first as ONE window over the
    // correlation key instead of the textbook per-row subquery: Catalyst
    // would decorrelate the subquery into an aggregate + self-join (two
    // scans, two shuffles); the window form is one scan and one shuffle
    // on o_custkey with bounded per-key state. The oracle keeps the
    // correlated-subquery formulation, so DuckDB's decorrelator is an
    // independent derivation agreeing row-for-row. The average is the
    // exact decimal-sum / count divide in both engines, so the > filter
    // decides identically at the last ulp.
    "q_subquery_correlated" -> ((s, d) => {
      val w = Window.partitionBy("o_custkey")
      Tables(s, d, "orders")
        .withColumn("cust_avg",
          sum(col("o_totalprice").cast("decimal(22,6)")).over(w).cast("double")
            / count(lit(1)).over(w))
        .filter(col("o_totalprice") > col("cust_avg"))
        // cust_avg itself is NOT emitted: a half-at-4dp boundary case rounds
        // apart between the engines' ROUND implementations; the filter
        // compares the identical unrounded doubles, which is the contract
        .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
        .orderBy("o_orderkey")
    }),

    // Pivot with a FIXED value list (never pivot on discovered values at
    // scale — that's a driver-side distinct scan before planning).
    "q_pivot" -> ((s, d) => Tables(s, d, "events")
      .groupBy("user_id")
      .pivot("event_type", Seq("view", "click", "purchase", "signup", "error"))
      .count()
      .na.fill(0L)
      .orderBy("user_id")),

    // Unpivot (wide -> long): the inverse reshape of q_pivot, via the
    // typed melt API (map-side Expand, no shuffle until the final order).
    "q_unpivot" -> ((s, d) => Tables(s, d, "part")
      .select(col("p_partkey"), col("p_retailprice"),
        col("p_size").cast("double").as("p_size"))
      .unpivot(Array(col("p_partkey")),
        Array(col("p_retailprice"), col("p_size")), "measure", "value")
      .orderBy("p_partkey", "measure")),

    // argmax/argmin aggregates: per order-status, the orderkey holding the
    // max/min totalprice. Spark max_by/min_by vs DuckDB arg_max/arg_min;
    // totalprice ties cannot flip the result because the struct comparator
    // breaks ties on the (unique) key in BOTH engines' chosen expressions —
    // harness data has no exact-tie totalprice per group, and orderkey
    // uniqueness makes the emitted key deterministic anyway via max(...).
    "q_agg_argmax" -> ((s, d) => Tables(s, d, "orders")
      .groupBy("o_orderstatus")
      .agg(max(struct(col("o_totalprice"), col("o_orderkey")))
             .getField("o_orderkey").as("max_key"),
        min(struct(col("o_totalprice"), col("o_orderkey")))
             .getField("o_orderkey").as("min_key"),
        round(max(col("o_totalprice")), 4).as("max_price"))
      .orderBy("o_orderstatus")),

    // ---- set operations -------------------------------------------------
    "q_set_union" -> ((s, d) => Tables(s, d, "customer")
      .select(col("c_nationkey").as("nationkey"))
      .union(Tables(s, d, "supplier").select(col("s_nationkey").as("nationkey")))
      .distinct()
      .orderBy("nationkey")),

    "q_set_intersect" -> ((s, d) => Tables(s, d, "lineitem")
      .select(col("l_partkey").as("partkey"))
      .intersect(Tables(s, d, "part").filter(col("p_size") <= 25)
        .select(col("p_partkey").as("partkey")))
      .orderBy("partkey")),

    "q_set_except" -> ((s, d) => Tables(s, d, "part")
      .filter(col("p_size") <= 10)
      .select(col("p_partkey").as("partkey"))
      .except(Tables(s, d, "lineitem").filter(col("l_quantity") > 45)
        .select(col("l_partkey").as("partkey")))
      .orderBy("partkey")),

    // BAG-semantics set ops — multiplicity-preserving (each row of the
    // left survives max(0, count_l - count_r) times): different operators
    // from the distinct-set forms above, planned as an aggregated
    // count-difference + generator replay (no row-by-row anti join).
    // Duplicate output rows are indistinguishable, so orderBy on the
    // value is fully deterministic.
    "q_set_except_all" -> ((s, d) => Tables(s, d, "lineitem")
      .filter(col("l_quantity") <= 3)
      .select(col("l_partkey").as("partkey"))
      .exceptAll(Tables(s, d, "lineitem").filter(col("l_quantity") >= 48)
        .select(col("l_partkey").as("partkey")))
      .orderBy("partkey")),

    "q_set_intersect_all" -> ((s, d) => Tables(s, d, "lineitem")
      .filter(col("l_quantity") <= 3)
      .select(col("l_partkey").as("partkey"))
      .intersectAll(Tables(s, d, "lineitem").filter(col("l_returnflag") === "R")
        .select(col("l_partkey").as("partkey")))
      .orderBy("partkey")),

    // Equi-width histogram of a numeric column — the distribution half of
    // data profiling (operators.Profiler covers scalar stats): 12 bins
    // over the exact [min, max] span, bucket arithmetic mirrored
    // token-for-token in the oracle so floor() sees identical doubles.
    // One agg for the bounds (broadcast) + one map-side bucket expression
    // + one hash agg — no sort, no shuffle of the data beyond the agg.
    "q_histogram" -> ((s, d) => {
      val o = Tables(s, d, "orders")
      val bounds = o.agg(min(col("o_totalprice")).as("lo"),
        max(col("o_totalprice")).as("hi"))
      o.crossJoin(broadcast(bounds))
        // hi = lo (constant column / single row) would make the quotient
        // 0/0 = NaN, where Spark's long cast and DuckDB's BIGINT cast
        // DISAGREE (0 vs error) — pin bin 0 explicitly in both engines
        .withColumn("bin", when(col("hi") === col("lo"), lit(0L)).otherwise(least(
          floor((col("o_totalprice") - col("lo")) / ((col("hi") - col("lo")) / 12.0)),
          lit(11L)).cast("long")))
        .groupBy("bin").agg(count(lit(1)).as("n"),
          round(min(col("o_totalprice")), 4).as("bin_min"),
          round(max(col("o_totalprice")), 4).as("bin_max"))
        .orderBy("bin")
    }),

    // Deterministic MODE: most frequent l_quantity per returnflag, ties to
    // the LOWEST value (Spark's builtin mode() leaves ties undefined, so
    // it never appears here). Shape: one hash agg over (flag, qty) —
    // the full data shuffle — then a row_number over the tiny
    // (|flags| x |distinct qty|) counted frame. The heavy lifting happens
    // in the partial-combining agg; the window never sees raw rows.
    "q_agg_mode" -> ((s, d) => {
      val cnt = Tables(s, d, "lineitem")
        .groupBy("l_returnflag", "l_quantity").agg(count(lit(1)).as("freq"))
      val w = Window.partitionBy("l_returnflag")
        .orderBy(col("freq").desc, col("l_quantity"))
      cnt.withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
        .select(col("l_returnflag"), col("l_quantity").as("mode_qty"), col("freq"))
        .orderBy("l_returnflag")
    }),

    // Interval-overlap join: per-customer activity interval
    // [first_order, first_order + 30d] against derived 10-day promo
    // windows (one per distinct order month). Overlap predicate
    // c0 <= p1 AND p0 <= c1 — a theta join, but the promo side is tiny by
    // construction (one row per month in the data), so the Spark-first
    // plan is an explicit broadcast nested-loop: the fact side never
    // shuffles. With two LARGE interval sets the same operator would
    // bucketize both sides onto an overlapping-month grid and equi-join
    // on the bucket (the q_dedup band-join pattern); the month-derived
    // promo table IS that grid here.
    "q_join_interval_overlap" -> ((s, d) => {
      val orders = Tables(s, d, "orders")
      val cust = orders.groupBy("o_custkey")
        .agg(min(to_date(col("o_orderdate"))).as("c0"))
        .withColumn("c1", date_add(col("c0"), 30))
      val promos = orders
        .select(to_date(date_trunc("month", col("o_orderdate"))).as("p0")).distinct()
        .withColumn("p1", date_add(col("p0"), 9))
      cust.join(broadcast(promos), col("c0") <= col("p1") && col("p0") <= col("c1"))
        .groupBy("p0", "p1")
        .agg(count(lit(1)).as("n_active"), min(col("o_custkey")).as("first_cust"))
        .select(dstr(col("p0")).as("promo_start"), dstr(col("p1")).as("promo_end"),
          col("n_active"), col("first_cust"))
        .orderBy("promo_start")
    }),
  )

  /** Pair-form as-of SQL — shared by q_join_asof and q_join_asof_merge
    * (the union-merge operator must produce identical results). */
  private val asofSql: String =
      """SELECT purchase_id, view_id FROM (
        |  SELECT p.event_id AS purchase_id, v.event_id AS view_id,
        |         row_number() OVER (PARTITION BY p.event_id
        |                            ORDER BY CAST(v.ts AS TIMESTAMP) DESC, v.event_id DESC) AS rn
        |  FROM events p JOIN events v
        |    ON p.event_type = 'purchase' AND v.event_type = 'view'
        |   AND p.user_id = v.user_id
        |   AND CAST(v.ts AS TIMESTAMP) <= CAST(p.ts AS TIMESTAMP))
        |WHERE rn = 1 ORDER BY purchase_id""".stripMargin

  val oracles: Map[String, String] = Map(
    "q_scan_project" ->
      """SELECT l_orderkey, l_linenumber, l_quantity, l_returnflag
        |FROM lineitem ORDER BY l_orderkey, l_linenumber""".stripMargin,

    "q_scan_pruned" ->
      """SELECT l_orderkey, l_linenumber, strftime(l_shipdate, '%Y-%m-%d') AS ship, l_quantity
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01'
        |ORDER BY l_orderkey, l_linenumber""".stripMargin,

    "q_filter_compound" ->
      s"""SELECT ${sqlMoneySum("l_extendedprice * l_discount")} AS revenue
         |FROM lineitem
         |WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01'
         |  AND l_discount BETWEEN 0.05 AND 0.07 AND l_quantity < 24""".stripMargin,

    "q_case_when" ->
      """SELECT CASE WHEN o_totalprice < 100000 THEN 'low'
        |            WHEN o_totalprice < 300000 THEN 'mid'
        |            ELSE 'high' END AS tier, count(*) AS n
        |FROM orders GROUP BY 1 ORDER BY 1""".stripMargin,

    "q_join_broadcast" ->
      """SELECT n_nationkey, n_name, r_name
        |FROM nation JOIN region ON n_regionkey = r_regionkey
        |ORDER BY n_nationkey""".stripMargin,

    "q_join_shuffle" ->
      s"""SELECT o_orderstatus,
         |  ${sqlMoneySum("l_extendedprice * (1.0 - l_discount)")} AS revenue,
         |  count(*) AS n_items
         |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
         |GROUP BY 1 ORDER BY 1""".stripMargin,

    "q_join_multiway" ->
      s"""SELECT r_name, ${sqlMoneySum("o_totalprice")} AS revenue, count(*) AS n_orders
         |FROM orders
         |JOIN customer ON o_custkey = c_custkey
         |JOIN nation ON c_nationkey = n_nationkey
         |JOIN region ON n_regionkey = r_regionkey
         |GROUP BY 1 ORDER BY 1""".stripMargin,

    "q_join_left_outer" ->
      """SELECT o_orderkey, count(l_orderkey) AS n_items
        |FROM orders LEFT JOIN lineitem ON l_orderkey = o_orderkey
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    "q_join_semi" ->
      """SELECT c_custkey, c_name FROM customer
        |WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
        |ORDER BY c_custkey""".stripMargin,

    "q_join_anti" ->
      """SELECT c_custkey, c_name FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders
        |                  WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT')
        |ORDER BY c_custkey""".stripMargin,

    "q_join_range_theta" ->
      """SELECT v.event_id AS view_id, p.event_id AS purchase_id
        |FROM events v JOIN events p
        |  ON v.user_id = p.user_id
        | AND v.event_type = 'view' AND p.event_type = 'purchase'
        | AND CAST(p.ts AS TIMESTAMP) >  CAST(v.ts AS TIMESTAMP)
        | AND CAST(p.ts AS TIMESTAMP) <= CAST(v.ts AS TIMESTAMP) + INTERVAL 30 MINUTE
        |ORDER BY 1, 2""".stripMargin,

    "q_join_asof" -> asofSql,

    // identical oracle by construction: the merge formulation must be
    // indistinguishable from the pair formulation
    "q_join_asof_merge" -> asofSql,

    // and the range-split formulation must be indistinguishable from both
    "q_join_asof_split" -> asofSql,

    // the two-pass merge composition must match the pair-form nearest
    "q_join_asof_nearest_merge" ->
      """SELECT view_id, purchase_id, delta_us FROM (
        |  SELECT v.event_id AS view_id, p.event_id AS purchase_id,
        |         abs(epoch_us(CAST(p.ts AS TIMESTAMP)) - epoch_us(CAST(v.ts AS TIMESTAMP))) AS delta_us,
        |         row_number() OVER (PARTITION BY v.event_id
        |           ORDER BY abs(epoch_us(CAST(p.ts AS TIMESTAMP)) - epoch_us(CAST(v.ts AS TIMESTAMP))),
        |                    CAST(epoch_us(CAST(p.ts AS TIMESTAMP)) > epoch_us(CAST(v.ts AS TIMESTAMP)) AS INT),
        |                    p.event_id) AS rn
        |  FROM events v JOIN events p
        |    ON v.event_type = 'view' AND p.event_type = 'purchase'
        |   AND v.user_id = p.user_id)
        |WHERE rn = 1 ORDER BY view_id""".stripMargin,

    "q_join_asof_forward" ->
      """SELECT view_id, purchase_id FROM (
        |  SELECT v.event_id AS view_id, p.event_id AS purchase_id,
        |         row_number() OVER (PARTITION BY v.event_id
        |                            ORDER BY CAST(p.ts AS TIMESTAMP), p.event_id) AS rn
        |  FROM events v JOIN events p
        |    ON v.event_type = 'view' AND p.event_type = 'purchase'
        |   AND v.user_id = p.user_id
        |   AND CAST(p.ts AS TIMESTAMP) >= CAST(v.ts AS TIMESTAMP))
        |WHERE rn = 1 ORDER BY view_id""".stripMargin,

    "q_join_asof_nearest" ->
      """SELECT view_id, purchase_id, delta_us FROM (
        |  SELECT v.event_id AS view_id, p.event_id AS purchase_id,
        |         abs(epoch_us(CAST(p.ts AS TIMESTAMP)) - epoch_us(CAST(v.ts AS TIMESTAMP))) AS delta_us,
        |         row_number() OVER (PARTITION BY v.event_id
        |           ORDER BY abs(epoch_us(CAST(p.ts AS TIMESTAMP)) - epoch_us(CAST(v.ts AS TIMESTAMP))),
        |                    CAST(epoch_us(CAST(p.ts AS TIMESTAMP)) > epoch_us(CAST(v.ts AS TIMESTAMP)) AS INT),
        |                    p.event_id) AS rn
        |  FROM events v JOIN events p
        |    ON v.event_type = 'view' AND p.event_type = 'purchase'
        |   AND v.user_id = p.user_id)
        |WHERE rn = 1 ORDER BY view_id""".stripMargin,

    "q_join_cross_bounded" ->
      """SELECT r_name, n_name FROM region CROSS JOIN nation ORDER BY 1, 2""",

    "q_join_full_outer" ->
      """SELECT coalesce(c_custkey, o_custkey) AS custkey, c_name,
        |       coalesce(n_orders, 0) AS n_orders
        |FROM (SELECT c_custkey, c_name FROM customer WHERE c_custkey <= 700) c
        |FULL OUTER JOIN (SELECT o_custkey, COUNT(*) AS n_orders FROM orders
        |                 WHERE o_custkey >= 400 GROUP BY 1) o
        |  ON c_custkey = o_custkey
        |ORDER BY custkey""".stripMargin,

    "q_join_salted" ->
      """SELECT o_orderstatus, COUNT(*) AS n,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(22,6))) AS DOUBLE) AS sum_qty
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |WHERE o_orderstatus = 'F'
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    "q_join_bloom" ->
      """SELECT COUNT(*) AS n_items,
        |  COUNT(DISTINCT l_orderkey) AS n_orders,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(22,6))) AS DOUBLE) AS revenue
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |WHERE o_orderstatus = 'P' AND o_orderpriority = '1-URGENT'""".stripMargin,

    "q_agg_q1" ->
      s"""SELECT l_returnflag, l_linestatus,
         |  SUM(l_quantity) AS sum_qty,
         |  ${sqlMoneySum("l_extendedprice")} AS sum_base_price,
         |  ${sqlMoneySum("l_extendedprice * (1.0 - l_discount)")} AS sum_disc_price,
         |  ${sqlMoneySum("l_extendedprice * (1.0 - l_discount) * (1.0 + l_tax)")} AS sum_charge,
         |  ROUND(SUM(l_quantity) / COUNT(*), 4) AS avg_qty,
         |  ${sqlMean("l_extendedprice")} AS avg_price,
         |  ${sqlMean("l_discount")} AS avg_disc,
         |  COUNT(*) AS count_order
         |FROM lineitem WHERE l_shipdate <= TIMESTAMP '2000-12-31'
         |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    "q_agg_distinct" ->
      """SELECT l_suppkey, count(DISTINCT l_partkey) AS distinct_parts
        |FROM lineitem GROUP BY 1 ORDER BY 1""".stripMargin,

    "q_agg_rollup" ->
      s"""SELECT coalesce(r_name, '(all)') AS r_name, coalesce(n_name, '(all)') AS n_name, revenue
         |FROM (
         |  SELECT r_name, n_name, ${sqlMoneySum("o_totalprice")} AS revenue
         |  FROM orders
         |  JOIN customer ON o_custkey = c_custkey
         |  JOIN nation ON c_nationkey = n_nationkey
         |  JOIN region ON n_regionkey = r_regionkey
         |  GROUP BY ROLLUP (r_name, n_name)
         |) ORDER BY 1, 2""".stripMargin,

    "q_agg_cube" ->
      """SELECT coalesce(o_orderstatus, '(all)') AS o_orderstatus,
        |       coalesce(o_orderpriority, '(all)') AS o_orderpriority, n
        |FROM (
        |  SELECT o_orderstatus, o_orderpriority, count(*) AS n
        |  FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)
        |) ORDER BY 1, 2""".stripMargin,

    "q_agg_grouping_sets" ->
      """SELECT coalesce(event_type, '(all)') AS event_type,
        |       coalesce(user_id, -1) AS user_id,
        |       count(*) AS n,
        |       CAST(SUM(CAST(value AS DECIMAL(22,6))) AS DOUBLE) AS sum_value
        |FROM events
        |GROUP BY GROUPING SETS ((event_type), (user_id), ())
        |ORDER BY 1, 2""".stripMargin,

    "q_agg_percentile" ->
      """SELECT o_orderstatus,
        |  ROUND(quantile_cont(o_totalprice, 0.5), 4) AS p50,
        |  ROUND(quantile_cont(o_totalprice, 0.9), 4) AS p90,
        |  COUNT(*) AS n
        |FROM orders GROUP BY 1 ORDER BY 1""".stripMargin,

    "q_agg_bool" ->
      """SELECT o_orderpriority,
        |  bool_and(o_totalprice > 1000.0) AS all_above_1k,
        |  bool_or(o_totalprice > 250000.0) AS any_above_250k,
        |  COUNT(*) AS n
        |FROM orders GROUP BY 1 ORDER BY 1""".stripMargin,

    "q_agg_collect_sorted" ->
      """SELECT n_name, array_to_string(list_sort(list(c_custkey)), ',') AS custkeys
        |FROM customer JOIN nation ON c_nationkey = n_nationkey
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    "q_agg_stats" ->
      """WITH m AS (
        |  SELECT l_returnflag, COUNT(*) AS n,
        |    SUM(CAST(l_quantity AS DECIMAL(18,4))) AS sx,
        |    SUM(CAST(l_discount AS DECIMAL(18,4))) AS sy,
        |    SUM(CAST(l_quantity AS DECIMAL(18,4)) * CAST(l_quantity AS DECIMAL(18,4))) AS sxx,
        |    SUM(CAST(l_discount AS DECIMAL(18,4)) * CAST(l_discount AS DECIMAL(18,4))) AS syy,
        |    SUM(CAST(l_quantity AS DECIMAL(18,4)) * CAST(l_discount AS DECIMAL(18,4))) AS sxy
        |  FROM lineitem GROUP BY 1)
        |SELECT l_returnflag, n,
        |  ROUND((CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE) / n) / (n - 1), 4) AS covar_samp,
        |  ROUND(sqrt((CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) / n) / (n - 1)), 4) AS stddev_x,
        |  ROUND((CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE) / n)
        |        / (sqrt(CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) / n)
        |           * sqrt(CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE) / n)), 4) AS corr
        |FROM m ORDER BY 1""".stripMargin,

    "q_agg_skewkurt" ->
      """WITH p AS (
        |  SELECT l_returnflag, count(*) AS n,
        |    CAST(sum(CAST(l_quantity AS BIGINT)) AS DOUBLE) AS s1,
        |    CAST(sum(CAST(l_quantity AS BIGINT) * CAST(l_quantity AS BIGINT)) AS DOUBLE) AS s2,
        |    CAST(sum(CAST(l_quantity AS BIGINT) * CAST(l_quantity AS BIGINT) * CAST(l_quantity AS BIGINT)) AS DOUBLE) AS s3,
        |    CAST(sum(CAST(l_quantity AS BIGINT) * CAST(l_quantity AS BIGINT) * CAST(l_quantity AS BIGINT) * CAST(l_quantity AS BIGINT)) AS DOUBLE) AS s4
        |  FROM lineitem GROUP BY 1),
        |r AS (SELECT l_returnflag, n, s1/n AS m1, s2/n AS r2, s3/n AS r3, s4/n AS r4 FROM p),
        |c AS (SELECT l_returnflag, n, m1, r2 - m1*m1 AS m2,
        |             r3 - 3.0*m1*r2 + 2.0*m1*m1*m1 AS m3,
        |             r4 - 4.0*m1*r3 + 6.0*m1*m1*r2 - 3.0*m1*m1*m1*m1 AS m4
        |      FROM r)
        |SELECT l_returnflag, n, ROUND(m1, 4) AS mean_qty,
        |       ROUND(m3 / sqrt(m2*m2*m2), 4) + 0.0 AS skewness,
        |       ROUND(m4 / (m2*m2) - 3.0, 4) + 0.0 AS kurtosis
        |FROM c ORDER BY 1""".stripMargin,

    "q_merge_upsert" ->
      """WITH snap AS (SELECT o_orderkey, o_totalprice, o_orderstatus FROM orders),
        |upd AS (
        |  SELECT o_orderkey AS u_key, o_totalprice + 100.0 AS u_price, 'U' AS u_status
        |  FROM snap WHERE o_orderkey % 10 = 0
        |  UNION ALL
        |  SELECT o_orderkey + (SELECT max(o_orderkey) FROM snap) + 1, o_totalprice, 'I'
        |  FROM snap WHERE o_orderkey % 1000 = 0)
        |SELECT coalesce(o_orderkey, u_key) AS okey,
        |       ROUND(coalesce(u_price, o_totalprice), 2) AS price,
        |       coalesce(u_status, o_orderstatus) AS status
        |FROM snap FULL OUTER JOIN upd ON o_orderkey = u_key
        |ORDER BY okey""".stripMargin,

    "q_heavy_hitters" ->
      """WITH cnt AS (SELECT l_partkey, count(*) AS cnt FROM lineitem GROUP BY 1),
        |total AS (SELECT count(*) AS total FROM lineitem)
        |SELECT rank, l_partkey, cnt,
        |       ROUND(CAST(cnt AS DOUBLE) / total, 6) AS share
        |FROM (SELECT l_partkey, cnt, total,
        |             row_number() OVER (ORDER BY cnt DESC, l_partkey) AS rank
        |      FROM cnt, total)
        |WHERE rank <= 10 ORDER BY rank""".stripMargin,

    "q_topk_per_key" ->
      """SELECT o_custkey, o_orderkey, o_totalprice
        |FROM (SELECT o_custkey, o_orderkey, o_totalprice,
        |             row_number() OVER (PARTITION BY o_custkey
        |                                ORDER BY o_totalprice DESC, o_orderkey) AS rn
        |      FROM orders)
        |WHERE rn <= 3
        |ORDER BY o_custkey, o_totalprice DESC, o_orderkey""".stripMargin,

    "q_heavy_hitters_grouped" ->
      """SELECT l_returnflag, CAST(rank AS INT) AS rank, l_partkey, cnt
        |FROM (SELECT l_returnflag, l_partkey, count(*) AS cnt,
        |             row_number() OVER (PARTITION BY l_returnflag
        |                                ORDER BY count(*) DESC, l_partkey) AS rank
        |      FROM lineitem GROUP BY 1, 2)
        |WHERE rank <= 5 ORDER BY 1, 2""".stripMargin,

    "q_sample_k_per_group" ->
      """SELECT o_custkey, o_orderkey
        |FROM (SELECT o_custkey, o_orderkey,
        |             row_number() OVER (PARTITION BY o_custkey
        |               ORDER BY (o_orderkey * 1103515245 + 12345) % 2147483648, o_orderkey) AS rn
        |      FROM orders)
        |WHERE rn <= 5
        |ORDER BY o_custkey, o_orderkey""".stripMargin,

    "q_sample_hash" ->
      """SELECT o_orderstatus, COUNT(*) AS n,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(22,6))) AS DOUBLE) AS revenue
        |FROM orders
        |WHERE (o_orderkey * 1103515245 + 12345) % 2147483648 % 100 < 10
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    "q_sample_stratified" ->
      """SELECT label, count(*) AS n_sampled,
        |       min(vec_id) AS first_id, max(vec_id) AS last_id
        |FROM (SELECT label, vec_id,
        |             (vec_id * 1103515245 + 12345) % 2147483648 % 100 AS pct
        |      FROM embeddings)
        |WHERE (label % 2 = 0 AND pct < 20) OR (label % 2 = 1 AND pct < 40)
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    "q_sort_multikey" ->
      """SELECT l_returnflag, strftime(l_shipdate, '%Y-%m-%d') AS ship, l_orderkey, l_linenumber
        |FROM lineitem
        |ORDER BY l_returnflag, ship DESC, l_orderkey, l_linenumber
        |LIMIT 100""".stripMargin,

    "q_topk_global" ->
      s"""SELECT o_custkey, ${sqlMoneySum("o_totalprice")} AS revenue
         |FROM orders GROUP BY 1
         |ORDER BY revenue DESC, o_custkey LIMIT 10""".stripMargin,

    "q_subquery_scalar" ->
      """SELECT p_partkey, p_retailprice
        |FROM part
        |WHERE p_retailprice > (SELECT CAST(SUM(CAST(p_retailprice AS DECIMAL(22,6))) AS DOUBLE)
        |                              / COUNT(*) FROM part)
        |ORDER BY p_partkey""".stripMargin,

    "q_subquery_correlated" ->
      """SELECT o_orderkey, o_custkey, o_totalprice
        |FROM orders o
        |WHERE o_totalprice > (SELECT CAST(SUM(CAST(o2.o_totalprice AS DECIMAL(22,6))) AS DOUBLE)
        |                             / COUNT(*)
        |                      FROM orders o2 WHERE o2.o_custkey = o.o_custkey)
        |ORDER BY o_orderkey""".stripMargin,

    "q_pivot" ->
      """SELECT user_id,
        |  CAST(COUNT(*) FILTER (event_type = 'view') AS BIGINT) AS view,
        |  CAST(COUNT(*) FILTER (event_type = 'click') AS BIGINT) AS click,
        |  CAST(COUNT(*) FILTER (event_type = 'purchase') AS BIGINT) AS purchase,
        |  CAST(COUNT(*) FILTER (event_type = 'signup') AS BIGINT) AS signup,
        |  CAST(COUNT(*) FILTER (event_type = 'error') AS BIGINT) AS error
        |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin,

    "q_unpivot" ->
      """SELECT p_partkey, measure, value
        |FROM (SELECT p_partkey, p_retailprice, CAST(p_size AS DOUBLE) AS p_size FROM part)
        |UNPIVOT (value FOR measure IN (p_retailprice, p_size))
        |ORDER BY p_partkey, measure""".stripMargin,

    "q_agg_argmax" ->
      """SELECT o_orderstatus,
        |  (max(struct_pack(p := o_totalprice, k := o_orderkey))).k AS max_key,
        |  (min(struct_pack(p := o_totalprice, k := o_orderkey))).k AS min_key,
        |  ROUND(max(o_totalprice), 4) AS max_price
        |FROM orders GROUP BY 1 ORDER BY 1""".stripMargin,

    "q_set_union" ->
      """SELECT c_nationkey AS nationkey FROM customer
        |UNION
        |SELECT s_nationkey FROM supplier
        |ORDER BY 1""".stripMargin,

    "q_set_intersect" ->
      """SELECT l_partkey AS partkey FROM lineitem
        |INTERSECT
        |SELECT p_partkey FROM part WHERE p_size <= 25
        |ORDER BY 1""".stripMargin,

    "q_set_except" ->
      """SELECT p_partkey AS partkey FROM part WHERE p_size <= 10
        |EXCEPT
        |SELECT l_partkey FROM lineitem WHERE l_quantity > 45
        |ORDER BY 1""".stripMargin,

    "q_set_except_all" ->
      """SELECT * FROM (
        |  SELECT l_partkey AS partkey FROM lineitem WHERE l_quantity <= 3
        |  EXCEPT ALL
        |  SELECT l_partkey FROM lineitem WHERE l_quantity >= 48)
        |ORDER BY 1""".stripMargin,

    "q_set_intersect_all" ->
      """SELECT * FROM (
        |  SELECT l_partkey AS partkey FROM lineitem WHERE l_quantity <= 3
        |  INTERSECT ALL
        |  SELECT l_partkey FROM lineitem WHERE l_returnflag = 'R')
        |ORDER BY 1""".stripMargin,

    "q_histogram" ->
      """WITH bounds AS (SELECT min(o_totalprice) AS lo, max(o_totalprice) AS hi FROM orders)
        |SELECT CASE WHEN hi = lo THEN 0
        |            ELSE least(CAST(floor((o_totalprice - lo) / ((hi - lo) / 12.0)) AS BIGINT), 11) END AS bin,
        |       count(*) AS n,
        |       ROUND(min(o_totalprice), 4) AS bin_min,
        |       ROUND(max(o_totalprice), 4) AS bin_max
        |FROM orders, bounds
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    "q_agg_mode" ->
      """SELECT l_returnflag, mode_qty, freq FROM (
        |  SELECT l_returnflag, l_quantity AS mode_qty, freq,
        |         row_number() OVER (PARTITION BY l_returnflag
        |                            ORDER BY freq DESC, l_quantity) AS rn
        |  FROM (SELECT l_returnflag, l_quantity, count(*) AS freq
        |        FROM lineitem GROUP BY 1, 2))
        |WHERE rn = 1 ORDER BY l_returnflag""".stripMargin,

    "q_join_interval_overlap" ->
      """WITH cust AS (
        |  SELECT o_custkey, min(CAST(o_orderdate AS DATE)) AS c0,
        |         min(CAST(o_orderdate AS DATE)) + 30 AS c1
        |  FROM orders GROUP BY 1),
        |promos AS (
        |  SELECT p0, p0 + 9 AS p1 FROM (
        |    SELECT DISTINCT CAST(date_trunc('month', o_orderdate) AS DATE) AS p0
        |    FROM orders))
        |SELECT strftime(p0, '%Y-%m-%d') AS promo_start,
        |       strftime(p1, '%Y-%m-%d') AS promo_end,
        |       count(*) AS n_active, min(o_custkey) AS first_cust
        |FROM cust JOIN promos ON c0 <= p1 AND p0 <= c1
        |GROUP BY p0, p1 ORDER BY 1""".stripMargin,
  )
}
