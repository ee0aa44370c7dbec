package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables
import dsl._

/** Window functions. All frames are written explicitly (ROWS ...) so Spark
  * and DuckDB agree; running/moving sums accumulate in DECIMAL so sliding-
  * window implementation tricks (segment trees, add/subtract) cannot change
  * the result. Window state is bounded per partition key — at 100 TB these
  * shuffle once on the partition key and stream within each partition.
  */
object Windows {

  val queries: Map[String, Q] = Map(

    "q_window_rank" -> ((s, d) => {
      val w = Window.partitionBy("o_custkey")
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      Tables(s, d, "orders")
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 3)
        .select("o_custkey", "rn", "o_orderkey", "o_totalprice")
        .orderBy("o_custkey", "rn")
    }),

    "q_window_running" -> ((s, d) => {
      val w = Window.partitionBy("o_custkey")
        .orderBy(col("o_orderdate"), col("o_orderkey"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      Tables(s, d, "orders")
        .select(col("o_custkey"), col("o_orderkey"), dstr(col("o_orderdate")).as("od"),
          sum(col("o_totalprice").cast("decimal(22,6)")).over(w).cast("double").as("running_rev"))
        .orderBy("o_custkey", "o_orderkey")
    }),

    "q_window_lag_lead" -> ((s, d) => {
      val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
      Tables(s, d, "events")
        .select(col("event_id"), col("user_id"),
          (unix_micros(col("ts")) - lag(unix_micros(col("ts")), 1).over(w)).as("dt_us"),
          lead(col("event_type"), 1).over(w).as("next_type"))
        .orderBy("event_id")
    }),

    "q_window_moving_avg" -> ((s, d) => {
      val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
        .rowsBetween(-2, Window.currentRow)
      Tables(s, d, "events")
        .select(col("event_id"),
          round(sum(col("value").cast("decimal(22,6)")).over(w).cast("double") /
            count(lit(1)).over(w), 4).as("mavg"))
        .orderBy("event_id")
    }),

    // Time-RANGE frame: per-user sum of value over the trailing 10 minutes.
    // Spark's rangeBetween is numeric-only, so the ordering key is epoch
    // micros; the DuckDB oracle uses the equivalent numeric range frame.
    "q_window_range_time" -> ((s, d) => {
      val w = Window.partitionBy("user_id").orderBy(col("us"))
        .rangeBetween(-600000000L, 0L) // 10 min in micros
      Tables(s, d, "events")
        .select(col("event_id"), col("user_id"), unix_micros(col("ts")).as("us"),
          col("value"))
        .select(col("event_id"),
          sum(col("value").cast("decimal(22,6)")).over(w).cast("double").as("sum_10m"),
          count(lit(1)).over(w).as("n_10m"))
        .orderBy("event_id")
    }),

    "q_window_ntile_analytic" -> ((s, d) => {
      val wo = Window.partitionBy("c_mktsegment")
        .orderBy(col("c_acctbal").desc, col("c_custkey"))
      val wf = wo.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
      Tables(s, d, "customer")
        .select(col("c_custkey"), col("c_mktsegment"),
          ntile(4).over(wo).as("quartile"),
          first(col("c_custkey")).over(wf).as("richest"),
          last(col("c_custkey")).over(wf).as("poorest"))
        .orderBy("c_custkey")
    }),

    // Positional analytics over the FULL partition frame: first/last/nth
    // order per customer by date. nth_value(2) is null for single-order
    // customers — both engines agree on the null.
    "q_window_first_last" -> ((s, d) => {
      val wo = Window.partitionBy("o_custkey")
        .orderBy(col("o_orderdate"), col("o_orderkey"))
      val wf = wo.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
      Tables(s, d, "orders")
        .select(col("o_custkey"), col("o_orderkey"),
          first(col("o_orderkey")).over(wf).as("first_order"),
          nth_value(col("o_orderkey"), 2).over(wf).as("second_order"),
          last(col("o_orderkey")).over(wf).as("last_order"))
        .orderBy("o_custkey", "o_orderkey")
    }),

    // Relative-rank analytics: percent_rank = (rank-1)/(n-1) and
    // cume_dist = peers<=current / n are the SAME division in both engines
    // (identical ints -> identical ieee754 quotient); round(6) is belt-and-
    // braces only.
    "q_window_percent_rank" -> ((s, d) => {
      val wo = Window.partitionBy("c_mktsegment")
        .orderBy(col("c_acctbal"), col("c_custkey"))
      Tables(s, d, "customer")
        .select(col("c_custkey"), col("c_mktsegment"),
          round(percent_rank().over(wo), 6).as("pct_rank"),
          round(cume_dist().over(wo), 6).as("cume"))
        .orderBy("c_custkey")
    }),
  )

  val oracles: Map[String, String] = Map(
    "q_window_first_last" ->
      """SELECT o_custkey, o_orderkey,
        |  first_value(o_orderkey) OVER wf AS first_order,
        |  nth_value(o_orderkey, 2) OVER wf AS second_order,
        |  last_value(o_orderkey) OVER wf AS last_order
        |FROM orders
        |WINDOW wf AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
        |              ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
        |ORDER BY o_custkey, o_orderkey""".stripMargin,

    "q_window_percent_rank" ->
      """SELECT c_custkey, c_mktsegment,
        |  ROUND(percent_rank() OVER wo, 6) AS pct_rank,
        |  ROUND(cume_dist() OVER wo, 6) AS cume
        |FROM customer
        |WINDOW wo AS (PARTITION BY c_mktsegment ORDER BY c_acctbal, c_custkey)
        |ORDER BY c_custkey""".stripMargin,

    "q_window_rank" ->
      """SELECT o_custkey, rn, o_orderkey, o_totalprice FROM (
        |  SELECT o_custkey, o_orderkey, o_totalprice,
        |         row_number() OVER (PARTITION BY o_custkey
        |                            ORDER BY o_totalprice DESC, o_orderkey) AS rn
        |  FROM orders
        |) WHERE rn <= 3 ORDER BY o_custkey, rn""".stripMargin,

    "q_window_running" ->
      """SELECT o_custkey, o_orderkey, strftime(o_orderdate, '%Y-%m-%d') AS od,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(22,6))) OVER (
        |    PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_rev
        |FROM orders ORDER BY o_custkey, o_orderkey""".stripMargin,

    "q_window_lag_lead" ->
      """SELECT event_id, user_id,
        |  epoch_us(CAST(ts AS TIMESTAMP)) - lag(epoch_us(CAST(ts AS TIMESTAMP)), 1) OVER w AS dt_us,
        |  lead(event_type, 1) OVER w AS next_type
        |FROM events
        |WINDOW w AS (PARTITION BY user_id ORDER BY CAST(ts AS TIMESTAMP), event_id)
        |ORDER BY event_id""".stripMargin,

    "q_window_moving_avg" ->
      """SELECT event_id,
        |  ROUND(CAST(SUM(CAST(value AS DECIMAL(22,6))) OVER w AS DOUBLE)
        |        / COUNT(*) OVER w, 4) AS mavg
        |FROM events
        |WINDOW w AS (PARTITION BY user_id ORDER BY CAST(ts AS TIMESTAMP), event_id
        |             ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)
        |ORDER BY event_id""".stripMargin,

    "q_window_range_time" ->
      """SELECT event_id,
        |  CAST(SUM(CAST(value AS DECIMAL(22,6))) OVER w AS DOUBLE) AS sum_10m,
        |  COUNT(*) OVER w AS n_10m
        |FROM (SELECT event_id, user_id, epoch_us(CAST(ts AS TIMESTAMP)) AS us, value FROM events)
        |WINDOW w AS (PARTITION BY user_id ORDER BY us
        |             RANGE BETWEEN 600000000 PRECEDING AND CURRENT ROW)
        |ORDER BY event_id""".stripMargin,

    "q_window_ntile_analytic" ->
      """SELECT c_custkey, c_mktsegment,
        |  ntile(4) OVER wo AS quartile,
        |  first_value(c_custkey) OVER wf AS richest,
        |  last_value(c_custkey) OVER wf AS poorest
        |FROM customer
        |WINDOW wo AS (PARTITION BY c_mktsegment ORDER BY c_acctbal DESC, c_custkey),
        |       wf AS (PARTITION BY c_mktsegment ORDER BY c_acctbal DESC, c_custkey
        |              ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
        |ORDER BY c_custkey""".stripMargin,
  )
}
