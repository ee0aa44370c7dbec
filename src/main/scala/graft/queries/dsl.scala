package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Determinism helpers shared by every query.
  *
  * Results are hash-compared against DuckDB, so floating point must be
  * bit-identical:
  *  - Sums of money-like doubles go through DECIMAL: per-value cast defines
  *    4-dp semantics, accumulation is integer-exact (order-independent, so
  *    identical under any partitioning / partial-agg schedule), and the final
  *    cast back to double is exact while the sum has <= 15 significant digits.
  *    At 100 TB widen to DECIMAL(28,4) — the pattern is unchanged.
  *  - Averages are written as exact-sum / count explicitly (never avg()), so
  *    both engines divide the same two numbers.
  *  - Dates/timestamps are emitted as formatted strings (parquet timestamp
  *    micros vs DuckDB timestamp_ns would otherwise hash apart).
  */
object dsl {
  type Q = (SparkSession, String) => DataFrame

  /** Exact, order-independent sum of a double expression at 6-dp semantics. */
  def moneySum(c: Column): Column = sum(c.cast("decimal(22,6)")).cast("double")

  /** Mean via exact decimal sum / count, rounded to 4 dp. */
  def dmean(c: Column): Column =
    round(sum(c.cast("decimal(22,6)")).cast("double") / count(lit(1)), 4)

  /** Date-only string of a timestamp column (matches strftime '%Y-%m-%d'). */
  def dstr(c: Column): Column = date_format(c, "yyyy-MM-dd")

  /** Second-precision timestamp string (matches '%Y-%m-%d %H:%M:%S'). */
  def tstr(c: Column): Column = date_format(c, "yyyy-MM-dd HH:mm:ss")

  /** Oracle-side fragment mirroring [[moneySum]]. */
  def sqlMoneySum(expr: String): String =
    s"CAST(SUM(CAST(($expr) AS DECIMAL(22,6))) AS DOUBLE)"

  /** Oracle-side fragment mirroring [[dmean]]. */
  def sqlMean(expr: String): String =
    s"ROUND(${sqlMoneySum(expr)} / COUNT(*), 4)"
}
