package graft.operators

import org.apache.spark.sql.{Column, DataFrame, GraftSqlBridge}
import org.apache.spark.sql.catalyst.expressions.{Ascending, SortOrder}

import graft.plans.TopKPerKey

/** Library API for the TopKPerKey custom operator (graft.plans): top-k
  * rows per key without sorting each key's full row set. Sessions must
  * carry `spark.sql.extensions=graft.plans.GraftExtensions` so the
  * planner strategy is installed (all graft sessions do).
  */
object GroupLimits {

  /** Top `k` rows per `keyCols` group in the order given by `order`
    * (e.g. `Seq(col("price").desc, col("id"))`). With `withTies = false`
    * (row_number semantics) ties must be broken by the order itself for
    * deterministic results — pass a unique final sort column, exactly as
    * you would for a window rank. `withTies = true` gives rank()<=k
    * semantics: all rows tying the k-th best are kept, a key-determined
    * set that is deterministic under any order. */
  def topKPerKey(df: DataFrame, keyCols: Seq[String], order: Seq[Column], k: Int,
                 withTies: Boolean = false): DataFrame = {
    val plan = df.queryExecution.analyzed
    // resolve like Spark does (case-insensitive by default), not by exact
    // string equality — topKPerKey(df, Seq("O_CUSTKEY"), ...) must work
    // wherever df("O_CUSTKEY") does. Exact name wins first (a frame with
    // both KEY and key must not silently group on the wrong one), and an
    // ambiguous case-variant set without an exact match errors like
    // Spark's own resolution would.
    val resolver = df.sparkSession.sessionState.analyzer.resolver
    val keyAttrs = keyCols.map { n =>
      plan.output.find(_.name == n).getOrElse {
        plan.output.filter(a => resolver(a.name, n)) match {
          case Seq(one) => one
          case Seq() => throw new IllegalArgumentException(
            s"key column '$n' not in ${plan.output.map(_.name).mkString(", ")}")
          case many => throw new IllegalArgumentException(
            s"key column '$n' is ambiguous among ${many.map(_.name).mkString(", ")}")
        }
      }
    }
    val sortOrder = order.map(c => GraftSqlBridge.expression(c) match {
      case so: SortOrder => so
      case e => SortOrder(e, Ascending)
    })
    GraftSqlBridge.ofRows(df.sparkSession, TopKPerKey(keyAttrs, sortOrder, k, withTies, plan))
  }
}
