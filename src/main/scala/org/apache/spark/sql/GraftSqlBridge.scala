package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** The one sanctioned reach into Spark's private[sql] surface: building a
  * DataFrame from a custom LogicalPlan (graft.plans.TopKPerKey) and
  * converting public Column values to Catalyst expressions. Spark's own
  * extension points cover functions/rules/strategies but offer no public
  * "wrap my logical node in a Dataset" call — every custom-operator
  * library ships exactly this bridge. Nothing else in graft lives outside
  * the public API.
  */
object GraftSqlBridge {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)

  /** Eager ColumnNode -> catalyst conversion. ExpressionUtils.expression
    * would wrap the node in a LAZY ColumnNodeExpression whose reference to
    * the internal node poisons task-closure serialization (and hides sort
    * direction from pattern matches); the converter yields the real
    * catalyst tree. */
  def expression(c: Column): Expression = classic.ColumnNodeToExpressionConverter(c.node)

  /** The reverse direction: wrap a catalyst Expression as a public
    * Column — for custom expressions that carry non-SQL state (e.g. a
    * PQ codebook object reference) and so cannot go through the
    * function registry. */
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
}
