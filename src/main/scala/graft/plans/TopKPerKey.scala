package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, Expression, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.codegen.GenerateOrdering
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}

/** Whole-operator custom plan: top-k rows PER KEY by a sort order — the
  * group-wise limit every "latest n per user" / "best n per cluster"
  * query needs.
  *
  * Why a custom operator instead of the window form
  * (`row_number().over(partitionBy(key).orderBy(o)) <= k`): WindowExec
  * must SORT each key's entire row set before numbering — at 100 TB
  * that is a full sort of the fact table just to discard all but k rows
  * per key. This operator keeps a bounded k-row heap per key inside one
  * pass over the exchange output: same single hash shuffle, no sort at
  * all, memory O(keys-per-partition × k) instead of spill-prone
  * sort runs. (Spark's own TakeOrderedAndProjectExec is this exact
  * design for the GLOBAL top-k; this is the per-key generalization.)
  *
  * Architecture note (SURVEY §2's preference ladder, rung c): logical
  * node + strategy + exec node, injected via GraftExtensions'
  * injectPlannerStrategy — the operator composes with Catalyst rather
  * than bypassing it: EnsureRequirements plants the hash exchange from
  * `requiredChildDistribution`, column pruning still reaches the scan
  * below, and the node participates in AQE like any exec node.
  */
case class TopKPerKey(
    keys: Seq[Expression],
    order: Seq[SortOrder],
    k: Int,
    child: LogicalPlan) extends UnaryNode {
  require(k > 0, s"k must be positive, got $k")
  override def output: Seq[Attribute] = child.output
  override protected def withNewChildInternal(newChild: LogicalPlan): TopKPerKey =
    copy(child = newChild)
}

case class TopKPerKeyExec(
    keys: Seq[Expression],
    order: Seq[SortOrder],
    k: Int,
    child: SparkPlan) extends UnaryExecNode {

  override def output: Seq[Attribute] = child.output

  /** All rows of a key must co-locate — EnsureRequirements inserts the
    * single hash exchange (or reuses an existing compatible one). */
  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(keys) :: Nil

  override def outputPartitioning: Partitioning = child.outputPartitioning

  override protected def doExecute(): RDD[InternalRow] = {
    val keyExprs = keys
    val sortOrder = order
    val limit = k
    val childOutput = child.output
    child.execute().mapPartitions({ iter =>
      val keyProj = UnsafeProjection.create(keyExprs, childOutput)
      // generated comparator: row "a before b" in the requested order
      // compares negative; the max-heap then keeps the WORST retained row
      // at its head, so admission is one compare against the head
      val ordering = GenerateOrdering.generate(sortOrder, childOutput)
      val heaps = new java.util.HashMap[UnsafeRow, java.util.PriorityQueue[InternalRow]]()
      while (iter.hasNext) {
        val row = iter.next()
        val key = keyProj(row)
        var heap = heaps.get(key)
        if (heap == null) {
          heap = new java.util.PriorityQueue[InternalRow](limit,
            ordering.reversed()) // java PQ head = LEAST of the comparator -> reverse
          heaps.put(key.copy(), heap)
        }
        if (heap.size < limit) heap.add(row.copy())
        else if (ordering.compare(row, heap.peek()) < 0) {
          heap.poll()
          heap.add(row.copy())
        }
      }
      val out = scala.collection.mutable.ArrayBuffer.empty[InternalRow]
      heaps.values().forEach { h =>
        val rows = new Array[InternalRow](h.size)
        var i = 0
        while (h.size > 0) { rows(i) = h.poll(); i += 1 }
        // heap drains worst-first; reverse emits each key's rows in order
        var j = rows.length - 1
        while (j >= 0) { out += rows(j); j -= 1 }
      }
      out.iterator
    }, preservesPartitioning = true)
  }

  override protected def withNewChildInternal(newChild: SparkPlan): TopKPerKeyExec =
    copy(child = newChild)
}

object TopKPerKeyStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case TopKPerKey(keys, order, k, child) =>
      // rebuild the SortOrder nodes: ones converted from public Column
      // values carry a TreeNode tag referencing the non-serializable
      // internal ColumnNode, which would poison the task closure
      val cleanOrder = order.map(so =>
        SortOrder(so.child, so.direction, so.nullOrdering, Seq.empty))
      TopKPerKeyExec(keys, cleanOrder, k, planLater(child)) :: Nil
    case _ => Nil
  }
}
