package graft.plans

import org.apache.spark.SparkEnv
import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, Expression, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.codegen.GenerateOrdering
import org.apache.spark.sql.catalyst.optimizer.NormalizeNaNAndZero
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode, UnsafeExternalRowSorter}
import org.apache.spark.util.collection.unsafe.sort.PrefixComparator

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
  * `withTies = true` implements the `rank() <= k` semantics instead of
  * row_number's: every row whose sort key equals the k-th best row's key
  * is kept. That row SET is fully determined by the sort keys — no
  * arbitrary tie winner exists at all — so the rank rewrite is sound
  * under ANY order, total or not. Memory: the heap stays k-bounded and
  * only k-th-key ties buffer beyond it (exactly the rows the semantics
  * obligate the operator to return).
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
    withTies: Boolean,
    child: LogicalPlan) extends UnaryNode {
  require(k > 0, s"k must be positive, got $k")
  override def output: Seq[Attribute] = child.output
  override protected def withNewChildInternal(newChild: LogicalPlan): TopKPerKey =
    copy(child = newChild)
}

object TopKPerKey {
  /** Per-partition distinct-key ceiling for the in-memory heap path of
    * [[TopKPerKeyExec]]; past it the partition degrades to Spark's
    * spillable external sorter (same result, memory-safe). */
  val MaxKeysKey = "spark.graft.topKPerKey.maxKeysPerPartition"

  /** Per-key ceiling on the withTies buffer: rank() semantics can
    * obligate unbounded tying rows (a low-cardinality sort key), and the
    * buffer is plain JVM heap — past this, the partition flips to the
    * spillable sorter, which streams ties off the sorted run instead of
    * holding them. */
  val MaxTiesKey = "spark.graft.topKPerKey.maxTiesPerKey"

  /** -0.0 -> 0.0 and NaN -> canonical NaN for top-level float/double key
    * expressions, so byte equality (hash-map keys, spill-path group
    * detection) coincides with ordering equality and with the Window
    * semantics the rank rewrite replaces. Nested float keys (array/struct
    * of float) are left as-is — they are not hash-map keys anywhere in
    * this repo's call sites, and UnsafeWriter already canonicalizes NaN
    * bits on write. */
  private[plans] def normalizeFloatKey(e: Expression): Expression = e.dataType match {
    case org.apache.spark.sql.types.FloatType |
         org.apache.spark.sql.types.DoubleType => NormalizeNaNAndZero(e)
    case _ => e
  }

  /** Per-key retained state: the k-best heap plus (withTies only) the
    * buffer of rows tying the current k-th best. */
  private[plans] final class KeyState(cap: Int, cmp: java.util.Comparator[InternalRow]) {
    val heap = new java.util.PriorityQueue[InternalRow](cap, cmp)
    var ties: java.util.ArrayList[InternalRow] = null
    def addTie(row: InternalRow): Unit = {
      if (ties == null) ties = new java.util.ArrayList[InternalRow](4)
      ties.add(row)
    }
    def clearTies(): Unit = if (ties != null) ties.clear()
    def size: Int = heap.size + (if (ties == null) 0 else ties.size)
  }

  /** Lazily drain the per-key states: each key's rows emit best-first
    * (ties of the k-th key last), never materializing more than one key's
    * rows at a time (the old one-big-ArrayBuffer emission pinned a second
    * copy of the entire output). */
  private[plans] def drainHeaps(
      heaps: java.util.HashMap[UnsafeRow, KeyState]): Iterator[InternalRow] = {
    val keyIt = heaps.values().iterator()
    new Iterator[InternalRow] {
      private var cur: Array[InternalRow] = null
      private var i = 0
      override def hasNext: Boolean = {
        while ((cur == null || i >= cur.length) && keyIt.hasNext) {
          val st = keyIt.next()
          val nTies = if (st.ties == null) 0 else st.ties.size
          val rows = new Array[InternalRow](st.heap.size + nTies)
          var j = st.heap.size - 1
          // heap drains worst-first; fill backwards to emit in order
          while (j >= 0) { rows(j) = st.heap.poll(); j -= 1 }
          var t = 0
          while (t < nTies) { rows(rows.length - nTies + t) = st.ties.get(t); t += 1 }
          cur = rows; i = 0
          keyIt.remove() // release the state as soon as it is drained
        }
        cur != null && i < cur.length
      }
      override def next(): InternalRow = { val r = cur(i); i += 1; r }
    }
  }

  /** Memory-safe fallback: (key, order)-sort ALL buffered + remaining rows
    * through Spark's spillable UnsafeExternalRowSorter, then stream the
    * first k rows of each key group off the sorted iterator (plus k-th-key
    * ties when withTies). Identical output set to the heap path (modulo
    * cross-key emission order, which the operator does not promise). */
  private[plans] def sortedGroupLimit(
      rest: Iterator[InternalRow],
      heaps: java.util.HashMap[UnsafeRow, KeyState],
      keyExprs: Seq[Expression],
      order: Seq[SortOrder],
      limit: Int,
      withTies: Boolean,
      childOutput: Seq[Attribute],
      childSchema: org.apache.spark.sql.types.StructType): Iterator[InternalRow] = {
    val fullOrder = keyExprs.map(SortOrder(_, Ascending)) ++ order
    val ordering = GenerateOrdering.generate(fullOrder, childOutput)
    // constant prefix: every comparison falls through to the full row
    // ordering (radix off) — correctness over the last 20% of sort speed,
    // and this path only runs once a partition is already degenerate
    val prefixComparator = new PrefixComparator {
      override def compare(a: Long, b: Long): Int = 0
    }
    val prefixComputer = new UnsafeExternalRowSorter.PrefixComputer {
      private val p = new UnsafeExternalRowSorter.PrefixComputer.Prefix
      override def computePrefix(row: InternalRow): UnsafeExternalRowSorter.PrefixComputer.Prefix = {
        p.isNull = false; p.value = 0L; p
      }
    }
    val sorter = UnsafeExternalRowSorter.create(
      childSchema, ordering, prefixComparator, prefixComputer,
      SparkEnv.get.memoryManager.pageSizeBytes, false)
    val toUnsafe = UnsafeProjection.create(childOutput, childOutput)
    def insert(row: InternalRow): Unit = row match {
      case u: UnsafeRow => sorter.insertRow(u) // insertRow copies into sort pages
      case r => sorter.insertRow(toUnsafe(r))
    }
    val stateIt = heaps.values().iterator()
    while (stateIt.hasNext) {
      val st = stateIt.next()
      while (st.heap.size > 0) insert(st.heap.poll())
      if (st.ties != null) { st.ties.forEach(insert(_)); st.ties.clear() }
      stateIt.remove()
    }
    while (rest.hasNext) insert(rest.next())
    val sorted = sorter.sort()
    val keyProj = UnsafeProjection.create(keyExprs, childOutput)
    val orderOnly = GenerateOrdering.generate(order, childOutput)
    new Iterator[InternalRow] {
      private var curKey: UnsafeRow = null
      private var taken = 0
      private var kthRow: InternalRow = null // copy of the group's k-th row
      private var pending: InternalRow = null
      private def advance(): Unit = {
        while (pending == null && sorted.hasNext) {
          val row = sorted.next()
          val key = keyProj(row)
          if (curKey == null || !curKey.equals(key)) {
            curKey = key.copy(); taken = 0; kthRow = null
          }
          if (taken < limit) {
            taken += 1
            if (withTies && taken == limit) kthRow = row.copy()
            pending = row
          } else if (withTies && kthRow != null &&
                     orderOnly.compare(row, kthRow) == 0) {
            pending = row // a rank tie of the k-th row (sorted -> contiguous)
          }
        }
      }
      override def hasNext: Boolean = { advance(); pending != null }
      override def next(): InternalRow = {
        advance(); val r = pending; pending = null; r
      }
    }
  }
}

case class TopKPerKeyExec(
    keys: Seq[Expression],
    order: Seq[SortOrder],
    k: Int,
    withTies: Boolean,
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
    val ties = withTies
    val childOutput = child.output
    val childSchema = child.schema
    // Past this many distinct keys in one partition the heap map stops
    // being "bounded by k" in any useful sense (keys x k rows pinned on
    // heap, no spill path) — hand the partition to Spark's spillable
    // external sorter instead. Sized so the default only fires where the
    // window plan would have been the right call anyway.
    val maxKeysInMemory = conf.getConfString(
      TopKPerKey.MaxKeysKey, (1 << 20).toString).toInt
    val maxTiesPerKey = conf.getConfString(
      TopKPerKey.MaxTiesKey, (1 << 13).toString).toInt
    child.execute().mapPartitions({ iter =>
      val keyProj = UnsafeProjection.create(keyExprs, childOutput)
      // generated comparator: row "a before b" in the requested order
      // compares negative; the max-heap then keeps the WORST retained row
      // at its head, so admission is one compare against the head
      val ordering = GenerateOrdering.generate(sortOrder, childOutput)
      val reversed = ordering.reversed() // java PQ head = LEAST -> reverse
      val heaps = new java.util.HashMap[UnsafeRow, TopKPerKey.KeyState]()
      // the row whose NEW key would push the map past the threshold; its
      // arrival flips the partition to the spillable sorter path. A ties
      // buffer past its own ceiling flips the same way (the row is already
      // buffered, so no carry row is needed).
      var overflowRow: InternalRow = null
      var tiesOverflow = false
      while (iter.hasNext && overflowRow == null && !tiesOverflow) {
        val row = iter.next()
        val key = keyProj(row)
        var st = heaps.get(key)
        if (st == null && heaps.size >= maxKeysInMemory) {
          overflowRow = row.copy()
        } else {
          if (st == null) {
            st = new TopKPerKey.KeyState(limit, reversed)
            heaps.put(key.copy(), st)
          }
          if (st.heap.size < limit) st.heap.add(row.copy())
          else {
            val cmp = ordering.compare(row, st.heap.peek())
            if (cmp < 0) {
              val evicted = st.heap.poll()
              st.heap.add(row.copy())
              if (ties) {
                // the evicted row stays IF it still ties the new k-th best
                // (another equal row remains at the head); otherwise every
                // buffered tie of the old head is out of rank too
                if (ordering.compare(evicted, st.heap.peek()) == 0) st.addTie(evicted)
                else st.clearTies()
              }
            } else if (ties && cmp == 0) st.addTie(row.copy())
            if (ties && st.ties != null && st.ties.size > maxTiesPerKey)
              tiesOverflow = true
          }
        }
      }
      if (overflowRow == null && !tiesOverflow) TopKPerKey.drainHeaps(heaps)
      else TopKPerKey.sortedGroupLimit(
        Option(overflowRow).iterator ++ iter, heaps, keyExprs, sortOrder,
        limit, ties, childOutput, childSchema)
    }, preservesPartitioning = true)
  }

  override protected def withNewChildInternal(newChild: SparkPlan): TopKPerKeyExec =
    copy(child = newChild)
}

object TopKPerKeyStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case TopKPerKey(keys, order, k, withTies, child) =>
      // rebuild the SortOrder nodes: ones converted from public Column
      // values carry a TreeNode tag referencing the non-serializable
      // internal ColumnNode, which would poison the task closure
      val cleanOrder = order.map(so =>
        SortOrder(so.child, so.direction, so.nullOrdering, Seq.empty))
      // Floating-point keys must be normalized (-0.0 -> 0.0, NaN -> the
      // canonical NaN) exactly as NormalizeFloatingNumbers does for Window
      // partition specs — this custom node is never visited by that rule
      // (its normalize() is private[sql]; NormalizeNaNAndZero, the
      // expression it plants for top-level float/double, is public).
      // Without it the heap path's byte-keyed hash map and the spill
      // path's byte-equality group detection both split ordering-equal
      // keys, emitting up to k rows per bit pattern instead of per key.
      val cleanKeys = keys.map(TopKPerKey.normalizeFloatKey)
      TopKPerKeyExec(cleanKeys, cleanOrder, k, withTies, planLater(child)) :: Nil
    case _ => Nil
  }
}
