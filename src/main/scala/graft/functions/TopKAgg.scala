package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, Literal, GenericInternalRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Approximate heavy hitters as a native Catalyst aggregate:
  * `graft_topk(key, k, capacity)` returns `array<struct<key:long,
  * cnt:long>>` — the top-k keys by estimated frequency from a
  * Misra-Gries summary of at most `capacity` counters.
  *
  * Why this exists: finding the hot keys IS the 100 TB pre-step for every
  * skew mitigation in this engine (ScaleJoins.dropHotKeys / saltedJoin
  * pick their targets from exactly this profile), and the exact
  * groupBy-count ranking it replaces shuffles one row per distinct key —
  * at billions of keys that is itself the bottleneck. The MG summary is
  * one bounded buffer per partition, mergeable (Agarwal et al.,
  * "Mergeable Summaries", PODS 2012: combine counters, subtract the
  * (capacity+1)-th largest, drop non-positive), so partial aggregation
  * ships `capacity` counters per partition instead of the key universe.
  *
  * Guarantees (suite-pinned): every key with true count > N/capacity is
  * present, and each reported count is an UNDER-estimate by at most
  * N/capacity (N = rows seen). When `capacity` >= distinct keys, nothing
  * is ever evicted and counts are exact — then the result is also
  * partition-invariant (merge = counter addition, commutative); under
  * eviction the estimates may depend on the merge schedule, which is the
  * documented price of boundedness (the error bound itself always holds).
  */
/** MG counter table + a sticky eviction flag: once any update/merge step
  * evicts or decrements, counts MAY be under-estimates — the flag is what
  * lets `graft_topk_exact` turn "silently approximate" into a loud error. */
final class MgSummary(initialCapacity: Int) {
  val map = new java.util.HashMap[Long, Long](initialCapacity)
  var evicted: Boolean = false
}

case class TopKAgg(
    child: Expression,
    k: Int,
    capacity: Int,
    requireExact: Boolean = false,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[MgSummary] {

  require(k > 0, s"k must be positive, got $k")
  require(capacity >= k && capacity <= (1 << 20),
    s"capacity must be in [k, 2^20], got $capacity")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("key", LongType, nullable = false),
    StructField("cnt", LongType, nullable = false))), containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == LongType || child.dataType == IntegerType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_topk expects an integral key column, got ${child.dataType.sql}")

  override def createAggregationBuffer(): MgSummary = new MgSummary(capacity * 2)

  /** Classic MG step: hit increments; miss inserts if below capacity,
    * otherwise decrements every counter (dropping zeros) — the "charge one
    * of each" move that yields the N/capacity error bound. */
  override def update(buf: MgSummary, input: InternalRow): MgSummary = {
    val v = child.eval(input)
    if (v != null) {
      val key = v match {
        case l: java.lang.Long => l.longValue()
        case i: java.lang.Integer => i.longValue()
      }
      val m = buf.map
      val cur = m.getOrDefault(key, 0L) // counters are never stored at 0
      if (cur != 0L) m.put(key, cur + 1)
      else if (m.size < capacity) m.put(key, 1L)
      else {
        buf.evicted = true // decrement-all: counts are under-estimates now
        val it = m.entrySet().iterator()
        while (it.hasNext) {
          val e = it.next()
          if (e.getValue == 1L) it.remove() else e.setValue(e.getValue - 1)
        }
      }
    }
    buf
  }

  /** Mergeable-summaries rule: add counters, then if over capacity subtract
    * the (capacity+1)-th largest value and drop non-positive counters. */
  override def merge(buf: MgSummary, other: MgSummary): MgSummary = {
    buf.evicted ||= other.evicted
    val m = buf.map
    other.map.forEach { (key, cnt) =>
      m.put(key, m.getOrDefault(key, 0L) + cnt)
    }
    if (m.size > capacity) {
      buf.evicted = true
      val counts = new Array[Long](m.size)
      var i = 0
      val it = m.values().iterator()
      while (it.hasNext) { counts(i) = it.next(); i += 1 }
      java.util.Arrays.sort(counts)
      val t = counts(m.size - capacity - 1) // (capacity+1)-th largest
      val eit = m.entrySet().iterator()
      while (eit.hasNext) {
        val e = eit.next()
        if (e.getValue <= t) eit.remove() else e.setValue(e.getValue - t)
      }
    }
    buf
  }

  override def eval(buf: MgSummary): Any = {
    if (requireExact && buf.evicted) throw new IllegalStateException(
      s"graft_topk_exact: capacity $capacity exceeded by the key universe - " +
        "MG eviction occurred and counts would be approximate (merge-schedule-" +
        "dependent). Raise capacity or switch to graft_topk (documented sketch).")
    val entries = new Array[(Long, Long)](buf.map.size)
    var i = 0
    val it = buf.map.entrySet().iterator()
    while (it.hasNext) { val e = it.next(); entries(i) = (e.getKey, e.getValue); i += 1 }
    // count desc, key asc — deterministic for a given counter multiset
    val top = entries.sortBy { case (key, cnt) => (-cnt, key) }.take(k)
    new GenericArrayData(top.map { case (key, cnt) =>
      new GenericInternalRow(Array[Any](key, cnt))
    })
  }

  override def serialize(buf: MgSummary): Array[Byte] = {
    val bb = ByteBuffer.allocate(5 + 16 * buf.map.size)
    bb.put(if (buf.evicted) 1.toByte else 0.toByte)
    bb.putInt(buf.map.size)
    buf.map.forEach { (key, cnt) => bb.putLong(key); bb.putLong(cnt) }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): MgSummary = {
    val bb = ByteBuffer.wrap(bytes)
    val s = new MgSummary(capacity * 2)
    s.evicted = bb.get() == 1.toByte
    val n = bb.getInt
    var i = 0
    while (i < n) { s.map.put(bb.getLong, bb.getLong); i += 1 }
    s
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): TopKAgg =
    copy(child = newChildren.head)
}

object TopKAgg {
  /** Build from SQL-call arguments: graft_topk(key, k, capacity) or (exact)
    * graft_topk_exact(key, k, capacity). `fnName` is the registered name
    * the user actually called, threaded into every validation message so
    * graft_topk_exact errors don't misdirect to graft_topk. */
  def fromArgs(exprs: Seq[Expression], requireExact: Boolean = false): TopKAgg = {
    val fnName = if (requireExact) "graft_topk_exact" else "graft_topk"
    require(exprs.size == 3,
      s"$fnName(key, k, capacity) takes 3 args, got ${exprs.size}")
    def intLit(e: Expression, name: String): Int = e match {
      case Literal(v: Int, IntegerType) => v
      case other => throw new IllegalArgumentException(
        s"$fnName $name must be an integer literal, got $other")
    }
    TopKAgg(exprs.head, intLit(exprs(1), "k"), intLit(exprs(2), "capacity"),
      requireExact = requireExact)
  }
}
