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
case class TopKAgg(
    child: Expression,
    k: Int,
    capacity: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[java.util.HashMap[Long, Long]] {

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

  override def createAggregationBuffer(): java.util.HashMap[Long, Long] =
    new java.util.HashMap[Long, Long](capacity * 2)

  /** Classic MG step: hit increments; miss inserts if below capacity,
    * otherwise decrements every counter (dropping zeros) — the "charge one
    * of each" move that yields the N/capacity error bound. */
  override def update(buf: java.util.HashMap[Long, Long],
                      input: InternalRow): java.util.HashMap[Long, Long] = {
    val v = child.eval(input)
    if (v != null) {
      val key = v match {
        case l: java.lang.Long => l.longValue()
        case i: java.lang.Integer => i.longValue()
      }
      val cur = buf.getOrDefault(key, 0L) // counters are never stored at 0
      if (cur != 0L) buf.put(key, cur + 1)
      else if (buf.size < capacity) buf.put(key, 1L)
      else {
        val it = buf.entrySet().iterator()
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
  override def merge(buf: java.util.HashMap[Long, Long],
                     other: java.util.HashMap[Long, Long]): java.util.HashMap[Long, Long] = {
    other.forEach { (key, cnt) =>
      buf.put(key, buf.getOrDefault(key, 0L) + cnt)
    }
    if (buf.size > capacity) {
      val counts = new Array[Long](buf.size)
      var i = 0
      val it = buf.values().iterator()
      while (it.hasNext) { counts(i) = it.next(); i += 1 }
      java.util.Arrays.sort(counts)
      val t = counts(buf.size - capacity - 1) // (capacity+1)-th largest
      val eit = buf.entrySet().iterator()
      while (eit.hasNext) {
        val e = eit.next()
        if (e.getValue <= t) eit.remove() else e.setValue(e.getValue - t)
      }
    }
    buf
  }

  override def eval(buf: java.util.HashMap[Long, Long]): Any = {
    val entries = new Array[(Long, Long)](buf.size)
    var i = 0
    val it = buf.entrySet().iterator()
    while (it.hasNext) { val e = it.next(); entries(i) = (e.getKey, e.getValue); i += 1 }
    // count desc, key asc — deterministic for a given counter multiset
    val top = entries.sortBy { case (key, cnt) => (-cnt, key) }.take(k)
    new GenericArrayData(top.map { case (key, cnt) =>
      new GenericInternalRow(Array[Any](key, cnt))
    })
  }

  override def serialize(buf: java.util.HashMap[Long, Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + 16 * buf.size)
    bb.putInt(buf.size)
    buf.forEach { (key, cnt) => bb.putLong(key); bb.putLong(cnt) }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): java.util.HashMap[Long, Long] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val m = new java.util.HashMap[Long, Long](capacity * 2)
    var i = 0
    while (i < n) { m.put(bb.getLong, bb.getLong); i += 1 }
    m
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): TopKAgg =
    copy(child = newChildren.head)
}

object TopKAgg {
  /** Build from SQL-call arguments: graft_topk(key, k, capacity). */
  def fromArgs(exprs: Seq[Expression]): TopKAgg = {
    require(exprs.size == 3,
      s"graft_topk(key, k, capacity) takes 3 args, got ${exprs.size}")
    def intLit(e: Expression, name: String): Int = e match {
      case Literal(v: Int, IntegerType) => v
      case other => throw new IllegalArgumentException(
        s"graft_topk $name must be an integer literal, got $other")
    }
    TopKAgg(exprs.head, intLit(exprs(1), "k"), intLit(exprs(2), "capacity"))
  }
}
