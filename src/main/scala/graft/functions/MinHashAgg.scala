package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, Literal}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType}

/** MinHash sketch as a native Catalyst aggregate: `graft_minhash(sid, P)`
  * returns `array<long>` of length P — the minimum of each affine
  * permutation `h_i(sid) = ((7 + 11·i)·sid + 3 + 17·i) mod 1000003` over the
  * group (the same permutation family as q_dedup_minhash, so the two forms
  * are interchangeable and cross-checked in MinHashAggSuite).
  *
  * Why a TypedImperativeAggregate and not P min() columns: the column form
  * is fine at P=16 but is quadratic in plan size (P expressions × P buffer
  * slots through analysis/codegen) and unwieldy at the P=128..256 a 100 TB
  * near-dup pipeline uses. The sketch form is one buffer of P longs per
  * group, one fused update loop per row, an elementwise-min merge — the
  * standard mergeable-sketch shape (partial aggregation still applies, so
  * the shuffle carries one sketch per (partition, group), not raw rows).
  *
  * Determinism: min is commutative/associative — any partitioning or merge
  * order yields identical sketches.
  */
case class MinHashAgg(
    child: Expression,
    numPerms: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] {

  require(numPerms > 0 && numPerms <= 1024, s"numPerms must be in (0, 1024], got $numPerms")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == LongType || child.dataType == IntegerType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_minhash expects an integral id column, got ${child.dataType.sql}")

  override def createAggregationBuffer(): Array[Long] =
    Array.fill(numPerms)(Long.MaxValue)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val sid = v match {
        case l: java.lang.Long => l.longValue()
        case i: java.lang.Integer => i.longValue()
      }
      var i = 0
      while (i < numPerms) {
        val h = ((7L + 11L * i) * sid + 3L + 17L * i) % 1000003L
        if (h < buf(i)) buf(i) = h
        i += 1
      }
    }
    buf
  }

  override def merge(buf: Array[Long], other: Array[Long]): Array[Long] = {
    var i = 0
    while (i < numPerms) {
      if (other(i) < buf(i)) buf(i) = other(i)
      i += 1
    }
    buf
  }

  override def eval(buf: Array[Long]): Any = new GenericArrayData(buf)

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(8 * numPerms)
    buf.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    Array.fill(numPerms)(bb.getLong())
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): MinHashAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): MinHashAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): MinHashAgg =
    copy(child = newChildren.head)
}

object MinHashAgg {
  /** Build from SQL-call arguments: graft_minhash(sid, P) with foldable P. */
  def fromArgs(exprs: Seq[Expression]): MinHashAgg = {
    require(exprs.size == 2, s"graft_minhash(id, numPerms) takes 2 args, got ${exprs.size}")
    val p = exprs(1) match {
      case Literal(v: Int, IntegerType) => v
      case other => throw new IllegalArgumentException(
        s"graft_minhash numPerms must be an integer literal, got $other")
    }
    MinHashAgg(exprs.head, p)
  }
}
