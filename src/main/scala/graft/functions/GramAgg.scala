package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayBasedMapData, ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, LongType, MapType}

/** Shared 128-bit grid accumulation for the probe's moment aggregates
  * ([[GramAgg]], [[MomentsAgg]]).
  *
  * Each term rounds to a scaled LONG on a fixed 1e-9 grid
  * (`floor(v·1e9 + 0.5)` — plain IEEE ops, so the JVM-side aggregate and
  * the declarative Spark witness `floor(c * 1e9 + 0.5)` produce identical
  * longs), and the longs accumulate into a SIGNED 128-BIT cell (hi/lo long
  * pair, standard carry propagation). Integer addition is exact and
  * commutative in any width, so sums are partition-order exact; the single
  * float rounding happens once at eval when the exact 128-bit total
  * converts to double. Overflow headroom: a grid term is bounded by
  * |v|·1e9 ≤ ~2.5e10 at embedding magnitudes, and the 128-bit cell holds
  * ~1.7e38 — ≥1e27 rows, vs ~3.7e8 for a single long (the explode form's
  * ceiling). */
private[functions] object Grid128 {
  final val Grid = 1e9

  /** Spark-`floor(v*1e9 + 0.5)`-equivalent grid rounding. */
  @inline def toGrid(v: Double): Long = math.floor(v * Grid + 0.5).toLong

  /** buf(2·i) += v with 128-bit carry into buf(2·i + 1): lo at 2i (unsigned
    * limb), hi at 2i+1 (signed limb), v sign-extended. */
  @inline def add(buf: Array[Long], i: Int, v: Long): Unit = {
    val lo = buf(2 * i)
    val nl = lo + v
    buf(2 * i + 1) += (v >> 63) + (((lo & v) | ((lo | v) & ~nl)) >>> 63)
    buf(2 * i) = nl
  }

  /** Merge cell i of `other` into cell i of `buf` (128-bit + 128-bit). */
  @inline def addCell(buf: Array[Long], other: Array[Long], i: Int): Unit = {
    val lo = buf(2 * i); val ol = other(2 * i)
    val nl = lo + ol
    buf(2 * i + 1) += other(2 * i + 1) + (((lo & ol) | ((lo | ol) & ~nl)) >>> 63)
    buf(2 * i) = nl
  }

  /** The exact 128-bit value of cell i as a double, rescaled off the grid.
    * Values that fit a signed long (every test corpus) convert exactly as
    * the explode form's `getLong / 1e9`; larger totals round once. */
  def toDouble(buf: Array[Long], i: Int): Double = {
    val lo = buf(2 * i); val hi = buf(2 * i + 1)
    val d =
      if (hi == (lo >> 63)) lo.toDouble // fits in 64 bits
      else java.math.BigInteger.valueOf(hi).shiftLeft(64)
        .add(new java.math.BigInteger(java.lang.Long.toUnsignedString(lo)))
        .doubleValue()
    d / Grid
  }
}

/** `graft_gram(x)`: the Gram matrix Xᵀ X of an `array<double>` column as
  * ONE mergeable aggregate — the scale path for [[graft.ml.LinearProbe]]'s
  * normal equations. Returns the d² cells flattened row-major
  * (`array<double>`, cell (i,j) at i·d + j), already rescaled off the grid.
  *
  * Why an aggregate and not the declarative posexplode-of-products form:
  * the explode materializes d² rows PER INPUT ROW through the shuffle
  * (4225 rows/row at d=65 — the repo's only d²-per-row blowup, and its
  * measured #2 bench cost); this buffer keeps the d² cells as one
  * primitive array per partition, updates them in a tight fused loop
  * computing only the upper triangle (xi·xj = xj·xi exactly in IEEE, so
  * mirroring at eval is bit-identical), and merges elementwise — the
  * standard mergeable-sketch shape, so partial aggregation ships ONE
  * buffer per partition regardless of row count.
  *
  * Determinism: [[Grid128]] (exact integer sums in any order, one final
  * rounding). Bit-identity with the explode witness is suite-pinned
  * (LinearProbeSuite). Rows with a null array are skipped (sum semantics);
  * null ELEMENTS are rejected — a probe input with missing features is a
  * broken upstream, not a summable value. */
case class GramAgg(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[GramAgg.Buf] {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_gram expects array<double>, got ${other.sql}")
  }

  override def createAggregationBuffer(): GramAgg.Buf = new GramAgg.Buf(-1, null)

  private lazy val elemNullable: Boolean = child.dataType match {
    case ArrayType(_, n) => n
    case _ => true
  }

  override def update(buf: GramAgg.Buf, input: InternalRow): GramAgg.Buf = {
    val v = child.eval(input)
    if (v == null) return buf
    val arr = v.asInstanceOf[ArrayData]
    val d = arr.numElements()
    if (elemNullable) {
      var i = 0
      while (i < d) {
        require(!arr.isNullAt(i), s"graft_gram: null element at index $i")
        i += 1
      }
    }
    if (buf.d < 0) {
      // upper triangle only: d(d+1)/2 cells, two longs each
      buf.d = d
      buf.cells = new Array[Long](d * (d + 1))
    } else require(buf.d == d,
      s"graft_gram: inconsistent vector length (${buf.d} vs $d)")
    val x = arr.toDoubleArray() // throws on null elements: rejected by contract
    var i = 0
    var idx = 0
    while (i < d) {
      val xi = x(i)
      var j = i
      while (j < d) {
        Grid128.add(buf.cells, idx, Grid128.toGrid(xi * x(j)))
        idx += 1
        j += 1
      }
      i += 1
    }
    buf
  }

  override def merge(buf: GramAgg.Buf, other: GramAgg.Buf): GramAgg.Buf = {
    if (other.d < 0) return buf
    if (buf.d < 0) { buf.d = other.d; buf.cells = other.cells.clone(); return buf }
    require(buf.d == other.d,
      s"graft_gram: inconsistent vector length (${buf.d} vs ${other.d})")
    val n = buf.d * (buf.d + 1) / 2
    var i = 0
    while (i < n) { Grid128.addCell(buf.cells, other.cells, i); i += 1 }
    buf
  }

  override def eval(buf: GramAgg.Buf): Any = {
    if (buf.d < 0) return new GenericArrayData(Array.empty[Double])
    val d = buf.d
    val out = new Array[Double](d * d)
    var i = 0
    var idx = 0
    while (i < d) {
      var j = i
      while (j < d) {
        val v = Grid128.toDouble(buf.cells, idx)
        out(i * d + j) = v
        out(j * d + i) = v // exact mirror: IEEE multiply commutes
        idx += 1
        j += 1
      }
      i += 1
    }
    new GenericArrayData(out)
  }

  override def serialize(buf: GramAgg.Buf): Array[Byte] = {
    val n = if (buf.d < 0) 0 else buf.d * (buf.d + 1)
    val bb = ByteBuffer.allocate(4 + 8 * n)
    bb.putInt(buf.d)
    var i = 0
    while (i < n) { bb.putLong(buf.cells(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): GramAgg.Buf = {
    val bb = ByteBuffer.wrap(bytes)
    val d = bb.getInt()
    if (d < 0) new GramAgg.Buf(-1, null)
    else {
      val cells = new Array[Long](d * (d + 1))
      var i = 0
      while (i < cells.length) { cells(i) = bb.getLong(); i += 1 }
      new GramAgg.Buf(d, cells)
    }
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): GramAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): GramAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): GramAgg =
    copy(child = newChildren.head)
}

object GramAgg {
  /** d = -1 until the first row fixes the width; `cells` interleaves
    * (lo, hi) 128-bit limbs for the upper triangle, row-major. */
  final class Buf(var d: Int, var cells: Array[Long])

  def fromArgs(exprs: Seq[Expression]): GramAgg = {
    require(exprs.size == 1, s"graft_gram(x) takes 1 argument, got ${exprs.size}")
    GramAgg(exprs.head)
  }
}

/** `graft_moments(label, x)`: per-label elementwise vector sums of an
  * `array<double>` column as one mergeable aggregate —
  * `map<long, array<double>>` from each distinct label to Σ x over its
  * rows ([[graft.ml.LinearProbe]]'s one-hot right-hand sides Xᵀ y_c,
  * computed in the SAME single pass as [[GramAgg]] when both sit in one
  * `agg(...)`). State is one d-vector of 128-bit grid cells per DISTINCT
  * LABEL (classes, not rows — bounded by the label cardinality), keyed
  * through a sorted map so eval's key order is deterministic.
  * Null-label or null-array rows are skipped (sum semantics). */
case class MomentsAgg(
    label: Expression,
    vec: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[java.util.TreeMap[Long, Array[Long]]] {

  override def children: Seq[Expression] = Seq(label, vec)
  override def nullable: Boolean = false
  override def dataType: DataType =
    MapType(LongType, ArrayType(DoubleType, containsNull = false),
      valueContainsNull = false)

  override def checkInputDataTypes(): TypeCheckResult =
    (label.dataType, vec.dataType) match {
      case (LongType, ArrayType(DoubleType, _)) => TypeCheckResult.TypeCheckSuccess
      case (l, v) => TypeCheckResult.TypeCheckFailure(
        s"graft_moments expects (bigint, array<double>), got (${l.sql}, ${v.sql})")
    }

  override def createAggregationBuffer(): java.util.TreeMap[Long, Array[Long]] =
    new java.util.TreeMap[Long, Array[Long]]()

  private lazy val elemNullable: Boolean = vec.dataType match {
    case ArrayType(_, n) => n
    case _ => true
  }

  override def update(buf: java.util.TreeMap[Long, Array[Long]],
                      input: InternalRow): java.util.TreeMap[Long, Array[Long]] = {
    val l = label.eval(input)
    val v = vec.eval(input)
    if (l == null || v == null) return buf
    val arr = v.asInstanceOf[ArrayData]
    val d = arr.numElements()
    if (elemNullable) {
      var i = 0
      while (i < d) {
        require(!arr.isNullAt(i), s"graft_moments: null element at index $i")
        i += 1
      }
    }
    val key = l.asInstanceOf[Long]
    var cells = buf.get(key)
    if (cells == null) { cells = new Array[Long](2 * d); buf.put(key, cells) }
    else require(cells.length == 2 * d,
      s"graft_moments: inconsistent vector length (${cells.length / 2} vs $d)")
    val x = arr.toDoubleArray()
    var i = 0
    while (i < d) { Grid128.add(cells, i, Grid128.toGrid(x(i))); i += 1 }
    buf
  }

  override def merge(buf: java.util.TreeMap[Long, Array[Long]],
                     other: java.util.TreeMap[Long, Array[Long]]): java.util.TreeMap[Long, Array[Long]] = {
    other.forEach { (key, oc) =>
      val cells = buf.get(key)
      if (cells == null) buf.put(key, oc.clone())
      else {
        require(cells.length == oc.length,
          s"graft_moments: inconsistent vector length (${cells.length / 2} vs ${oc.length / 2})")
        var i = 0
        while (i < oc.length / 2) { Grid128.addCell(cells, oc, i); i += 1 }
      }
    }
    buf
  }

  override def eval(buf: java.util.TreeMap[Long, Array[Long]]): Any = {
    val n = buf.size()
    val keys = new Array[Any](n)
    val vals = new Array[Any](n)
    var k = 0
    val it = buf.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      val cells = e.getValue
      val d = cells.length / 2
      val out = new Array[Double](d)
      var i = 0
      while (i < d) { out(i) = Grid128.toDouble(cells, i); i += 1 }
      keys(k) = e.getKey.longValue()
      vals(k) = new GenericArrayData(out)
      k += 1
    }
    ArrayBasedMapData(keys, vals)
  }

  override def serialize(buf: java.util.TreeMap[Long, Array[Long]]): Array[Byte] = {
    var bytes = 8
    buf.forEach((_, c) => bytes += 12 + 8 * c.length)
    val bb = ByteBuffer.allocate(bytes)
    bb.putInt(buf.size())
    bb.putInt(0) // reserved
    buf.forEach { (key, c) =>
      bb.putLong(key)
      bb.putInt(c.length)
      var i = 0
      while (i < c.length) { bb.putLong(c(i)); i += 1 }
    }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): java.util.TreeMap[Long, Array[Long]] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt(); bb.getInt()
    val buf = new java.util.TreeMap[Long, Array[Long]]()
    var k = 0
    while (k < n) {
      val key = bb.getLong()
      val len = bb.getInt()
      val c = new Array[Long](len)
      var i = 0
      while (i < len) { c(i) = bb.getLong(); i += 1 }
      buf.put(key, c)
      k += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): MomentsAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): MomentsAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): MomentsAgg =
    copy(label = newChildren(0), vec = newChildren(1))
}

object MomentsAgg {
  def fromArgs(exprs: Seq[Expression]): MomentsAgg = {
    require(exprs.size == 2,
      s"graft_moments(label, x) takes 2 arguments, got ${exprs.size}")
    MomentsAgg(exprs(0), exprs(1))
  }
}

/** `graft_matvec(x, B)`: the Gram–basis product (XᵀX)·Bᵀ as ONE mergeable
  * aggregate — the MATRIX-FREE scale path for [[graft.ml.Pca.fitMatFree]]
  * at widths where even the d² Gram is too heavy to materialize (d ≥ ~4k:
  * 128 MB+ driver matrices, d=65k ⇒ 34 GB). `B` is a FOLDABLE literal
  * `array<array<double>>` — the m×d block basis of a subspace iteration,
  * m = k + oversample ≪ d. Per input row the identity
  * `(xxᵀ)·b_j = x·(x·b_j)` turns the rank-1 outer-product contribution
  * into m dot products plus m scaled copies of x — O(m·d) work and ZERO
  * allocation against a persistent m·d-cell buffer, never the O(d²) of
  * the full Gram. Returns the m·d products flattened basis-row-major
  * (`array<double>`, cell (j,i) = Σ_rows x_i·(x·b_j) at j·d + i).
  *
  * Determinism: the per-row dot products are a fixed-order IEEE loop (a
  * pure function of the row), and the cross-row sums run on the
  * [[Grid128]] 1e-9 grid — partition-order exact, same contract as
  * [[GramAgg]]. Null arrays skip (sum semantics); null elements reject. */
case class MatVecAgg(
    vec: Expression,
    basis: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[GramAgg.Buf] {

  override def children: Seq[Expression] = Seq(vec, basis)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult =
    (vec.dataType, basis.dataType) match {
      case (ArrayType(DoubleType, _), ArrayType(ArrayType(DoubleType, _), _)) =>
        if (basis.foldable) TypeCheckResult.TypeCheckSuccess
        else TypeCheckResult.TypeCheckFailure(
          "graft_matvec: basis must be a foldable literal (the driver-side block basis)")
      case (v, b) => TypeCheckResult.TypeCheckFailure(
        s"graft_matvec expects (array<double>, array<array<double>>), got (${v.sql}, ${b.sql})")
    }

  /** The basis rows, evaluated ONCE from the foldable literal. */
  @transient private lazy val b: Array[Array[Double]] = {
    val arr = basis.eval(null).asInstanceOf[ArrayData]
    val rows = Array.tabulate(arr.numElements()) { j =>
      arr.getArray(j).toDoubleArray()
    }
    require(rows.nonEmpty, "graft_matvec: empty basis")
    require(rows.forall(_.length == rows.head.length),
      "graft_matvec: ragged basis rows")
    rows
  }

  override def createAggregationBuffer(): GramAgg.Buf = new GramAgg.Buf(-1, null)

  private lazy val elemNullable: Boolean = vec.dataType match {
    case ArrayType(_, n) => n
    case _ => true
  }

  override def update(buf: GramAgg.Buf, input: InternalRow): GramAgg.Buf = {
    val v = vec.eval(input)
    if (v == null) return buf
    val arr = v.asInstanceOf[ArrayData]
    val d = arr.numElements()
    if (elemNullable) {
      var i = 0
      while (i < d) {
        require(!arr.isNullAt(i), s"graft_matvec: null element at index $i")
        i += 1
      }
    }
    require(d == b.head.length,
      s"graft_matvec: vector length $d != basis width ${b.head.length}")
    val m = b.length
    if (buf.d < 0) {
      buf.d = d
      buf.cells = new Array[Long](2 * m * d)
    } else require(buf.d == d,
      s"graft_matvec: inconsistent vector length (${buf.d} vs $d)")
    val x = arr.toDoubleArray()
    var j = 0
    while (j < m) {
      val bj = b(j)
      var t = 0.0
      var i = 0
      while (i < d) { t += x(i) * bj(i); i += 1 }
      val base = j * d
      i = 0
      while (i < d) {
        Grid128.add(buf.cells, base + i, Grid128.toGrid(x(i) * t))
        i += 1
      }
      j += 1
    }
    buf
  }

  override def merge(buf: GramAgg.Buf, other: GramAgg.Buf): GramAgg.Buf = {
    if (other.d < 0) return buf
    if (buf.d < 0) { buf.d = other.d; buf.cells = other.cells.clone(); return buf }
    require(buf.d == other.d,
      s"graft_matvec: inconsistent vector length (${buf.d} vs ${other.d})")
    val n = buf.cells.length / 2
    var i = 0
    while (i < n) { Grid128.addCell(buf.cells, other.cells, i); i += 1 }
    buf
  }

  override def eval(buf: GramAgg.Buf): Any = {
    if (buf.d < 0) return new GenericArrayData(Array.empty[Double])
    val n = buf.cells.length / 2
    val out = new Array[Double](n)
    var i = 0
    while (i < n) { out(i) = Grid128.toDouble(buf.cells, i); i += 1 }
    new GenericArrayData(out)
  }

  override def serialize(buf: GramAgg.Buf): Array[Byte] = {
    val n = if (buf.d < 0) 0 else buf.cells.length
    val bb = ByteBuffer.allocate(4 + 8 * n)
    bb.putInt(if (buf.d < 0) -1 else buf.d)
    var i = 0
    while (i < n) { bb.putLong(buf.cells(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): GramAgg.Buf = {
    val bb = ByteBuffer.wrap(bytes)
    val d = bb.getInt()
    if (d < 0) new GramAgg.Buf(-1, null)
    else {
      val cells = new Array[Long]((bytes.length - 4) / 8)
      var i = 0
      while (i < cells.length) { cells(i) = bb.getLong(); i += 1 }
      new GramAgg.Buf(d, cells)
    }
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): MatVecAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): MatVecAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): MatVecAgg =
    copy(vec = newChildren(0), basis = newChildren(1))
}

object MatVecAgg {
  def fromArgs(exprs: Seq[Expression]): MatVecAgg = {
    require(exprs.size == 2,
      s"graft_matvec(x, basis) takes 2 arguments, got ${exprs.size}")
    MatVecAgg(exprs(0), exprs(1))
  }
}
