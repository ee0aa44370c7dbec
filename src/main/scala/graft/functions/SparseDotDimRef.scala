package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, LongType, StructType}

/** [[SparseDotRef]] over RAW-dim feature rows: the sparse fold
  * ⟨fs, vec⟩ where `fs` is `array<struct<dim:long, v:double>>` keyed by
  * the ORIGINAL feature dim, not a pre-computed dense index. The slot is
  * found by binary search over `dims` (the sorted active-dim array that
  * rides as a reference object beside the vector, O(1) plan bytes at any
  * width — the SparseDotRef discipline); [[graft.ml.SparseRidge]]'s
  * BiasDim sentinel (Long.MaxValue) maps to the trailing bias slot.
  *
  * Why it exists (round-18 fit-prefix fusion, guide §2.3): with dims
  * resolved at fold time, the fit no longer needs a dims-collect pass
  * over the feature frame before it can build its grouped arrays — the
  * active-dim set falls out of the b-vector aggregation instead. The
  * fold order is the array order exactly as before (sorted by dim ≡
  * sorted by dense index — the map is monotone), so sums are
  * bit-identical to the dense-index fold's.
  *
  * A dim absent from `dims` throws — on the fit path the grouped frame
  * and `dims` come from the same aggregation by construction, so a miss
  * is a caller bug, never data. Null semantics mirror [[SparseDotRef]].
  */
case class SparseDotDimRef(child: Expression, dims: IndexedSeq[Long],
                           vec: IndexedSeq[Double])
  extends UnaryExpression {

  @transient private lazy val flatDims: Array[Long] = dims.toArray
  @transient private lazy val flat: Array[Double] = vec.toArray

  override def checkInputDataTypes(): TypeCheckResult =
    if (vec.isEmpty || vec.length != dims.length + 1)
      TypeCheckResult.TypeCheckFailure(
        "graft_sparse_dot_dim: vector must have dims.length + 1 slots")
    else child.dataType match {
      case ArrayType(s: StructType, _)
        if s.length == 2 && s(0).dataType == LongType &&
           s(1).dataType == DoubleType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"graft_sparse_dot_dim expects array<struct<dim:long,v:double>>, got ${other.sql}")
    }

  override def dataType: DataType = DoubleType

  private lazy val elemNullable: Boolean = child.dataType match {
    case ArrayType(s: StructType, n) =>
      n || s(0).nullable || s(1).nullable
    case _ => true
  }

  override def nullable: Boolean = child.nullable || elemNullable

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    var acc = 0.0
    var i = 0
    val n = arr.numElements()
    while (i < n) {
      if (elemNullable && arr.isNullAt(i)) return null
      val f = arr.getStruct(i, 2)
      if (elemNullable && (f.isNullAt(0) || f.isNullAt(1))) return null
      val dim = f.getLong(0)
      val slot =
        if (dim == Long.MaxValue) flatDims.length
        else java.util.Arrays.binarySearch(flatDims, dim)
      if (slot < 0)
        throw new IllegalArgumentException(
          s"graft_sparse_dot_dim: dim $dim not in the ${flatDims.length}-dim active set")
      acc += f.getDouble(1) * flat(slot)
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, { arr =>
      val dimsRef = ctx.addReferenceObj("srDims", flatDims, "long[]")
      val vecRef = ctx.addReferenceObj("srVec", flat, "double[]")
      val acc = ctx.freshName("acc")
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val f = ctx.freshName("f")
      val dim = ctx.freshName("dim")
      val slot = ctx.freshName("slot")
      // see SparseDotRef.doGenCode for the ev.isNull / getStruct ordering
      // notes — this template mirrors it with the binary-search slot.
      val body =
        if (elemNullable)
          s"""if ($arr.isNullAt($i)) { ${ev.isNull} = true; break; }
             |org.apache.spark.sql.catalyst.InternalRow $f = $arr.getStruct($i, 2);
             |if ($f.isNullAt(0) || $f.isNullAt(1)) { ${ev.isNull} = true; break; }""".stripMargin
        else
          s"org.apache.spark.sql.catalyst.InternalRow $f = $arr.getStruct($i, 2);"
      val assign =
        if (elemNullable) s"if (!${ev.isNull}) { ${ev.value} = $acc; }"
        else s"${ev.value} = $acc;"
      s"""
         |double $acc = 0.0;
         |int $n = $arr.numElements();
         |for (int $i = 0; $i < $n; $i++) {
         |  $body
         |  long $dim = $f.getLong(0);
         |  int $slot = ($dim == Long.MAX_VALUE)
         |    ? $dimsRef.length
         |    : java.util.Arrays.binarySearch($dimsRef, $dim);
         |  if ($slot < 0) {
         |    throw new IllegalArgumentException(
         |      "graft_sparse_dot_dim: dim " + $dim + " not in the " +
         |      $dimsRef.length + "-dim active set");
         |  }
         |  $acc += $f.getDouble(1) * $vecRef[$slot];
         |}
         |$assign
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): SparseDotDimRef =
    copy(child = newChild)
}
