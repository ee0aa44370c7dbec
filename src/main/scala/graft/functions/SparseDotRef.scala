package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, IntegerType, StructType}

/** Sparse dot product of an `array<struct<j:int, v:double>>` feature row
  * against a DENSE driver-side vector that rides the expression as a
  * plain object reference (`ctx.addReferenceObj`) — the [[PqEncode]]
  * codebook pattern applied to [[graft.ml.SparseRidge]]'s hot loop
  * (VERDICT r12 #3: the CG direction and the serving weights shipped as
  * `typedLit` arrays of D+1 doubles, ~2 MB of plan literal per iteration
  * at the default 2^18 hashed-TF buckets and ~16 MB at the 2^21
  * `MaxActiveDims` cap — plan/codegen size was the practical width
  * ceiling, not driver memory; a reference object is O(1) plan bytes at
  * any width and broadcast once with the task binary).
  *
  * Arithmetic is the replaced fold's exactly: acc = 0.0, then
  * acc += v · vec(j) in ARRAY ORDER (the rows are sorted by j at build
  * time — fixed order, fixed IEEE sum, so the SparseRidge determinism
  * contract is untouched; SparseRidgeSuite pins bit-identity against the
  * literal fold). An out-of-range j throws — the grouped frame and the
  * vector are built from the same active-dim index by construction, so
  * a violation is a caller bug, never data.
  *
  * Null semantics (the [[PqEncode]] discipline): null input -> null
  * (UnaryExpression default); a null ELEMENT or null struct field nulls
  * the result when the child's schema admits it — SparseRidge's grouped
  * arrays never do, so those branches never codegen on the fit path.
  */
case class SparseDotRef(child: Expression, vec: IndexedSeq[Double])
  extends UnaryExpression {

  @transient private lazy val flat: Array[Double] = vec.toArray

  override def checkInputDataTypes(): TypeCheckResult =
    if (vec.isEmpty)
      TypeCheckResult.TypeCheckFailure("graft_sparse_dot: empty vector")
    else child.dataType match {
      case ArrayType(s: StructType, _)
        if s.length == 2 && s(0).dataType == IntegerType &&
           s(1).dataType == DoubleType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"graft_sparse_dot expects array<struct<j:int,v:double>>, got ${other.sql}")
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
      val j = f.getInt(0)
      if (j < 0 || j >= flat.length)
        throw new IllegalArgumentException(
          s"graft_sparse_dot: index $j out of range for a ${flat.length}-dim vector")
      acc += f.getDouble(1) * flat(j)
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, { arr =>
      val vecRef = ctx.addReferenceObj("srVec", flat, "double[]")
      val acc = ctx.freshName("acc")
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val f = ctx.freshName("f")
      val j = ctx.freshName("j")
      // ev.isNull may only be REFERENCED when this expression is
      // nullable: nullSafeCodeGen's non-nullable branch replaces it with
      // a false literal AFTER this template interpolated the variable
      // name, leaving an undeclared identifier in the generated source
      // (janino: "not an rvalue"). elemNullable forces nullable = true,
      // so the null-handling branches are the only ones that may touch
      // it. The element null-check needs the struct ref before it can
      // fire on the fields, but getStruct on a null slot is undefined —
      // guard the slot first when the schema admits nulls.
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
         |  int $j = $f.getInt(0);
         |  if ($j < 0 || $j >= $vecRef.length) {
         |    throw new IllegalArgumentException(
         |      "graft_sparse_dot: index " + $j + " out of range for a " +
         |      $vecRef.length + "-dim vector");
         |  }
         |  $acc += $f.getDouble(1) * $vecRef[$j];
         |}
         |$assign
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): SparseDotRef =
    copy(child = newChild)
}
