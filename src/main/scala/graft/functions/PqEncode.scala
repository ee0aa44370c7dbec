package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, IntegerType}

/** Native PQ encoder: nearest-codeword argmin per subspace over an
  * `array<double>` residual column — the codegen'd replacement for the
  * per-row Scala UDF on the embedding-ingest path (VERDICT r10 #5: the
  * one SerDe-paying kernel left on a 100 TB scan; every stored vector
  * pays the encode exactly once).
  *
  * The codebook rides the expression as a plain object reference
  * (`ctx.addReferenceObj`), flattened once to a primitive double[] with
  * (subspace, codeword, dim) strides — the generated loop reads it with
  * zero boxing and the interpreted fallback shares the same array.
  * Arithmetic is the UDF's exactly: squared L2 over the subspace slice,
  * accumulated in declaration order, STRICT `<` comparison so ties keep
  * the LOWEST codeword — bit-equal codes (IvfIndexSuite pins the twin).
  *
  * Null semantics: null input -> null (UnaryExpression default); a null
  * ELEMENT nulls the result when the child's schema admits element nulls
  * (the DotProduct discipline) — residuals computed by IvfIndex are
  * never element-null, so that branch never codegens on the ingest path.
  * A residual shorter than m·dsub reads as an error (the UDF indexed out
  * of bounds there; here it is an explicit requirement).
  */
case class PqEncode(child: Expression,
                    books: IndexedSeq[IndexedSeq[IndexedSeq[Double]]])
  extends UnaryExpression {

  private def m: Int = books.length
  private def ksub: Int = books.head.length
  private def dsub: Int = books.head.head.length

  @transient private lazy val flat: Array[Double] = {
    val a = new Array[Double](m * ksub * dsub)
    var i = 0
    for (s <- 0 until m; c <- 0 until ksub; j <- 0 until dsub) {
      a(i) = books(s)(c)(j); i += 1
    }
    a
  }

  override def checkInputDataTypes(): TypeCheckResult = {
    val shapeOk = books.nonEmpty && books.head.nonEmpty &&
      books.head.head.nonEmpty &&
      books.forall(b => b.length == ksub && b.forall(_.length == dsub))
    if (!shapeOk)
      TypeCheckResult.TypeCheckFailure(
        "graft_pq_encode: codebooks must be a non-empty rectangular m x ksub x dsub array")
    else child.dataType match {
      case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"graft_pq_encode expects array<double>, got ${other.sql}")
    }
  }

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  private lazy val elemNullable: Boolean = child.dataType match {
    case ArrayType(_, n) => n
    case _ => true
  }

  override def nullable: Boolean = child.nullable || elemNullable

  override def nullSafeEval(input: Any): Any = {
    val r = input.asInstanceOf[ArrayData]
    require(r.numElements() >= m * dsub,
      s"graft_pq_encode: residual has ${r.numElements()} dims, codebook needs ${m * dsub}")
    val codes = new Array[Int](m)
    var s = 0
    while (s < m) {
      var best = 0
      var bestD = Double.MaxValue
      var c = 0
      while (c < ksub) {
        var dist = 0.0
        var j = 0
        while (j < dsub) {
          val idx = s * dsub + j
          if (elemNullable && r.isNullAt(idx)) return null
          val t = r.getDouble(idx) - flat((s * ksub + c) * dsub + j)
          dist += t * t
          j += 1
        }
        if (dist < bestD) { bestD = dist; best = c } // strict <: ties keep lowest
        c += 1
      }
      codes(s) = best
      s += 1
    }
    new GenericArrayData(codes)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, { r =>
      val flatRef = ctx.addReferenceObj("pqBooks", flat, "double[]")
      val codes = ctx.freshName("codes")
      val s = ctx.freshName("s")
      val c = ctx.freshName("c")
      val j = ctx.freshName("j")
      val idx = ctx.freshName("idx")
      val t = ctx.freshName("t")
      val dist = ctx.freshName("dist")
      val best = ctx.freshName("best")
      val bestD = ctx.freshName("bestD")
      // ev.isNull may only be REFERENCED when this expression is
      // nullable (elemNullable forces that): nullSafeCodeGen's
      // non-nullable branch replaces ev.isNull with a false literal
      // AFTER the template interpolated the variable name, leaving an
      // undeclared identifier (janino: "not an rvalue") — found via the
      // same latent bug in SparseDotRef, whose fit path is the first
      // caller to codegen one of these with a non-nullable child.
      val nullCheck =
        if (elemNullable)
          s"if ($r.isNullAt($idx)) { ${ev.isNull} = true; break; }"
        else ""
      val outerBreak =
        if (elemNullable) s"if (${ev.isNull}) break;" else ""
      val assign =
        s"${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($codes);"
      val guardedAssign =
        if (elemNullable) s"if (!${ev.isNull}) { $assign }" else assign
      s"""
         |if ($r.numElements() < ${m * dsub}) {
         |  throw new IllegalArgumentException(
         |    "graft_pq_encode: residual has " + $r.numElements() +
         |    " dims, codebook needs ${m * dsub}");
         |}
         |int[] $codes = new int[$m];
         |for (int $s = 0; $s < $m; $s++) {
         |  int $best = 0;
         |  double $bestD = Double.MAX_VALUE;
         |  for (int $c = 0; $c < $ksub; $c++) {
         |    double $dist = 0.0;
         |    for (int $j = 0; $j < $dsub; $j++) {
         |      int $idx = $s * $dsub + $j;
         |      $nullCheck
         |      double $t = $r.getDouble($idx) - $flatRef[($s * $ksub + $c) * $dsub + $j];
         |      $dist += $t * $t;
         |    }
         |    $outerBreak
         |    if ($dist < $bestD) { $bestD = $dist; $best = $c; }
         |  }
         |  $outerBreak
         |  $codes[$s] = $best;
         |}
         |$guardedAssign
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): PqEncode =
    copy(child = newChild)
}
