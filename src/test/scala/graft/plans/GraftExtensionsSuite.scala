package graft.plans

import graft.SparkSpec
import graft.functions.DotProduct
import org.apache.spark.sql.functions._

/** SparkSessionExtensions wiring: injected function + HOF-fusion rule. */
class GraftExtensionsSuite extends SparkSpec {

  private def hofDot = expr(
    "aggregate(zip_with(a, b, (x, y) -> x * y), 0D, (acc, x) -> acc + x)")

  test("graft_dot is usable from SQL without imperative registration") {
    val r = spark.sql("SELECT graft_dot(array(1D, 2D, 3D), array(4D, 5D, 6D)) AS d")
      .collect().head.getDouble(0)
    assert(r === 32.0)
  }

  test("optimizer fuses the declarative HOF dot product into DotProduct") {
    // parquet-backed, not a local Seq: ConvertToLocalRelation would fold a
    // LocalRelation plan to literals before the fused expression is visible
    val df = graft.Tables(spark, "/root/testdata/sf0.001", "embeddings")
      .select(col("embedding").cast("array<double>").as("a"))
      .withColumn("b", col("a"))
      .select(hofDot.as("d"))
    val optimized = df.queryExecution.optimizedPlan
    val fused = optimized.expressions.exists(_.exists(_.isInstanceOf[DotProduct]))
    assert(fused, s"expected DotProduct in:\n$optimized")
    import spark.implicits._
    val local = Seq((Array(1.0, 2.0), Array(3.0, 4.0))).toDF("a", "b")
      .select(hofDot.as("d")).collect().head.getDouble(0)
    assert(local === 11.0)
  }

  test("fusion preserves HOF semantics on ragged and null arrays") {
    import spark.implicits._
    val df = Seq(
      (Array(1.0, 2.0), Array(3.0, 4.0)),          // well-formed: 11.0
      (Array(1.0, 2.0, 9.0), Array(3.0, 4.0)),     // ragged: zip_with pads null -> null
      (null.asInstanceOf[Array[Double]], Array(1.0)) // null array -> null
    ).toDF("a", "b").select(hofDot.as("d"))
    val got = df.collect().map(r => if (r.isNullAt(0)) None else Some(r.getDouble(0)))
    assert(got.toSeq === Seq(Some(11.0), None, None))
    // null ELEMENT nulls the result in both the HOF and the fused form
    val nullElem = spark.sql(
      """SELECT aggregate(zip_with(array(1D, CAST(NULL AS DOUBLE)), array(3D, 4D),
        |  (x, y) -> x * y), 0D, (acc, x) -> acc + x) AS hof,
        |  graft_dot(array(1D, CAST(NULL AS DOUBLE)), array(3D, 4D)) AS fused
        |""".stripMargin).collect().head
    assert(nullElem.isNullAt(0) && nullElem.isNullAt(1))
  }

  test("fusion matches HOF results on real embeddings to the last bit") {
    val e = graft.Tables(spark, "/root/testdata/sf0.001", "embeddings")
      .select(col("vec_id"), col("embedding").cast("array<double>").as("a"))
      .withColumn("b", col("a"))
    val fused = e.select(col("vec_id"), hofDot.as("d")).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    graft.functions.VectorFunctions.register(spark)
    val native = e.select(col("vec_id"), expr("graft_dot(a, b)").as("d")).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(fused === native) // exact ==: identical IEEE fold order
  }
}
