package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Direct pins for the graft_gram / graft_moments mergeable aggregates:
  * hand-computed cells, partition-merge equivalence, the 128-bit carry
  * path past the 64-bit grid ceiling, and input validation. (Bit-identity
  * with LinearProbe's explode witness is pinned in LinearProbeSuite.) */
class GramAggSuite extends SparkSpec {

  private def grid(v: Double): Long = math.floor(v * 1e9 + 0.5).toLong

  test("graft_gram: hand-computed 2x2 Gram, identical across partitionings") {
    import spark.implicits._
    val rows = Seq(Array(1.0, 2.0), Array(3.0, -1.0), Array(0.5, 0.25))
    val expected = Array.ofDim[Double](4)
    for (i <- 0 until 2; j <- 0 until 2)
      expected(i * 2 + j) =
        rows.map(x => grid(x(i) * x(j))).sum / 1e9
    for (parts <- Seq(1, 3)) {
      val got = rows.toDF("x").repartition(parts)
        .agg(expr("graft_gram(x)")).head().getSeq[Double](0)
      assert(got.toArray.toSeq === expected.toSeq, s"parts=$parts")
    }
  }

  test("graft_moments: per-label vector sums, sorted keys, merge-equivalent") {
    import spark.implicits._
    val rows = Seq((2L, Array(1.0, 10.0)), (1L, Array(2.0, 0.5)),
      (2L, Array(3.0, -4.0)))
    for (parts <- Seq(1, 3)) {
      val m = rows.toDF("label", "x").repartition(parts)
        .agg(expr("graft_moments(label, x)")).head()
        .getMap[Long, scala.collection.Seq[Double]](0)
      assert(m.keys.toSeq.sorted === Seq(1L, 2L))
      assert(m(1L).toSeq === Seq(2.0, 0.5))
      assert(m(2L).toSeq === Seq((grid(1.0) + grid(3.0)) / 1e9,
        (grid(10.0) + grid(-4.0)) / 1e9), s"parts=$parts")
    }
  }

  test("128-bit cells: sums past the 64-bit grid ceiling stay exact") {
    import spark.implicits._
    // each term lands at 9e18 on the grid (just under Long.Max); 8 rows
    // overflow a single long cell by 8x — the carry path must hold, and
    // the double conversion of the exact 128-bit total must match the
    // driver-side BigInt sum
    val v = 3e4 // grid term = floor(9e8*1e9+0.5) = 9e17 per product
    val n = 20
    val df = Seq.fill(n)(Array(v)).toDF("x").repartition(4)
    val got = df.agg(expr("graft_gram(x)")).head().getSeq[Double](0).head
    val exact = BigInt(grid(v * v)) * n
    assert(BigInt(grid(v * v)) * n > BigInt(Long.MaxValue),
      "fixture must actually overflow a 64-bit cell")
    assert(got === exact.toDouble / 1e9, s"got $got")
    val m = Seq.fill(n)((1L, Array(v * v))).toDF("label", "x")
      .repartition(4).agg(expr("graft_moments(label, x)")).head()
      .getMap[Long, scala.collection.Seq[Double]](0)
    val exactM = BigInt(grid(v * v)) * n
    assert(exactM > BigInt(Long.MaxValue))
    assert(m(1L).head === exactM.toDouble / 1e9)
  }

  test("nulls: null rows skipped, null elements and ragged widths rejected") {
    import spark.implicits._
    val withNullRow = Seq(Some(Array(1.0, 2.0)), None, Some(Array(2.0, 3.0)))
      .toDF("x")
    val g = withNullRow.agg(expr("graft_gram(x)")).head().getSeq[Double](0)
    assert(g(0) === (grid(1.0) + grid(4.0)) / 1e9)
    val nullElem = spark.sql(
      "SELECT array(CAST(1.0 AS DOUBLE), CAST(NULL AS DOUBLE)) AS x")
    val e1 = intercept[Exception](nullElem.agg(expr("graft_gram(x)")).collect())
    assert(e1.getMessage != null)
    val ragged = Seq(Array(1.0), Array(1.0, 2.0)).toDF("x").repartition(1)
    val e2 = intercept[Exception](ragged.agg(expr("graft_gram(x)")).collect())
    assert(e2.getMessage != null)
    // empty input: gram yields an empty array, moments an empty map
    val empty = Seq.empty[Array[Double]].toDF("x")
    assert(empty.agg(expr("graft_gram(x)")).head().getSeq[Double](0).isEmpty)
  }

  test("type checking names the function on bad input") {
    import spark.implicits._
    val df = Seq(("a", 1L)).toDF("s", "l")
    val e1 = intercept[Exception](df.agg(expr("graft_gram(s)")).collect())
    assert(e1.getMessage.contains("graft_gram"), e1.getMessage)
    val e2 = intercept[Exception](df.agg(expr("graft_moments(s, l)")).collect())
    assert(e2.getMessage.contains("graft_moments"), e2.getMessage)
  }
}
