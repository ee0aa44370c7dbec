package graft.plans

import graft.SparkSpec
import graft.operators.GroupLimits
import org.apache.spark.sql.functions._

/** TopKPerKey custom operator: equivalence with the window formulation,
  * partition invariance, small-group/tie edges, and the no-sort plan. */
class TopKPerKeySuite extends SparkSpec {

  private def crafted = {
    val s = spark
    import s.implicits._
    // 3 keys: key 1 has 5 rows with a tie at value 30; key 2 has 2 rows
    // (fewer than k); key 3 has 1 row
    Seq(
      (1L, 10L, 30.0), (1L, 11L, 30.0), (1L, 12L, 50.0), (1L, 13L, 20.0), (1L, 14L, 40.0),
      (2L, 20L, 5.0), (2L, 21L, 7.0),
      (3L, 30L, 1.0))
      .toDF("k", "id", "v")
  }

  private def viaOperator(df: org.apache.spark.sql.DataFrame, k: Int) =
    GroupLimits.topKPerKey(df, Seq("k"), Seq(col("v").desc, col("id")), k)
      .orderBy(col("k"), col("v").desc, col("id"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq

  private def viaWindow(df: org.apache.spark.sql.DataFrame, k: Int) = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("k").orderBy(col("v").desc, col("id"))
    // rn stays in the output so RewriteRankLimit CANNOT fire — this is
    // the genuine WindowExec path, which is the point of the comparison
    df.withColumn("rn", row_number().over(w)).filter(col("rn") <= k)
      .orderBy(col("k"), col("v").desc, col("id"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
  }

  test("operator equals the rank-window formulation, ties broken by id") {
    assert(viaOperator(crafted, 3) === viaWindow(crafted, 3))
    // explicit golden: key 1 keeps (50, id 12), (40, id 14), then the
    // 30-tie resolves to min id 10; key 2 and 3 keep everything
    assert(viaOperator(crafted, 3) === Seq(
      (1L, 12L, 50.0), (1L, 14L, 40.0), (1L, 10L, 30.0),
      (2L, 21L, 7.0), (2L, 20L, 5.0),
      (3L, 30L, 1.0)))
  }

  test("partition invariance: any input layout yields the identical result") {
    val base = viaOperator(crafted, 2)
    assert(viaOperator(crafted.repartition(1), 2) === base)
    assert(viaOperator(crafted.repartition(7, col("id")), 2) === base)
  }

  test("k larger than every group degrades to the full input") {
    assert(viaOperator(crafted, 100).size === 8)
  }

  test("plan: heap operator + one hash exchange, NO Sort or Window before output order") {
    val df = GroupLimits.topKPerKey(
      graft.Tables(spark, "/root/testdata/sf0.001", "orders")
        .select("o_custkey", "o_orderkey", "o_totalprice"),
      Seq("o_custkey"), Seq(col("o_totalprice").desc, col("o_orderkey")), 3)
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("TopKPerKey"), p)
    assert(!p.contains("WindowExec") && !p.contains("Window "), p)
    assert(!p.contains("Sort "), s"heap operator must not sort:\n$p")
    assert("Exchange hashpartitioning".r.findAllIn(p).length === 1, p)
  }

  test("matches the window form on real data at scale factor 0.001") {
    val o = graft.Tables(spark, "/root/testdata/sf0.001", "orders")
      .select("o_custkey", "o_orderkey", "o_totalprice")
    val a = GroupLimits.topKPerKey(o, Seq("o_custkey"),
        Seq(col("o_totalprice").desc, col("o_orderkey")), 3)
      .orderBy("o_custkey", "o_orderkey").collect().map(_.toSeq).toSeq
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("o_custkey").orderBy(col("o_totalprice").desc, col("o_orderkey"))
    val b = o.withColumn("rn", row_number().over(w)).filter(col("rn") <= 3)
      .orderBy("o_custkey", "o_orderkey").collect().map(_.toSeq.init).toSeq
    assert(a === b)
  }

  test("spill fallback: past the key threshold the sorter path equals the heap path") {
    val key = graft.plans.TopKPerKey.MaxKeysKey
    val o = graft.Tables(spark, "/root/testdata/sf0.001", "orders")
      .select("o_custkey", "o_orderkey", "o_totalprice")
    def run() = GroupLimits.topKPerKey(o, Seq("o_custkey"),
        Seq(col("o_totalprice").desc, col("o_orderkey")), 3)
      .orderBy("o_custkey", "o_orderkey").collect().map(_.toSeq).toSeq
    val heapPath = run()
    spark.conf.set(key, "10") // ~1000 custkeys per partition >> 10 -> overflow
    try {
      val sorterPath = run()
      assert(sorterPath === heapPath,
        "spillable sorter fallback diverged from the in-memory heap path")
    } finally spark.conf.unset(key)
    // and a threshold of 1 (every partition overflows on its second key)
    spark.conf.set(key, "1")
    try assert(run() === heapPath) finally spark.conf.unset(key)
  }

  test("spill fallback on the crafted frame including ties") {
    val key = graft.plans.TopKPerKey.MaxKeysKey
    spark.conf.set(key, "1")
    try assert(viaOperator(crafted, 3) === viaWindow(crafted, 3))
    finally spark.conf.unset(key)
  }

  test("RewriteRankLimit: rank-filter-drop pattern plans as the heap operator") {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("k").orderBy(col("v").desc, col("id"))
    val rewritten = crafted
      .withColumn("rn", row_number().over(w)).filter(col("rn") <= 2).drop("rn")
    val p = rewritten.queryExecution.executedPlan.toString
    assert(p.contains("TopKPerKey"), s"rewrite did not fire:\n$p")
    assert(!p.contains("WindowExec"), p)
    // and the rewritten result equals the unrewritten window path
    val got = rewritten.orderBy(col("k"), col("v").desc, col("id"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    assert(got === viaWindow(crafted, 2))
  }

  test("RewriteRankLimit: rn < Int.MinValue is constant-false, not all-rows (no k-1 wrap)") {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("k").orderBy(col("v").desc, col("id"))
    val df = crafted.withColumn("rn", row_number().over(w))
      .filter(col("rn") < Int.MinValue).drop("rn")
    // k-1 would wrap to Int.MaxValue and return every row per key; the
    // guard must leave the (empty) original plan alone
    assert(df.count() === 0L, "rn < Int.MinValue must yield zero rows")
  }

  test("GroupLimits resolves key columns case-insensitively, like Spark") {
    val got = GroupLimits.topKPerKey(crafted, Seq("K"), Seq(col("v").desc, col("id")), 2)
      .orderBy(col("k"), col("v").desc, col("id"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    assert(got === viaOperator(crafted, 2))
  }

  test("RewriteRankLimit: keeps its hands off when rn is emitted or the function is dense_rank()") {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("k").orderBy(col("v").desc, col("id"))
    val rnKept = crafted.withColumn("rn", row_number().over(w)).filter(col("rn") <= 2)
    assert(rnKept.queryExecution.executedPlan.toString.contains("Window"),
      "rn in output must keep the window")
    val dr = crafted.withColumn("rn", dense_rank().over(w)).filter(col("rn") <= 2).drop("rn")
    assert(dr.queryExecution.executedPlan.toString.contains("Window"),
      "dense_rank (k smallest DISTINCT keys) is a different operator")
  }

  test("RewriteRankLimit: rank() <= k rewrites to the withTies heap, ties preserved") {
    // order by v only — key 1 has a genuine 30.0 tie at ranks 3 AND 4,
    // so rank()<=3 keeps BOTH (4 rows), which row_number could not
    val w = org.apache.spark.sql.expressions.Window.partitionBy("k").orderBy(col("v").desc)
    def rankForm(df: org.apache.spark.sql.DataFrame) =
      df.withColumn("rn", rank().over(w)).filter(col("rn") <= 3).drop("rn")
    val rewritten = rankForm(crafted)
    val p = rewritten.queryExecution.executedPlan.toString
    assert(p.contains("TopKPerKey") && !p.contains("WindowExec"), s"rank rewrite did not fire:\n$p")
    val got = rewritten.orderBy(col("k"), col("v").desc, col("id"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    // the genuine WindowExec path (rn kept in output -> no rewrite)
    val wantRows = crafted.withColumn("rn", rank().over(w)).filter(col("rn") <= 3)
      .orderBy(col("k"), col("v").desc, col("id"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    assert(got === wantRows)
    assert(got.count(t => t._1 == 1L && t._3 == 30.0) === 2, "both 30.0 ties must survive")
    // spill path produces the same set
    spark.conf.set(graft.plans.TopKPerKey.MaxKeysKey, "1")
    try {
      val spilled = rankForm(crafted).orderBy(col("k"), col("v").desc, col("id"))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
      assert(spilled === wantRows)
    } finally spark.conf.unset(graft.plans.TopKPerKey.MaxKeysKey)
  }

  test("RewriteRankLimit: residual AND-conjuncts survive as a filter above the heap") {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("k").orderBy(col("v").desc, col("id"))
    val df = crafted.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 2 && col("v") > 4.0).drop("rn")
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("TopKPerKey") && !p.contains("WindowExec"),
      s"conjunction rewrite did not fire:\n$p")
    val got = df.orderBy(col("k"), col("v").desc, col("id"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    val want = crafted.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 2).filter(col("v") > 4.0)
      .orderBy(col("k"), col("v").desc, col("id"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    assert(got === want)
  }

  test("withTies: a ties buffer past its ceiling flips to the sorter, same set") {
    val s = spark
    import s.implicits._
    // 40 rows tie the top value in one key: rank()<=1 must return all 40,
    // and with the ties ceiling at 4 the partition must take the sorter
    // path rather than buffer them on heap
    val df = ((1 to 40).map(i => (1L, i.toLong, 9.0)) ++
      Seq((1L, 99L, 1.0), (2L, 50L, 5.0), (2L, 51L, 4.0)))
      .toDF("k", "id", "v").repartition(3)
    def run() = GroupLimits.topKPerKey(df, Seq("k"), Seq(col("v").desc), 1,
        withTies = true)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val unbounded = run()
    assert(unbounded.count(_._1 == 1L) === 40 && unbounded.count(_._1 == 2L) === 1)
    spark.conf.set(graft.plans.TopKPerKey.MaxTiesKey, "4")
    try assert(run() === unbounded, "sorter ties path diverged")
    finally spark.conf.unset(graft.plans.TopKPerKey.MaxTiesKey)
  }

  test("GroupLimits: exact name beats case-variants; true ambiguity errors") {
    val s = spark
    import s.implicits._
    val base = Seq((1L, 1L, 10.0), (1L, 2L, 20.0), (2L, 3L, 5.0)).toDF("k", "id", "v")
    // output carries BOTH `K` (constant -> would collapse groups) and `k`:
    // asking for "k" must resolve the exact column, not first-match
    val both = base.select(lit(0L).as("K"), col("k"), col("id"), col("v"))
    // (read k/id by position — a by-name select of "k" would itself be
    // ambiguous to Spark's resolver with both K and k in the output)
    val got = GroupLimits.topKPerKey(both, Seq("k"), Seq(col("v").desc), 1)
      .collect().map(r => (r.getLong(1), r.getLong(2))).toSet
    assert(got === Set((1L, 2L), (2L, 3L)), s"grouped on the wrong case-variant: $got")
    // no exact match + two case-variants -> explicit ambiguity error
    val err = intercept[IllegalArgumentException] {
      GroupLimits.topKPerKey(
        base.select(col("k").as("KEY"), col("k").as("kEy"), col("id"), col("v")),
        Seq("key"), Seq(col("v").desc), 1)
    }
    assert(err.getMessage.contains("ambiguous"), err.getMessage)
  }

  test("float keys: -0.0/0.0 and NaN are ONE key each, heap and spill paths") {
    val s = spark
    import s.implicits._
    // Window partition keys get NormalizeFloatingNumbers; the custom node
    // must agree or the rank rewrite silently changes results on float keys
    val df = Seq((0.0, 1L), (-0.0, 2L), (0.0, 3L), (-0.0, 4L),
      (Double.NaN, 5L), (Double.NaN, 6L)).toDF("k", "id").repartition(3)
    def run() = GroupLimits.topKPerKey(df, Seq("k"), Seq(col("id")), 1)
      .collect().map(_.getLong(1)).toSet
    // one row per semantic key: the zero key keeps id 1, the NaN key id 5
    assert(run() === Set(1L, 5L),
      "-0.0/0.0 or NaN bit patterns split into separate keys (heap path)")
    spark.conf.set(graft.plans.TopKPerKey.MaxKeysKey, "1")
    try assert(run() === Set(1L, 5L),
      "-0.0/0.0 or NaN bit patterns split into separate keys (spill path)")
    finally spark.conf.unset(graft.plans.TopKPerKey.MaxKeysKey)
    // and the genuine WindowExec path agrees (rn kept -> no rewrite)
    val w = org.apache.spark.sql.expressions.Window.partitionBy("k").orderBy("id")
    val win = df.withColumn("rn", row_number().over(w)).filter(col("rn") <= 1)
      .collect().map(_.getLong(1)).toSet
    assert(win === Set(1L, 5L))
  }

  test("GroupLimits withTies: keeps every row tying the k-th best") {
    val got = GroupLimits.topKPerKey(crafted, Seq("k"), Seq(col("v").desc), 3,
        withTies = true)
      .orderBy(col("k"), col("v").desc, col("id"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    // key 1 ordered by v desc: 50, 40, 30, 30 (tie kept), 20 dropped
    assert(got === Seq(
      (1L, 12L, 50.0), (1L, 14L, 40.0), (1L, 10L, 30.0), (1L, 11L, 30.0),
      (2L, 21L, 7.0), (2L, 20L, 5.0),
      (3L, 30L, 1.0)))
  }
}
