package graft.functions

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** graft_topk (Misra-Gries heavy hitters): exactness when nothing evicts,
  * the coverage/under-estimate bounds when eviction is real, mergeability
  * across partitionings, and SQL callability via the extensions. */
class TopKAggSuite extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  private def sketchTop(df: org.apache.spark.sql.DataFrame, col_ : String,
                        k: Int, cap: Int): Seq[(Long, Long)] =
    df.agg(expr(s"graft_topk($col_, $k, $cap)").as("tk"))
      .selectExpr("explode(tk) AS e").select("e.key", "e.cnt")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq

  test("capacity above the key universe: sketch equals the exact top-k") {
    val li = Tables(spark, sf, "lineitem")
    val exact = li.groupBy("l_partkey").agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("l_partkey")).limit(10)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    val sk = sketchTop(li, "l_partkey", 10, 4096) // 200 distinct keys at sf0.001
    assert(sk === exact)
  }

  test("exact regime is partition-invariant (merge is counter addition)") {
    val li = Tables(spark, sf, "lineitem")
    val a = sketchTop(li.repartition(1), "l_partkey", 10, 4096)
    val b = sketchTop(li.repartition(17), "l_partkey", 10, 4096)
    assert(a === b && a.nonEmpty)
  }

  test("eviction regime: true heavy hitter survives with count error <= N/capacity") {
    import spark.implicits._
    // 10_000 rows: key 7 takes 30% of the stream, keys 1000+ are a long
    // uniform tail; capacity 32 -> error bound N/32 = 312.5
    val n = 10000
    val rows = (0 until n).map { i =>
      if (i % 10 < 3) 7L else 1000L + (i % 997)
    }
    val df = rows.toDF("key").repartition(8)
    val sk = sketchTop(df, "key", 5, 32)
    val trueCnt = rows.count(_ == 7L).toLong
    val hit = sk.find(_._1 == 7L)
    assert(hit.isDefined, s"heavy hitter must survive eviction: $sk")
    val est = hit.get._2
    assert(est <= trueCnt, "MG estimates never overcount")
    assert(trueCnt - est <= n / 32 + 1,
      s"under-estimate $est vs true $trueCnt exceeds N/capacity bound")
  }

  test("callable from SQL through the session extensions") {
    val out = spark.sql(
      s"""SELECT explode(graft_topk(l_partkey, 3, 1024)) AS e
         |FROM parquet.`$sf/lineitem.parquet`""".stripMargin)
      .select("e.key", "e.cnt").collect()
    assert(out.length === 3)
    assert(out.map(_.getLong(1)).toSeq.sorted.reverse === out.map(_.getLong(1)).toSeq)
  }

  test("graft_topk_exact: fails loudly when the universe exceeds capacity") {
    import spark.implicits._
    // 5000 distinct keys vs capacity 32: eviction is certain, and the
    // exact-contract variant must refuse to serve approximate counts
    // (this is the q_heavy_hitters_grouped trap at 100x scale — the
    // rank-window oracle assumes no eviction, so the engine enforces it)
    val big = (1L to 5000L).toDF("key").repartition(8)
    val e = intercept[Exception] {
      big.agg(expr("graft_topk_exact(key, 5, 32)")).collect()
    }
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => Option(x.getMessage).toSeq ++ msgs(x.getCause))
    assert(msgs(e).exists(_.contains("graft_topk_exact")),
      s"error must name the failed contract: ${e.getMessage}")
    // the sketch variant serves the same data without error (documented
    // approximate — with a uniform count-1 universe MG may legitimately
    // report fewer than k survivors, since the N/capacity bound >= 1)
    assert(sketchTop(big, "key", 5, 32).size <= 5)
  }

  test("graft_topk_exact: equals graft_topk when capacity covers the universe") {
    val li = Tables(spark, sf, "lineitem")
    val exact = li.agg(expr("graft_topk_exact(l_partkey, 10, 4096)").as("tk"))
      .selectExpr("explode(tk) AS e").select("e.key", "e.cnt")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(exact === sketchTop(li, "l_partkey", 10, 4096))
  }

  test("nulls are ignored and k > distinct keys yields all keys") {
    import spark.implicits._
    val df = Seq[Option[Long]](Some(1L), Some(1L), Some(2L), None, None)
      .toDF("key")
    val sk = sketchTop(df, "key", 10, 16)
    assert(sk === Seq((1L, 2L), (2L, 1L)))
  }
}
