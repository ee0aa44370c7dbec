package graft.functions

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** graft_bloom: the JVM/SQL hash-scheme parity the whole operator rests on,
  * the no-false-negative guarantee, merge invariance across partitionings,
  * and a false-positive rate sanity bound. */
class BloomAggSuite extends SparkSpec {

  private val M = 1 << 14
  private val K = 4

  private def bloomOf(df: org.apache.spark.sql.DataFrame, keyCol: String): org.apache.spark.sql.DataFrame =
    df.agg(expr(s"graft_bloom($keyCol, $M, $K)").as("bf"))

  private def probe(keys: org.apache.spark.sql.DataFrame, bf: org.apache.spark.sql.DataFrame,
                    keyCol: String): org.apache.spark.sql.DataFrame =
    keys.join(broadcast(bf))
      .filter(expr(BloomAgg.mightContainSql(keyCol, "bf", M, K)))

  test("hash-scheme parity: SQL xxhash64 chain equals the JVM-side XXH64 chain") {
    import spark.implicits._
    import org.apache.spark.sql.catalyst.expressions.XXH64
    val vals = Seq(0L, 1L, -1L, 42L, Long.MaxValue, Long.MinValue, 123456789L)
    val pairsSql = vals.toDF("key")
      .select(col("key"), xxhash64(col("key")).as("h1"), xxhash64(col("key"), col("key")).as("h2"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    vals.foreach { v =>
      val h1 = XXH64.hashLong(v, 42L)
      val h2 = XXH64.hashLong(v, h1)
      assert(pairsSql(v) === ((h1, h2)), s"xxhash64 chain diverged for $v")
    }
  }

  test("no false negatives: every inserted key probes true") {
    import spark.implicits._
    val keys = (1L to 5000L).map(_ * 7919L).toDF("key")
    val bf = bloomOf(keys, "key")
    assert(probe(keys, bf, "key").count() === 5000L)
  }

  test("IntegerType keys: build and probe agree (probe casts to bigint)") {
    import spark.implicits._
    // without the cast in mightContainSql, xxhash64(int_col) would use the
    // INT hash path while update() hashes the widened long -> silent false
    // negatives; this pins the widened-long contract for int columns
    val keys = (1 to 3000).toDF("key") // IntegerType
    val bf = keys.agg(expr(s"graft_bloom(key, $M, $K)").as("bf"))
    assert(probe(keys, bf, "key").count() === 3000L)
  }

  test("merge invariance: bitset identical under any partitioning (OR is commutative)") {
    import spark.implicits._
    val keys = (1L to 2000L).toDF("key")
    val a = bloomOf(keys.repartition(1), "key").collect().head.getSeq[Long](0)
    val b = bloomOf(keys.repartition(13), "key").collect().head.getSeq[Long](0)
    assert(a === b)
    assert(a.exists(_ != 0L))
  }

  test("false-positive rate stays within 5x the analytic bound on disjoint keys") {
    import spark.implicits._
    val inserted = (1L to 1000L).toDF("key")
    val bf = bloomOf(inserted, "key")
    val foreign = (1000001L to 1020000L).toDF("key") // 20k keys, disjoint
    val fp = probe(foreign, bf, "key").count()
    // p = (1 - e^(-kn/m))^k with n=1000, m=2^14, k=4 -> ~0.0024
    val p = math.pow(1 - math.exp(-K.toDouble * 1000 / M), K)
    assert(fp <= (5 * p * 20000).ceil.toLong, s"fp=$fp vs bound ${5 * p * 20000}")
  }

  test("NULL probe key is 'not contained', never a spurious pass") {
    import spark.implicits._
    // xxhash64 skips NULL inputs and returns the seed, so an unguarded
    // probe would test the fixed hash-of-seed positions — insert enough
    // keys that those positions are likely set, then probe NULL
    val keys = (1L to 5000L).toDF("key")
    val bf = bloomOf(keys, "key")
    val nulls = Seq[Option[Long]](None).toDF("key")
    assert(probe(nulls, bf, "key").count() === 0L, "NULL key passed the filter")
    // and non-null keys still probe true alongside the guard
    assert(probe(keys, bf, "key").count() === 5000L)
  }

  test("q_join_bloom prefilter is exact: bloom-then-join equals the plain join") {
    val sf = "/root/testdata/sf0.001"
    val got = graft.queries.Relational.queries("q_join_bloom")(spark, sf).collect().head
    val dim = Tables(spark, sf, "orders")
      .filter(col("o_orderstatus") === "P" && col("o_orderpriority") === "1-URGENT")
      .select("o_orderkey")
    val plain = Tables(spark, sf, "lineitem")
      .join(dim, col("l_orderkey") === col("o_orderkey"))
      .agg(count(lit(1)).as("n_items"), countDistinct("l_orderkey").as("n_orders"),
        sum(col("l_extendedprice").cast("decimal(22,6)")).cast("double").as("revenue"))
      .collect().head
    assert(got === plain)
  }
}
