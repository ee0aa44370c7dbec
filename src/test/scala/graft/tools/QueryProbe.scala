package graft.tools
import org.apache.spark.sql.SparkSession

/** Ad-hoc timing probe for individual queries at sf0.1.
  * Run: sbt 'Test/runMain graft.tools.QueryProbe q_dedup_minhash [q_more...]'
  * Each query runs 3 times (first includes plan/codegen warm-up). */
object QueryProbe {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: QueryProbe <query_key>...")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config(graft.Tables.NanosKey, "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.SparkEntry.entry(spark).count() // JVM/codegen warm-up
    for (q <- args; _ <- 1 to 3) {
      val t0 = System.nanoTime()
      val n = graft.SparkEntry.queries(q)(spark, "/root/testdata/sf0.1").count()
      println(s"$q rows=$n sec=${(System.nanoTime() - t0) / 1e9}")
    }
    spark.stop()
  }
}
