package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Micro-bench: TopKPerKey heap operator vs the window formulation on the
  * same data/keys. Run: sbt 'Test/runMain graft.tools.TimeTopKPerKey <sfDir>' */
object TimeTopKPerKey {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val o = graft.Tables(spark, sfDir, "lineitem")
      .select("l_orderkey", "l_linenumber", "l_extendedprice")
    def time(label: String)(f: => Long): Unit = {
      (1 to 3).map { _ =>
        val t0 = System.nanoTime(); val n = f; (System.nanoTime() - t0) / 1e9 -> n
      }.foreach { case (s, n) => println(f"$label%-10s $s%6.3f s  ($n rows)") }
    }
    time("operator") {
      graft.operators.GroupLimits.topKPerKey(o, Seq("l_orderkey"),
        Seq(col("l_extendedprice").desc, col("l_linenumber")), 2).count()
    }
    time("window") {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("l_orderkey").orderBy(col("l_extendedprice").desc, col("l_linenumber"))
      o.withColumn("rn", row_number().over(w)).filter(col("rn") <= 2).drop("rn").count()
    }
    spark.stop()
  }
}
