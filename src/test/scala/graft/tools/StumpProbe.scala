package graft.tools
import org.apache.spark.sql.SparkSession
object StumpProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config(graft.Tables.NanosKey, "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.SparkEntry.entry(spark).count()
    for (_ <- 1 to 3) {
      val t0 = System.nanoTime()
      val rows = graft.SparkEntry.queries("q_ml_stump_best")(spark, "/root/testdata/sf0.1").collect()
      println(s"q_ml_stump_best sec=${(System.nanoTime()-t0)/1e9} row=${rows.mkString(";")}")
    }
    spark.stop()
  }
}
