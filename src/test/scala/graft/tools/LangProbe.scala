package graft.tools
import org.apache.spark.sql.SparkSession
object LangProbe {
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
      val n = graft.SparkEntry.queries("q_text_lang_id")(spark, "/root/testdata/sf0.1").count()
      println(s"q_text_lang_id rows=$n sec=${(System.nanoTime()-t0)/1e9}")
    }
    spark.stop()
  }
}
