package graft.tools
import org.apache.spark.sql.SparkSession
object KnnProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config(graft.Tables.NanosKey, "true").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val emb = graft.Tables(spark, "/root/testdata/sf0.1", "embeddings")
    emb.count()
    def t(label: String)(f: => Long): Unit = {
      (1 to 2).foreach { _ =>
        val t0 = System.nanoTime(); val n = f
        println(f"[probe] $label%-24s ${(System.nanoTime()-t0)/1e9}%6.2f s ($n rows)")
      }
    }
    t("seed only (iters=0)") { graft.ml.KnnGraph.build(emb, 5, 0).count() }
    t("1 descent") { graft.ml.KnnGraph.build(emb, 5, 1).count() }
    spark.stop()
  }
}
