package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Stage-level timing of the wide quality probe at sf0.1 — where do the
  * gate's seconds go? Run: sbt 'Test/runMain graft.tools.QpwProbe'. */
object QpwProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config(graft.Tables.NanosKey, "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.SparkEntry.entry(spark).count()
    val docs = graft.Tables(spark, "/root/testdata/sf0.1", "documents")
    def t[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"$name%-28s ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    val ngrams = args.lift(0).map(_.toInt).getOrElse(1)
    val denseLimit = args.lift(1).map(_.toInt).getOrElse(graft.ml.SparseRidge.DenseLimit)
    for (round <- 1 to 2) {
      println(s"--- round $round (ngrams=$ngrams denseLimit=$denseLimit)")
      val feat = graft.queries.LlmOps.hashedTfXxh(docs, 1L << 18, ngrams)
        .select(col("doc_id").as("id"), col("dim"), col("v"))
      t("feat count")(feat.count())
      println("active dims: " + feat.select("dim").distinct().count())
      val labels = docs.select(col("doc_id").as("id"),
        (length(col("text")) % 2).cast("double").as("y"))
      val m = t("fit")(graft.ml.SparseRidge.fit(feat, labels, denseLimit = denseLimit))
      t("score count")(graft.ml.SparseRidge.score(feat, m).count())
      t("full qualityProbeWide")(graft.queries.LlmOps.qualityProbeWide(docs, ngrams = ngrams).count())
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = false))
    }
    spark.stop()
  }
}
