package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Measures SemDeDup's pairs ~ n²/k division directly: trained-Lloyd
  * centroids at k ∈ {4, 8, 32, 64} over the sf0.1 embeddings, counting
  * the within-cluster candidate pairs the pairwise stage evaluates
  * (before the cosine threshold). Evidence for the BASELINE.md table:
  * the gate pins k = 8 for oracle parity, production grows k with n.
  * Run: sbt 'Test/runMain graft.tools.SemDedupKSweep' */
object SemDedupKSweep {
  def main(args: Array[String]): Unit = {
    val s = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config(graft.Tables.NanosKey, "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    graft.functions.VectorFunctions.register(s)
    val d = "/root/testdata/sf0.1"
    val emb = graft.Tables(s, d, "embeddings")
    val corpus = emb.filter(col("vec_id") >= 8)
    val e = corpus.select(col("vec_id"),
      col("embedding").cast("array<double>").as("v"))
    val n = e.count()
    val brute = n * (n - 1) / 2
    println(s"n=$n brute_pairs=$brute")
    for (k <- Seq(4, 8, 32, 64)) {
      val model = graft.ml.IvfIndex.train(corpus, k = k, iters = 2)
      val cent = s.createDataFrame(
        s.sparkContext.parallelize(model.centroids.zipWithIndex.toSeq.map {
          case (c, i) => org.apache.spark.sql.Row(i.toLong, c.toSeq) }, 1),
        org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("cent_id",
            org.apache.spark.sql.types.LongType),
          org.apache.spark.sql.types.StructField("centv",
            org.apache.spark.sql.types.ArrayType(
              org.apache.spark.sql.types.DoubleType)))))
      // candidate pairs BEFORE the cosine filter = the work the pairwise
      // stage evaluates; same assignment expression as semanticDedup
      val wA = org.apache.spark.sql.expressions.Window
        .partitionBy("vec_id").orderBy(col("cc").desc, col("cent_id"))
      val assign = e.crossJoin(broadcast(cent))
        .select(col("vec_id"), col("cent_id"),
          round(expr("graft_dot(v, centv) / sqrt(graft_dot(v, v) * graft_dot(centv, centv))"), 4).as("cc"))
        .withColumn("rn", row_number().over(wA)).filter(col("rn") === 1)
        .select("vec_id", "cent_id")
      val sizes = assign.groupBy("cent_id").agg(count(lit(1)).as("m"))
        .collect().map(r => r.getLong(1))
      val pairs = sizes.map(m => m * (m - 1) / 2).sum
      println(f"k=$k%-4d cells=${sizes.length}%-4d max_cell=${sizes.max}%-6d " +
        f"pairs=$pairs%-10d frac_of_brute=${pairs.toDouble / brute}%.4f " +
        f"ideal_1_over_k=${1.0 / k}%.4f")
    }
    s.stop()
  }
}
