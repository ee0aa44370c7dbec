package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

object OpqProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[16]")
      .config("spark.sql.shuffle.partitions", "16")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    def lcg(s: Long): Long = s * 6364136223846793005L + 1442695040888963407L
    def u01(s0: Long): Double = { val s = lcg(lcg(s0)); (s >>> 11).toDouble / (1L << 53).toDouble }
    val d = 64; val rank = 8
    // dense signal directions (not axis-aligned): low-rank latent + noise
    val g = Array.tabulate(rank, d)((t, i) => u01(t * 977L + i * 31L + 7) - 0.5)
    def mk(n: Int, base: Long) = (0 until n).map { r =>
      val a = Array.tabulate(rank)(t => (3.0 / (1 + t)) * (u01(base + r * 17L + t * 131L) - 0.5))
      val x = Array.tabulate(d) { i =>
        var s = 0.0; var t = 0; while (t < rank) { s += a(t) * g(t)(i); t += 1 }
        (s + 0.02 * (u01(base + 7919L * r + i) - 0.5)).toFloat
      }
      ((base + r), x.toSeq)
    }.toDF("vec_id", "embedding")
    val corpus = mk(800, 0); val qs = mk(40, 100000)

    graft.functions.VectorFunctions.register(spark)
    def nrm(df: org.apache.spark.sql.DataFrame, id: String, vc: String) =
      df.select(col("vec_id").as(id),
        expr("transform(CAST(embedding AS array<double>), x -> x / sqrt(graft_dot(CAST(embedding AS array<double>), CAST(embedding AS array<double>))))").as(vc))
    val w = org.apache.spark.sql.expressions.Window.partitionBy("q_id").orderBy(col("cos").desc, col("c_id"))
    val brute = nrm(qs, "q_id", "qv").crossJoin(nrm(corpus, "c_id", "cv"))
      .withColumn("cos", expr("graft_dot(qv, cv)"))
      .withColumn("rn", row_number().over(w)).filter(col("rn") <= 5)
      .select("q_id", "c_id").collect().groupBy(_.getLong(0)).map { case (q, r) => q -> r.map(_.getLong(1)).toSet }
    for (rot <- Seq(false, true); src <- Seq("lowrank")) {
      val dir = java.nio.file.Files.createTempDirectory(s"opq-$rot").toString + "/idx"
      graft.ml.IvfIndex.buildPqIndex(corpus, k = 8, iters = 3, m = 16, ksub = 16, pqIters = 3, dir, rotate = rot)
      val got = graft.ml.IvfIndex.searchPqIndex(spark, dir, qs, topK = 5, nprobe = 8)
        .collect().groupBy(_.getLong(0)).map { case (q, r) => q -> r.map(_.getLong(2)).toSet }
      val rec = brute.map { case (q, top) => got.get(q).map(gg => top.count(gg.contains).toDouble / top.size).getOrElse(0.0) }
      println(f"OPQPROBE src=$src rotate=$rot recall@5=${rec.sum / rec.size}%.3f")
    }
    // real corpus too
    val emb = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
    val c2 = emb.filter(col("vec_id") >= 10); val q2 = emb.filter(col("vec_id") < 10)
    val brute2 = nrm(q2, "q_id", "qv").crossJoin(nrm(c2, "c_id", "cv"))
      .withColumn("cos", expr("graft_dot(qv, cv)"))
      .withColumn("rn", row_number().over(w)).filter(col("rn") <= 5)
      .select("q_id", "c_id").collect().groupBy(_.getLong(0)).map { case (q, r) => q -> r.map(_.getLong(1)).toSet }
    for (rot <- Seq(false, true)) {
      val dir = java.nio.file.Files.createTempDirectory(s"opq-real-$rot").toString + "/idx"
      graft.ml.IvfIndex.buildPqIndex(c2, k = 8, iters = 3, m = 16, ksub = 16, pqIters = 3, dir, rotate = rot)
      val got = graft.ml.IvfIndex.searchPqIndex(spark, dir, q2, topK = 5, nprobe = 8)
        .collect().groupBy(_.getLong(0)).map { case (q, r) => q -> r.map(_.getLong(2)).toSet }
      val rec = brute2.map { case (q, top) => got.get(q).map(gg => top.count(gg.contains).toDouble / top.size).getOrElse(0.0) }
      println(f"OPQPROBE src=real rotate=$rot recall@5=${rec.sum / rec.size}%.3f")
    }
    spark.stop()
  }
}
