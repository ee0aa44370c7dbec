package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** ANN speed/recall curve at sf0.1: recall@5 and latency of the trained
  * IVF index at every nprobe, against the brute-force witness and the
  * int8-quantized scan. IvfIndexSuite pins two points of this curve
  * (nprobe=k exact, nprobe=2 recall floor); the committed artifact
  * (ANN_CURVE.json, table in BASELINE.md) makes the whole trade visible
  * and regression-comparable across rounds.
  *
  * Run: sbt 'Test/runMain graft.tools.AnnCurve'
  */
object AnnCurve {

  private def median(xs: Seq[Double]): Double = {
    val s = xs.sorted; s(s.length / 2)
  }

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config(graft.Tables.NanosKey, "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.functions.VectorFunctions.register(spark)

    val emb = graft.Tables(spark, sfDir, "embeddings")
    val corpus = emb.filter(col("vec_id") >= 10)
    val queries = emb.filter(col("vec_id") < 10)
    val k = 16

    // ground truth: exact cosine top-5 per query (ties to lowest c_id)
    def topIds(df: org.apache.spark.sql.DataFrame): Map[Long, Seq[Long]] =
      df.collect().groupBy(_.getLong(0))
        .map { case (q, rows) => q -> rows.sortBy(_.getInt(1)).map(_.getLong(2)).toSeq }
    def norm(df: org.apache.spark.sql.DataFrame, idCol: String, vCol: String) =
      df.select(col("vec_id").as(idCol),
        expr("transform(CAST(embedding AS array<double>), x -> x / sqrt(graft_dot(CAST(embedding AS array<double>), CAST(embedding AS array<double>))))").as(vCol))
    def bruteDf = {
      val w = Window.partitionBy("q_id").orderBy(col("cos").desc, col("c_id"))
      norm(queries, "q_id", "qv").crossJoin(norm(corpus, "c_id", "cv"))
        .withColumn("cos", expr("graft_dot(qv, cv)"))
        .withColumn("rn", row_number().over(w).cast("int")).filter(col("rn") <= 5)
        .select("q_id", "rn", "c_id")
    }
    val exact = topIds(bruteDf)
    def recallOf(got: Map[Long, Seq[Long]]): Double = {
      val rs = exact.map { case (q, top) =>
        got.get(q).map(g => top.count(g.contains).toDouble / top.size).getOrElse(0.0)
      }
      rs.sum / rs.size
    }
    def time3(f: => Unit): Double =
      median((1 to 3).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      })

    val rows = scala.collection.mutable.ArrayBuffer[(String, Double, Double)]()
    rows += (("brute_force", 1.0, time3(bruteDf.collect())))

    // int8-quantized brute scan (the q_sim_topk_quant kernel): symmetric
    // per-vector scale = maxabs/127, integer dot re-scaled — recall hit is
    // the quantization error, latency is the 1-byte-per-dim scan's
    val quant = {
      val q8 = emb.withColumn("v", expr("CAST(embedding AS array<double>)"))
        .withColumn("scale", expr("aggregate(v, 0D, (a, x) -> greatest(a, abs(x))) / 127"))
        .withColumn("q", expr(
          "transform(v, x -> CAST(round(CASE WHEN scale = 0D THEN 0D ELSE x / scale END) AS INT))"))
        .select(col("vec_id"), col("scale"), col("q"))
      val qq = q8.filter(col("vec_id") < 10)
        .select(col("vec_id").as("q_id"), col("scale").as("qs"), col("q").as("qv"))
      val cc = q8.filter(col("vec_id") >= 10)
        .select(col("vec_id").as("c_id"), col("scale").as("cs"), col("q").as("cv"))
      val w = Window.partitionBy("q_id").orderBy(col("score").desc, col("c_id"))
      qq.crossJoin(cc)
        .withColumn("idot",
          expr("aggregate(zip_with(qv, cv, (a, b) -> CAST(a AS BIGINT) * b), 0L, (s, x) -> s + x)"))
        .withColumn("score", col("idot").cast("double") * col("qs") * col("cs"))
        .withColumn("rn", row_number().over(w).cast("int")).filter(col("rn") <= 5)
        .select("q_id", "rn", "c_id")
    }
    rows += (("int8_brute", recallOf(topIds(quant)), time3(quant.collect())))

    val model = graft.ml.IvfIndex.train(corpus, k = k, iters = 3)
    for (nprobe <- Seq(1, 2, 4, 8, 16)) {
      def run = graft.ml.IvfIndex.search(spark, corpus, queries, model,
        topK = 5, nprobe = nprobe).select("q_id", "rn", "c_id")
      rows += ((s"ivf_nprobe_$nprobe", recallOf(topIds(run)), time3(run.collect())))
    }

    // whitened-ANN composition (the q_ann_ivf_pca pipeline): IVF in the
    // randomized-PCA-whitened 16-dim space, recall measured against the
    // RAW-space exact top-5 — the end-user metric of the preprocessing
    // trade (dim reduction changes the metric; what matters is how many
    // true full-space neighbors survive it at 1/4 the dot work)
    // fit on the corpus only — the build-time model must not see queries
    val pcaModel = graft.ml.Pca.fitRandomized(corpus, k = 16)
    val proj = graft.ml.Pca.transform(emb, pcaModel, whiten = true)
      .select(col("vec_id"), col("proj").as("embedding"))
    val wc = proj.filter(col("vec_id") >= 10)
    val wq = proj.filter(col("vec_id") < 10)
    val wModel = graft.ml.IvfIndex.train(wc, k = k, iters = 3)
    for (nprobe <- Seq(2, 4, 8, 16)) {
      def run = graft.ml.IvfIndex.search(spark, wc, wq, wModel,
        topK = 5, nprobe = nprobe).select("q_id", "rn", "c_id")
      rows += ((s"pca16_ivf_nprobe_$nprobe", recallOf(topIds(run)), time3(run.collect())))
    }

    // IVF-PQ rows (the q_ann_ivf_pq pipeline): codes-only ADC serving at
    // ~32–64× compression. Recall on THIS corpus is the documented honest
    // negative — unclustered Gaussians leave no residual structure for
    // the codebooks; IvfIndexSuite pins the high-recall regime (0.86+)
    // on a structured-residual fixture and exact reconstruction when the
    // codebooks cover every residual.
    val pqDir = java.nio.file.Files.createTempDirectory("ann-curve-pq").toString + "/idx"
    graft.ml.IvfIndex.buildPqIndex(corpus, k = k, iters = 3,
      m = 16, ksub = 16, pqIters = 3, pqDir, keepFloat = true)
    for (nprobe <- Seq(2, 4, 8, 16)) {
      def run = graft.ml.IvfIndex.searchPqIndex(spark, pqDir, queries,
        topK = 5, nprobe = nprobe).select("q_id", "rn", "c_id")
      rows += ((s"ivfpq_m16_nprobe_$nprobe", recallOf(topIds(run)), time3(run.collect())))
    }

    // Two-tier serving (ADC shortlist -> exact float re-rank of R rows):
    // the recall-restoring second stage. At R large enough to cover the
    // probed candidates this MUST meet the float IVF row at the same
    // nprobe (suite-pinned bit-equality); the sweep shows how fast small
    // R closes the gap on a corpus where ADC order is noisy.
    for (nprobe <- Seq(2, 8, 16); rr <- Seq(25, 100)) {
      def run = graft.ml.IvfIndex.searchPqIndex(spark, pqDir, queries,
        topK = 5, nprobe = nprobe, rerank = rr).select("q_id", "rn", "c_id")
      rows += ((s"ivfpq_rerank${rr}_nprobe_$nprobe", recallOf(topIds(run)),
        time3(run.collect())))
    }

    // OPQ-rotated IVF-PQ (Ge et al. 2013 non-parametric init: PCA axes
    // dealt round-robin across subspaces; orthonormal, no centering —
    // q·v preserved exactly). On correlated data the suite pins a 2-3×
    // recall lift; on these isotropic Gaussians the covariance is ~I so
    // the rotation is near-arbitrary — whatever delta shows here is the
    // honest null, measured not asserted.
    val opqDir = java.nio.file.Files.createTempDirectory("ann-curve-opq").toString + "/idx"
    graft.ml.IvfIndex.buildPqIndex(corpus, k = k, iters = 3,
      m = 16, ksub = 16, pqIters = 3, opqDir, rotate = true)
    for (nprobe <- Seq(2, 8, 16)) {
      def run = graft.ml.IvfIndex.searchPqIndex(spark, opqDir, queries,
        topK = 5, nprobe = nprobe).select("q_id", "rn", "c_id")
      rows += ((s"ivfpq_opq_nprobe_$nprobe", recallOf(topIds(run)), time3(run.collect())))
    }

    rows.foreach { case (name, recall, sec) =>
      println(f"[ann] $name%-16s recall@5=${recall}%5.3f  ${sec}%6.3f s")
    }
    val json = "{\n  \"sf\": \"" + sfDir.split('/').last + "\", \"k\": " + k +
      ", \"topK\": 5, \"queries\": " + exact.size + ",\n  \"curve\": [\n" +
      rows.map { case (n, r, s) =>
        f"""    {"variant":"$n","recall_at_5":$r%.4f,"sec":$s%.3f}"""
      }.mkString(",\n") +
      "\n  ],\n  \"note\": \"recall vs exact cosine top-5 (ties to lowest id); sec = " +
      "median-of-3 collect of the search, local[32]; testdata embeddings are " +
      "unclustered Gaussians, so nprobe/k bounds recall more tightly than a real " +
      "clustered corpus would. The pca16_* rows are the HONEST NEGATIVE on this " +
      "corpus: near-isotropic 64-dim pair cosines concentrate at std ~1/sqrt(64), " +
      "and any 16-dim projection adds ranking noise ~1/sqrt(16) that swamps the " +
      "top-5 gaps - raw-space recall collapses EVEN AT nprobe=k (the composition " +
      "mechanics are exact: IvfIndexSuite pins whitened-space nprobe=k == whitened " +
      "brute force; what costs is the metric change itself). Dim-reduce-then-index " +
      "is a spectral-decay trade: on the suite's planted decaying spectrum the " +
      "same 16 axes carry >99 percent of variance and neighbor structure survives; " +
      "a production corpus sits between, which is why the pipeline ships with the " +
      "recall curve rather than a blanket claim. The ivfpq_* rows are the same " +
      "honest negative one rung further down the compression ladder (codes-only " +
      "ADC, ~32-64x): residual codebooks need residual STRUCTURE, and this corpus " +
      "has none - IvfIndexSuite pins recall 0.86+ on a structured-residual fixture " +
      "and exact ADC==brute reconstruction when codebooks cover every residual. " +
      "The ivfpq_rerank* rows are the two-tier repair: exact float re-rank of the " +
      "ADC top-R restores the float IVF recall at the same nprobe while the scan " +
      "stays over codes - the quantization loss is recoverable, the nprobe loss " +
      "is not\"\n}\n"
    java.nio.file.Files.write(java.nio.file.Paths.get("ANN_CURVE.json"),
      json.getBytes("UTF-8"))
    println("wrote ANN_CURVE.json")
    spark.stop()
  }
}
