package graft.ml

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Closed-form LINEAR PROBE over fixed-dimension embeddings — the
  * standard embedding-quality diagnostic in LLM work ("probe accuracy"):
  * a one-vs-rest ridge classifier fit by the normal equations, no
  * iterations, no learning rate.
  *
  * Distributed shape — the only data-scale work is ONE aggregation pass:
  *   - Gram matrix G = Xᵀ X over the bias-augmented embeddings
  *     ((d+1)² cells via two chained posexplodes, partial-aggregated
  *     map-side to ≤ (d+1)² rows per partition before the shuffle);
  *   - per-class moment vectors Xᵀ y_c, which for one-hot targets are
  *     just the per-label feature sums (one groupBy(label, i) pass).
  *   Both collect as META rows (≤ (d+1)² + classes·(d+1) values — fixed
  *   size, data-independent), the (d+1)×(d+1) solve is driver arithmetic
  *   (LU with partial pivoting, one factorization reused across the
  *   class right-hand sides), and scoring is a codegen'd graft_dot
  *   against literal weight arrays — argmax via array_max over
  *   (score, -class) structs, ties to the smallest class. No UDF, no
  *   driver loop over rows anywhere.
  *
  * Determinism: both aggregation passes sum scaled LONGS on a fixed
  * 1e-9 grid (exact in any order — see [[gridSum]] for why not the
  * DECIMAL(38,18) discipline here), so G and the moments are
  * partition-order exact; the solve and the scoring plan are then pure
  * functions of exact inputs — results are identical across
  * partitionings (suite-pinned).
  */
object LinearProbe {

  /** classes (ascending) and one augmented weight vector per class
    * (last entry = bias). */
  final case class Model(classes: Array[Long], weights: Array[Array[Double]])

  /** Order-independent exact sum via a fixed 1e-9 grid: terms round to
    * scaled LONGS (deterministic), longs sum exactly in any order, the
    * driver rescales. Chosen over DECIMAL(38,18) sums (the PageRank
    * discipline) because 128-bit decimal aggregation measured 8x slower
    * on the (d+1)² Gram pass; the nano grid loses nothing a probe can
    * feel, and overflow headroom is ~1e8 rows at embedding magnitudes
    * (|x_i·x_j| ≲ 25 → ≤ 2.5e10 per row on the grid vs the 9.2e18 long
    * range). */
  private def gridSum(c: org.apache.spark.sql.Column) =
    sum(round(c * 1e9).cast("long"))
  private val Grid = 1e9

  /** Fit on (embedding: array<float|double>, label: long) rows. `lambda`
    * is the ridge strength (the bias row is regularized too — at probe
    * scale the distinction is noise, and it keeps the solve unconditional). */
  def fit(train: DataFrame, lambda: Double = 1.0): Model = {
    require(lambda > 0, s"need lambda > 0, got $lambda")
    val aug = train.select(col("label").cast("long").as("label"),
      expr("concat(CAST(embedding AS array<double>), array(CAST(1 AS DOUBLE)))").as("x"))
    val d = aug.select(size(col("x"))).head().getInt(0)
    // the outer-product cells as ONE flattened HOF array per row, then a
    // single posexplode of scalars (a chained double-posexplode carries
    // the whole vector on every intermediate row — measured 65x heavier);
    // partial aggregation collapses to <= (d+1)^2 rows per partition
    // before the shuffle. At extreme scale the same Gram is a
    // treeAggregate over primitive arrays — this shape keeps it
    // declarative and decimal-exact.
    val gram = aug
      .select(posexplode(expr(
        "flatten(transform(x, xi -> transform(x, xj -> xi * xj)))"))
        .as(Seq("ij", "p")))
      .groupBy("ij").agg(gridSum(col("p")).as("g"))
      .collect()
    val moments = aug
      .select(col("label"), posexplode(col("x")).as(Seq("i", "xi")))
      .groupBy("label", "i").agg(gridSum(col("xi")).as("m"))
      .collect()
    val g = Array.ofDim[Double](d, d)
    gram.foreach(r => g(r.getInt(0) / d)(r.getInt(0) % d) = r.getLong(1) / Grid)
    (0 until d).foreach(i => g(i)(i) += lambda)
    val classes = moments.map(_.getLong(0)).distinct.sorted
    val rhs = classes.map { c =>
      val v = Array.ofDim[Double](d)
      moments.filter(_.getLong(0) == c).foreach(r => v(r.getInt(1)) = r.getLong(2) / Grid)
      v
    }
    Model(classes, solveMany(g, rhs))
  }

  /** Solve A·w = b for each b, one LU factorization (partial pivoting)
    * shared across right-hand sides. A is mutated (it is ours). */
  private def solveMany(a: Array[Array[Double]], bs: Array[Array[Double]]): Array[Array[Double]] = {
    val n = a.length
    val perm = Array.tabulate(n)(identity)
    for (k <- 0 until n) {
      val p = (k until n).maxBy(r => math.abs(a(r)(k)))
      require(math.abs(a(p)(k)) > 0, s"singular Gram matrix at column $k")
      if (p != k) {
        val t = a(p); a(p) = a(k); a(k) = t
        val tp = perm(p); perm(p) = perm(k); perm(k) = tp
      }
      for (r <- k + 1 until n) {
        val f = a(r)(k) / a(k)(k)
        a(r)(k) = f
        for (c <- k + 1 until n) a(r)(c) -= f * a(k)(c)
      }
    }
    bs.map { b0 =>
      val b = perm.map(b0)
      for (k <- 0 until n; r <- k + 1 until n) b(r) -= a(r)(k) * b(k)
      for (k <- n - 1 to 0 by -1) {
        for (c <- k + 1 until n) b(k) -= a(k)(c) * b(c)
        b(k) /= a(k)(k)
      }
      b
    }
  }

  /** Platt-style margin calibration: fit p(correct | margin) =
    * sigmoid(a·margin + b) by Newton-Raphson so the probe's raw argmax
    * margins become usable confidences. Join-shaped: each Newton step is
    * ONE aggregation over the scored frame (five grid-long sums of the
    * gradient/Hessian terms — the [[gridSum]] discipline, so the fit is
    * partition-order exact); a and b are driver scalars folded in as
    * literals per step — no collect of data rows, no driver loop over
    * rows. A small L2 term (1e-6) keeps the 2×2 solve unconditional on
    * degenerate inputs (all-correct / all-wrong). */
  def calibrate(scored: DataFrame, iters: Int = 8): (Double, Double) = {
    require(iters >= 1, s"need iters >= 1, got $iters")
    var (a, b) = (0.0, 0.0)
    val base = scored.select(col("margin").cast("double").as("m"),
      (col("pred") === col("label")).cast("double").as("y"))
    for (_ <- 1 to iters) {
      val p = expr(s"1.0D / (1.0D + exp(-(${a}D * m + ${b}D)))")
      val r = base
        .select(p.as("p"), col("m"), col("y"))
        .agg(gridSum((col("p") - col("y")) * col("m")).as("g1"),
          gridSum(col("p") - col("y")).as("g2"),
          gridSum(col("p") * (lit(1.0) - col("p")) * col("m") * col("m")).as("h11"),
          gridSum(col("p") * (lit(1.0) - col("p")) * col("m")).as("h12"),
          gridSum(col("p") * (lit(1.0) - col("p"))).as("h22"))
        .head()
      val Seq(g1, g2, h11r, h12, h22r) =
        (0 until 5).map(i => r.getLong(i) / Grid)
      val (h11, h22) = (h11r + 1e-6, h22r + 1e-6)
      val det = h11 * h22 - h12 * h12
      a -= (h22 * g1 - h12 * g2) / det
      b -= (h11 * g2 - h12 * g1) / det
    }
    (a, b)
  }

  /** Add `confidence` = sigmoid(a·margin + b) from [[calibrate]]'s fit. */
  def withConfidence(scored: DataFrame, a: Double, b: Double): DataFrame =
    scored.withColumn("confidence",
      round(expr(s"1.0D / (1.0D + exp(-(${a}D * margin + ${b}D)))"), 6))

  /** Score (vec_id, embedding[, …]) rows: adds `pred` (argmax class,
    * ties to the smallest) and `margin` (best minus second-best score).
    * Pure codegen'd column expressions over literal weights. */
  def predict(df: DataFrame, model: Model): DataFrame = {
    graft.functions.VectorFunctions.register(df.sparkSession)
    def lits(w: Array[Double]): String =
      "array(" + w.map(v => s"${v}D").mkString(",") + ")"
    val scored = model.classes.zip(model.weights).map { case (c, w) =>
      s"named_struct('s', graft_dot(_xa, ${lits(w)}), 'nc', ${-c}L)"
    }.mkString("array(", ",", ")")
    df.withColumn("_xa",
        expr("concat(CAST(embedding AS array<double>), array(CAST(1 AS DOUBLE)))"))
      .withColumn("_sc", expr(scored))
      .withColumn("pred", -expr("array_max(_sc).nc"))
      .withColumn("margin", expr(
        "array_max(_sc).s - array_max(filter(_sc, e -> e.nc != array_max(_sc).nc)).s"))
      .drop("_xa", "_sc")
  }
}
