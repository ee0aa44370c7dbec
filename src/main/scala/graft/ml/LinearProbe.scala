package graft.ml

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Closed-form LINEAR PROBE over fixed-dimension embeddings — the
  * standard embedding-quality diagnostic in LLM work ("probe accuracy"):
  * a one-vs-rest ridge classifier fit by the normal equations, no
  * iterations, no learning rate.
  *
  * Distributed shape — the only data-scale work is ONE aggregation pass:
  * `agg(graft_gram(x), graft_moments(label, x))` computes the Gram matrix
  * G = Xᵀ X over the bias-augmented embeddings AND the per-class one-hot
  * moment vectors Xᵀ y_c in a single scan through two mergeable
  * primitive-buffer aggregates ([[graft.functions.GramAgg]] /
  * [[graft.functions.MomentsAgg]]): each partition folds its rows into
  * one (d+1)²-cell buffer + one d-vector per class, and the shuffle
  * carries ONE buffer per partition — never a d²-per-row explode (the
  * previous declarative form materialized 4225 rows per input row at
  * d=65; see fitViaExplode, retained as the suite's bit-identity
  * witness). The result row is META (≤ (d+1)² + classes·(d+1) values —
  * fixed size, data-independent), the (d+1)×(d+1) solve is driver
  * arithmetic (LU with partial pivoting, one factorization reused across
  * the class right-hand sides), and scoring is a codegen'd graft_dot
  * against literal weight arrays — argmax via array_max over
  * (score, -class) structs, ties to the smallest class. No UDF, no
  * driver loop over rows anywhere.
  *
  * Determinism: both aggregates accumulate on a fixed 1e-9 grid with
  * exact 128-bit integer cells ([[graft.functions.Grid128]] — order-
  * independent in any partitioning, one float rounding at eval), so G and
  * the moments are partition-order exact; the solve and the scoring plan
  * are then pure functions of exact inputs — results are identical across
  * partitionings (suite-pinned). Overflow headroom: ≥1e27 rows (vs ~4e8
  * for the single-long grid the explode witness uses).
  */
object LinearProbe {

  /** classes (ascending) and one augmented weight vector per class
    * (last entry = bias). */
  final case class Model(classes: Array[Long], weights: Array[Array[Double]])

  /** Order-independent exact sum via a fixed 1e-9 grid: terms round to
    * scaled LONGS (deterministic — `floor(v·1e9 + 0.5)`, plain IEEE ops,
    * exactly [[graft.functions.Grid128.toGrid]] so the declarative witness
    * and the aggregate produce identical cells), longs sum exactly in any
    * order, the driver rescales. Chosen over DECIMAL(38,18) sums (the
    * PageRank discipline) because 128-bit decimal aggregation measured 8x
    * slower on the (d+1)² Gram pass; the nano grid loses nothing a probe
    * can feel. */
  private def gridSum(c: org.apache.spark.sql.Column) =
    sum(floor(c * lit(Grid) + lit(0.5)))
  private val Grid = 1e9

  private def augmented(df: DataFrame): DataFrame =
    df.select(col("label").cast("long").as("label"),
      expr("concat(CAST(embedding AS array<double>), array(CAST(1 AS DOUBLE)))").as("x"))

  /** Fit on (embedding: array<float|double>, label: long) rows. `lambda`
    * is the ridge strength (the bias row is regularized too — at probe
    * scale the distinction is noise, and it keeps the solve unconditional). */
  def fit(train: DataFrame, lambda: Double = 1.0): Model = {
    require(lambda > 0, s"need lambda > 0, got $lambda")
    graft.functions.VectorFunctions.register(train.sparkSession)
    val row = augmented(train)
      .agg(expr("graft_gram(x)").as("g"), expr("graft_moments(label, x)").as("m"))
      .head()
    val gArr = row.getSeq[Double](0)
    val d = math.sqrt(gArr.length.toDouble).toInt
    require(d > 0, "linear probe: empty training frame")
    val g = Array.tabulate(d, d)((i, j) => gArr(i * d + j))
    (0 until d).foreach(i => g(i)(i) += lambda)
    val moments = row.getMap[Long, scala.collection.Seq[Double]](1)
    val classes = moments.keys.toArray.sorted
    val rhs = classes.map { c =>
      val v = moments(c)
      require(v.length == d, s"linear probe: moment width ${v.length} != $d")
      v.toArray
    }
    Model(classes, solveMany(g, rhs))
  }

  /** The declarative Gram/moments form the aggregate replaced: the
    * outer-product cells as ONE flattened HOF array per row, a single
    * posexplode of scalars, grid-long sums. Retained as the suite's
    * BIT-IDENTITY witness for [[fit]] (same grid, same arithmetic, d²
    * rows per input row through the shuffle — correct but the measured
    * scale cliff). */
  private[ml] def fitViaExplode(train: DataFrame, lambda: Double = 1.0): Model = {
    require(lambda > 0, s"need lambda > 0, got $lambda")
    val aug = augmented(train)
    val d = aug.select(size(col("x"))).head().getInt(0)
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
    * `lit` columns per step — no collect of data rows, no driver loop
    * over rows, no string-built literals (a NaN would not round-trip
    * through SQL text). A small L2 term (1e-6) keeps the 2×2 solve
    * conditioned on benign inputs; a degenerate frame (near-singular
    * Hessian, non-finite step) aborts to the identity calibration (0, 0)
    * rather than emitting NaN coefficients. Requires a non-empty scored
    * frame. */
  def calibrate(scored: DataFrame, iters: Int = 8): (Double, Double) = {
    require(iters >= 1, s"need iters >= 1, got $iters")
    var (a, b) = (0.0, 0.0)
    val base = scored.select(col("margin").cast("double").as("m"),
      (col("pred") === col("label")).cast("double").as("y"))
    for (_ <- 1 to iters) {
      val p = lit(1.0) / (lit(1.0) + exp(-(lit(a) * col("m") + lit(b))))
      val r = base
        .select(p.as("p"), col("m"), col("y"))
        .agg(gridSum((col("p") - col("y")) * col("m")).as("g1"),
          gridSum(col("p") - col("y")).as("g2"),
          gridSum(col("p") * (lit(1.0) - col("p")) * col("m") * col("m")).as("h11"),
          gridSum(col("p") * (lit(1.0) - col("p")) * col("m")).as("h12"),
          gridSum(col("p") * (lit(1.0) - col("p"))).as("h22"))
        .head()
      require(!r.isNullAt(0), "calibrate: empty scored frame")
      val Seq(g1, g2, h11r, h12, h22r) =
        (0 until 5).map(i => r.getLong(i) / Grid)
      val (h11, h22) = (h11r + 1e-6, h22r + 1e-6)
      val det = h11 * h22 - h12 * h12
      val da = (h22 * g1 - h12 * g2) / det
      val db = (h11 * g2 - h12 * g1) / det
      // a flat or single-outcome margin distribution drives det -> ~0 and
      // the step to garbage: bail to the identity calibration instead of
      // letting NaN/Infinity poison the coefficients
      if (!det.isFinite || det <= 0 || !da.isFinite || !db.isFinite) return (0.0, 0.0)
      a -= da
      b -= db
    }
    (a, b)
  }

  /** Add `confidence` = sigmoid(a·margin + b) from [[calibrate]]'s fit. */
  def withConfidence(scored: DataFrame, a: Double, b: Double): DataFrame =
    scored.withColumn("confidence",
      round(lit(1.0) / (lit(1.0) + exp(-(lit(a) * col("margin") + lit(b)))), 6))

  /** Persist a fitted model (+ optional Platt calibration scalars) as
    * KB-scale parquet — one row per class — so serving (batch twins,
    * streaming micro-batches) can score against a FROZEN probe without
    * refitting (the Pca.saveModel discipline). */
  def saveModel(spark: org.apache.spark.sql.SparkSession, model: Model,
                path: String, calib: (Double, Double) = (0.0, 0.0)): Unit = {
    import spark.implicits._
    model.classes.zip(model.weights).toSeq
      .map { case (c, w) => (c, w.toSeq) }
      .toDF("class", "weights")
      .repartition(1).write.mode("overwrite").parquet(s"$path/weights")
    Seq(calib).toDF("a", "b")
      .repartition(1).write.mode("overwrite").parquet(s"$path/calib")
  }

  /** Load a [[saveModel]] model and its calibration scalars. */
  def loadModel(spark: org.apache.spark.sql.SparkSession,
                path: String): (Model, (Double, Double)) = {
    val rows = spark.read.parquet(s"$path/weights")
      .select("class", "weights").collect().sortBy(_.getLong(0))
    require(rows.nonEmpty, s"linear probe: empty model at $path")
    // mirror qualityProbeFit's fit-time contract AT LOAD (ADVICE r11): a
    // single-class frozen model would serve NULL margins (the one-vs-rest
    // second-best filter is empty) and a ragged weight table would score
    // garbage — a bad persisted artifact must fail here, not as NULLs
    // downstream
    require(rows.length >= 2,
      s"linear probe: the frozen model at $path carries only class " +
        s"${rows.map(_.getLong(0)).mkString(",")} — serving needs >= 2 " +
        "classes (refit with both classes present, or fix the artifact)")
    val widths = rows.map(_.getSeq[Double](1).length).distinct
    require(widths.length == 1,
      s"linear probe: inconsistent weight widths ${widths.mkString(",")} " +
        s"across classes in the frozen model at $path — the artifact is " +
        "corrupt; refit and re-save")
    val m = Model(rows.map(_.getLong(0)),
      rows.map(_.getSeq[Double](1).toArray))
    val c = spark.read.parquet(s"$path/calib").select("a", "b").head()
    (m, (c.getDouble(0), c.getDouble(1)))
  }

  /** Score (vec_id, embedding[, …]) rows: adds `pred` (argmax class,
    * ties to the smallest) and `margin` (best minus second-best score).
    * Pure codegen'd column expressions over literal weights (built via
    * `lit`, never string-formatted — non-finite doubles would not
    * round-trip through SQL text). */
  def predict(df: DataFrame, model: Model): DataFrame = {
    graft.functions.VectorFunctions.register(df.sparkSession)
    val scored = array(model.classes.zip(model.weights).map { case (c, w) =>
      struct(
        call_function("graft_dot", col("_xa"), array(w.toSeq.map(lit): _*)).as("s"),
        lit(-c).as("nc"))
    }.toSeq: _*)
    df.withColumn("_xa",
        expr("concat(CAST(embedding AS array<double>), array(CAST(1 AS DOUBLE)))"))
      .withColumn("_sc", scored)
      .withColumn("pred", -expr("array_max(_sc).nc"))
      .withColumn("margin", expr(
        "array_max(_sc).s - array_max(filter(_sc, e -> e.nc != array_max(_sc).nc)).s"))
      .drop("_xa", "_sc")
  }
}
