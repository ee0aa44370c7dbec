package graft.ml

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** PCA over fixed-dimension embeddings — the decorrelation / dim-reduce
  * step a training-data pipeline runs before ANN indexing or probing
  * (whitened cosine, OPQ-style preprocessing, variance diagnostics).
  *
  * Distributed shape — the only data-scale work is ONE aggregation pass,
  * the [[LinearProbe]] discipline: `graft_gram` over the bias-AUGMENTED
  * vectors [x, 1] returns XᵀX, Xᵀ1 (the coordinate sums) and n in a
  * single (d+1)² mergeable primitive buffer, so mean and covariance
  * C = XᵀX/n − μμᵀ are driver arithmetic on META-sized input. The
  * eigendecomposition is a driver-side cyclic Jacobi sweep over the d×d
  * symmetric covariance (d ≤ ~512 by requirement — at embedding widths
  * the d² matrix is KBs; data scale lives in the aggregation, never in
  * the solve). Projection is codegen'd arithmetic: per-component
  * graft_dot against a literal axis with the mean's contribution folded
  * into a literal offset — no UDF, no driver loop over rows.
  *
  * Determinism: the Gram pass is partition-order exact
  * ([[graft.functions.Grid128]]), Jacobi sweeps are a fixed driver
  * procedure of exact inputs, and the sign convention (largest-|entry|
  * coordinate of each axis made positive, first index on ties) pins the
  * eigenvector sign ambiguity — suite-pinned identical across
  * partitionings.
  */
object Pca {

  /** mean (length d), principal axes (k rows of length d, descending
    * eigenvalue), and the eigenvalues (variances along the axes). */
  final case class Model(mean: Array[Double], components: Array[Array[Double]],
                         variances: Array[Double])

  /** Fit on (embedding: array<float|double>) rows; keep `k` components. */
  def fit(emb: DataFrame, k: Int): Model = {
    require(k >= 1, s"need k >= 1, got $k")
    graft.functions.VectorFunctions.register(emb.sparkSession)
    val aug = emb.select(
      expr("concat(CAST(embedding AS array<double>), array(CAST(1 AS DOUBLE)))").as("x"))
    val gArr = aug.agg(expr("graft_gram(x)")).head().getSeq[Double](0)
    val da = math.sqrt(gArr.length.toDouble).toInt
    require(da > 1, "pca: empty training frame")
    val d = da - 1
    require(k <= d, s"need k <= dim; got k=$k dim=$d")
    val n = gArr(da * da - 1) // the [1,1] cell counts rows
    require(n > 0, "pca: empty training frame")
    val mean = Array.tabulate(d)(i => gArr(i * da + d) / n)
    val cov = Array.tabulate(d, d)((i, j) =>
      gArr(i * da + j) / n - mean(i) * mean(j))
    val (values, vectors) = jacobiEigen(cov)
    // descending eigenvalue, ties to the lower original index
    val order = values.indices.sortBy(i => (-values(i), i)).take(k)
    val comps = order.map { i =>
      val v = vectors(i)
      // sign pin: the largest-|entry| coordinate is positive
      val m = v.indices.maxBy(j => (math.abs(v(j)), -j))
      if (v(m) < 0) v.map(-_) else v
    }.toArray
    Model(mean, comps, order.map(values).toArray)
  }

  /** Eigen-decomposition of a symmetric matrix by cyclic Jacobi
    * rotations: returns (eigenvalues, eigenvectors as rows). O(d³) per
    * sweep, converges quadratically; deterministic (fixed sweep order,
    * fixed tolerance). */
  private def jacobiEigen(a0: Array[Array[Double]]): (Array[Double], Array[Array[Double]]) = {
    val d = a0.length
    val a = a0.map(_.clone())
    val v = Array.tabulate(d, d)((i, j) => if (i == j) 1.0 else 0.0)
    var sweep = 0
    var off = offDiag(a)
    while (off > 1e-12 * (1.0 + frobenius(a)) && sweep < 64) {
      sweep += 1
      for (p <- 0 until d - 1; q <- p + 1 until d if math.abs(a(p)(q)) > 0) {
        // the classic symmetric Schur rotation zeroing a(p)(q)
        val theta = (a(q)(q) - a(p)(p)) / (2.0 * a(p)(q))
        val t = math.signum(theta) match {
          case 0.0 => 1.0 / (theta + math.sqrt(theta * theta + 1.0))
          case s => s / (math.abs(theta) + math.sqrt(theta * theta + 1.0))
        }
        val c = 1.0 / math.sqrt(t * t + 1.0)
        val s = t * c
        for (i <- 0 until d) {
          val aip = a(i)(p); val aiq = a(i)(q)
          a(i)(p) = c * aip - s * aiq
          a(i)(q) = s * aip + c * aiq
        }
        for (j <- 0 until d) {
          val apj = a(p)(j); val aqj = a(q)(j)
          a(p)(j) = c * apj - s * aqj
          a(q)(j) = s * apj + c * aqj
        }
        for (i <- 0 until d) {
          val vip = v(i)(p); val viq = v(i)(q)
          v(i)(p) = c * vip - s * viq
          v(i)(q) = s * vip + c * viq
        }
      }
      off = offDiag(a)
    }
    (Array.tabulate(d)(i => a(i)(i)),
      Array.tabulate(d)(i => Array.tabulate(d)(j => v(j)(i))))
  }

  private def offDiag(a: Array[Array[Double]]): Double = {
    var s = 0.0
    for (i <- a.indices; j <- a.indices if i != j) s += a(i)(j) * a(i)(j)
    math.sqrt(s)
  }
  private def frobenius(a: Array[Array[Double]]): Double =
    math.sqrt(a.indices.map(i => a.indices.map(j => a(i)(j) * a(i)(j)).sum).sum)

  /** Add `proj` (array<double>, length k): the centered projection
    * (x − μ)·Wᵀ. `whiten` divides each coordinate by sqrt(variance + eps)
    * so downstream distances are isotropic. Pure codegen'd columns over
    * literal axes: (x − μ)·w = graft_dot(x, w) − μ·w, with μ·w folded
    * into a driver-side literal offset per component. */
  def transform(df: DataFrame, model: Model, whiten: Boolean = false,
                eps: Double = 1e-9): DataFrame = {
    graft.functions.VectorFunctions.register(df.sparkSession)
    val coords = model.components.zip(model.variances).map { case (w, varI) =>
      val offset = w.zip(model.mean).map { case (a, b) => a * b }.sum
      val dotc = call_function("graft_dot", col("_xd"),
        array(w.toSeq.map(lit): _*)) - lit(offset)
      // clamp: a rank-deficient direction's eigenvalue can come out a
      // hair NEGATIVE from the Jacobi tolerance — sqrt would poison the
      // whole coordinate with NaN instead of the intended eps floor
      if (whiten) dotc / lit(math.sqrt(math.max(varI, 0.0) + eps)) else dotc
    }
    df.withColumn("_xd", expr("CAST(embedding AS array<double>)"))
      .withColumn("proj", array(coords.toSeq: _*))
      .drop("_xd")
  }
}
