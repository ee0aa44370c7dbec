package graft.ml

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

class PcaSuite extends SparkSpec {

  private val sf = "/root/testdata/sf0.01"

  /** Deterministic anisotropic corpus: variance 25 along u, 4 along w,
    * 0.01 noise elsewhere (LCG draws — no library RNG). */
  private def anisotropic(n: Int, d: Int) = {
    import spark.implicits._
    def lcg(seed: Long): Long = seed * 6364136223846793005L + 1442695040888963407L
    val u = Array.tabulate(d)(j => if (j % 2 == 0) 1.0 else 0.0).map(_ / math.sqrt(d / 2))
    val w = Array.tabulate(d)(j => if (j % 2 == 1) 1.0 else 0.0).map(_ / math.sqrt(d / 2))
    def gauss(s0: Long): Double = {
      // sum of 4 uniforms, centered: cheap deterministic ~gaussian
      var s = s0; var acc = 0.0
      for (_ <- 1 to 4) { s = lcg(s); acc += (s >>> 11).toDouble / (1L << 53).toDouble }
      (acc - 2.0) * math.sqrt(3.0)
    }
    (0 until n).map { i =>
      val a = 5.0 * gauss(i * 7919L + 1)
      val b = 2.0 * gauss(i * 104729L + 2)
      val x = Array.tabulate(d)(j =>
        (a * u(j) + b * w(j) + 0.1 * gauss(i * 31L + j * 17L + 3)).toFloat)
      (i.toLong, x)
    }.toDF("vec_id", "embedding")
  }

  private def dot(a: Array[Double], b: Array[Double]): Double =
    a.zip(b).map { case (x, y) => x * y }.sum

  test("recovers planted principal axes in order; components orthonormal") {
    val df = anisotropic(600, 16)
    val m = Pca.fit(df, k = 3)
    val u = Array.tabulate(16)(j => if (j % 2 == 0) 1.0 else 0.0).map(_ / math.sqrt(8.0))
    val w = Array.tabulate(16)(j => if (j % 2 == 1) 1.0 else 0.0).map(_ / math.sqrt(8.0))
    assert(math.abs(dot(m.components(0), u)) > 0.99,
      s"first axis missed the variance-25 direction: ${dot(m.components(0), u)}")
    assert(math.abs(dot(m.components(1), w)) > 0.99,
      s"second axis missed the variance-4 direction: ${dot(m.components(1), w)}")
    assert(m.variances(0) > m.variances(1) && m.variances(1) > m.variances(2),
      s"variances not descending: ${m.variances.toSeq}")
    assert(m.variances(0) > 15 && m.variances(0) < 35)
    assert(m.variances(1) > 2 && m.variances(1) < 6)
    for (i <- 0 until 3; j <- 0 until 3) {
      val d0 = dot(m.components(i), m.components(j))
      assert(math.abs(d0 - (if (i == j) 1.0 else 0.0)) < 1e-9,
        s"components not orthonormal at ($i,$j): $d0")
    }
  }

  test("mean matches the plain average; model is partition-order identical") {
    val emb = Tables(spark, sf, "embeddings")
    val m = Pca.fit(emb, k = 4)
    val d = m.mean.length
    // one coordinate checked against a direct column average
    val c0 = emb.select(avg0(col("embedding")).as("c")).agg(avg(col("c"))).head().getDouble(0)
    assert(math.abs(m.mean(0) - c0) < 1e-6, s"mean(0) ${m.mean(0)} vs $c0")
    for (df <- Seq(emb.repartition(1), emb.repartition(13, col("vec_id")))) {
      val m2 = Pca.fit(df, k = 4)
      assert(m2.mean.toSeq === m.mean.toSeq)
      assert(m2.components.map(_.toSeq).toSeq === m.components.map(_.toSeq).toSeq,
        "PCA model not partition-order exact")
      assert(m2.variances.toSeq === m.variances.toSeq)
    }
    assert(d === 64)
  }
  private def avg0(c: org.apache.spark.sql.Column) =
    c.getItem(0).cast("double")

  test("transform: centered projection, whitening normalizes variance, no UDF") {
    val df = anisotropic(500, 16)
    val m = Pca.fit(df, k = 2)
    val p = Pca.transform(df, m)
    // projections are centered: the sample mean of each coordinate ~ 0
    val means = p.select(expr("proj[0]").as("p0"), expr("proj[1]").as("p1"))
      .agg(avg("p0"), avg("p1")).head()
    assert(math.abs(means.getDouble(0)) < 1e-6 && math.abs(means.getDouble(1)) < 1e-6)
    // unwhitened variance along axis 0 equals the model's eigenvalue
    val v0 = p.select(expr("proj[0] * proj[0]").as("s")).agg(avg("s")).head().getDouble(0)
    assert(math.abs(v0 - m.variances(0)) / m.variances(0) < 0.02,
      s"projection variance $v0 vs eigenvalue ${m.variances(0)}")
    // whitening brings both coordinates to ~unit variance
    val pw = Pca.transform(df, m, whiten = true)
    val vw = pw.select(expr("proj[0] * proj[0]").as("a"),
        expr("proj[1] * proj[1]").as("b"))
      .agg(avg("a"), avg("b")).head()
    assert(math.abs(vw.getDouble(0) - 1.0) < 0.02 &&
      math.abs(vw.getDouble(1) - 1.0) < 0.02,
      s"whitened variances ${vw.getDouble(0)}, ${vw.getDouble(1)}")
    val plan = p.queryExecution.executedPlan.toString
    assert(!plan.contains("UDF"), s"projection must be built-ins only:\n$plan")
  }

  test("distance preservation: projected pair distances capture the explained variance") {
    // the claim that justifies dim-reduced similarity (q_sim_topk_pca):
    // projection onto the top-k axes preserves squared pairwise
    // distances up to the residual variance — on a corpus whose variance
    // concentrates in 2 axes, PCA-2 must capture >= 90% of expected
    // squared distance, and projected distances never exceed full ones
    val df = anisotropic(300, 16)
    val m = Pca.fit(df, k = 2)
    val p = Pca.transform(df, m)
      .select(col("vec_id"), expr("CAST(embedding AS array<double>)").as("x"),
        col("proj"))
    val rows = p.collect().map(r => (r.getLong(0),
      r.getSeq[Double](1).toArray, r.getSeq[Double](2).toArray))
    def d2(a: Array[Double], b: Array[Double]) =
      a.zip(b).map { case (u, v) => (u - v) * (u - v) }.sum
    // deterministic pair sample: consecutive ids
    val pairs = rows.sortBy(_._1).sliding(2).collect {
      case Array(a, b) => (d2(a._2, b._2), d2(a._3, b._3))
    }.toSeq
    assert(pairs.forall { case (full, proj) => proj <= full * (1 + 1e-9) },
      "projected distance exceeded the full-space distance")
    val captured = pairs.map(_._2).sum / pairs.map(_._1).sum
    assert(captured >= 0.9,
      f"PCA-2 captured only $captured%.3f of squared pairwise distance")
    // and the same ratio collapses when variance is NOT concentrated:
    // isotropic-ish residual dims mean k=2 of 16 captures little
    val iso = {
      import spark.implicits._
      def lcg(seed: Long): Long = seed * 6364136223846793005L + 1442695040888963407L
      (0 until 300).map { i =>
        (i.toLong, Array.tabulate(16) { j =>
          ((lcg(i * 131L + j * 7L + 5) >>> 11).toDouble / (1L << 53).toDouble - 0.5).toFloat
        })
      }.toDF("vec_id", "embedding")
    }
    val mi = Pca.fit(iso, k = 2)
    val pi = Pca.transform(iso, mi)
      .select(col("vec_id"), expr("CAST(embedding AS array<double>)").as("x"), col("proj"))
      .collect().map(r => (r.getLong(0), r.getSeq[Double](1).toArray,
        r.getSeq[Double](2).toArray))
    val isoPairs = pi.sortBy(_._1).sliding(2).collect {
      case Array(a, b) => (d2(a._2, b._2), d2(a._3, b._3))
    }.toSeq
    val isoCaptured = isoPairs.map(_._2).sum / isoPairs.map(_._1).sum
    assert(isoCaptured < 0.5,
      f"isotropic control should NOT be captured by 2 axes: $isoCaptured%.3f")
  }

  test("degenerate inputs fail fast") {
    val emb = Tables(spark, sf, "embeddings")
    intercept[IllegalArgumentException] { Pca.fit(emb.filter(col("vec_id") < 0), 2) }
    intercept[IllegalArgumentException] { Pca.fit(emb, 0) }
    intercept[IllegalArgumentException] { Pca.fit(emb, 65) }
    intercept[IllegalArgumentException] { Pca.fitRandomized(emb, 0) }
    intercept[IllegalArgumentException] { Pca.fitRandomized(emb, 65) }
  }

  test("randomized fit recovers the planted axes like Jacobi") {
    val df = anisotropic(600, 16)
    val m = Pca.fitRandomized(df, k = 3)
    val u = Array.tabulate(16)(j => if (j % 2 == 0) 1.0 else 0.0).map(_ / math.sqrt(8.0))
    val w = Array.tabulate(16)(j => if (j % 2 == 1) 1.0 else 0.0).map(_ / math.sqrt(8.0))
    assert(math.abs(dot(m.components(0), u)) > 0.99,
      s"first axis missed the variance-25 direction: ${dot(m.components(0), u)}")
    assert(math.abs(dot(m.components(1), w)) > 0.99,
      s"second axis missed the variance-4 direction: ${dot(m.components(1), w)}")
    for (i <- 0 until 3; j <- 0 until 3) {
      val d0 = dot(m.components(i), m.components(j))
      assert(math.abs(d0 - (if (i == j) 1.0 else 0.0)) < 1e-9,
        s"components not orthonormal at ($i,$j): $d0")
    }
  }

  /** Decaying planted spectrum: variance ~ 30/2^a along axis a for the
    * first 6 canonical axes, 0.01 noise elsewhere — the regime (any
    * spectral decay) where the randomized solver must MATCH Jacobi. */
  private def decaying(n: Int, d: Int) = {
    import spark.implicits._
    def lcg(seed: Long): Long = seed * 6364136223846793005L + 1442695040888963407L
    def gauss(s0: Long): Double = {
      var s = s0; var acc = 0.0
      for (_ <- 1 to 4) { s = lcg(s); acc += (s >>> 11).toDouble / (1L << 53).toDouble }
      (acc - 2.0) * math.sqrt(3.0)
    }
    (0 until n).map { i =>
      val x = Array.tabulate(d) { j =>
        val planted = if (j < 6) math.sqrt(30.0 / (1 << j)) * gauss(i * 7919L + j * 13L + 1)
          else 0.0
        (planted + 0.1 * gauss(i * 31L + j * 17L + 3)).toFloat
      }
      (i.toLong, x)
    }.toDF("vec_id", "embedding")
  }

  test("randomized fit matches Jacobi on a decaying spectrum") {
    val df = decaying(800, 32)
    val k = 5
    val exact = Pca.fit(df, k)
    val rnd = Pca.fitRandomized(df, k)
    assert(rnd.mean.toSeq === exact.mean.toSeq,
      "mean differs — both come from the same Gram pass")
    for (i <- 0 until k) {
      val rel = math.abs(rnd.variances(i) - exact.variances(i)) /
        math.max(exact.variances(i), 1e-12)
      assert(rel < 1e-3, s"eigenvalue $i off by $rel: " +
        s"${rnd.variances(i)} vs ${exact.variances(i)}")
      // each randomized component lies in Jacobi's top-k subspace
      // (principal angle ~ 0) — immune to residual near-ties
      val inSub = math.sqrt(exact.components.map(e =>
        math.pow(dot(rnd.components(i), e), 2)).sum)
      assert(inSub > 0.999,
        s"component $i leaves the exact top-$k subspace: $inSub")
    }
    // a different seed moves the test basis, not the recovered subspace
    val m3 = Pca.fitRandomized(df, k, seed = 7L)
    for (i <- 0 until k) {
      val inSub = math.sqrt(exact.components.map(e =>
        math.pow(dot(m3.components(i), e), 2)).sum)
      assert(inSub > 0.999, s"seed changed the recovered subspace: $inSub")
    }
  }

  test("randomized fit on a FLAT spectrum: Ritz bounds hold even where ordering cannot") {
    // the real embeddings are near-isotropic gaussians — the honest
    // worst case for randomized range finding (no spectral gap to
    // sharpen). The ALWAYS-true guarantees are what we pin: Ritz values
    // lower-bound their exact counterparts (Rayleigh–Ritz + Cauchy
    // interlacing) and the captured-variance total stays close even when
    // individual axes are unidentifiable.
    val emb = Tables(spark, sf, "embeddings")
    val k = 8
    val exact = Pca.fit(emb, k)
    val rnd = Pca.fitRandomized(emb, k)
    assert(rnd.mean.toSeq === exact.mean.toSeq)
    for (i <- 0 until k) {
      assert(rnd.variances(i) <= exact.variances(i) * (1 + 1e-9),
        s"Ritz value $i exceeds the exact eigenvalue: " +
          s"${rnd.variances(i)} vs ${exact.variances(i)}")
      for (j <- 0 until k) {
        val d0 = dot(rnd.components(i), rnd.components(j))
        assert(math.abs(d0 - (if (i == j) 1.0 else 0.0)) < 1e-9,
          s"components not orthonormal at ($i,$j): $d0")
      }
    }
    assert(rnd.variances.sum >= 0.95 * exact.variances.sum,
      s"captured variance ${rnd.variances.sum} far below exact ${exact.variances.sum}")
  }

  test("neighbor survival under projection is a spectral-decay trade (the ANN_CURVE claim)") {
    // ANN_CURVE's pca16 rows collapse on the ISOTROPIC testdata; this pin
    // is the other half of that sentence: on a decaying spectrum the same
    // projection preserves the top-5 neighbor sets almost verbatim.
    val df = decaying(400, 32).localCheckpoint()
    val m = Pca.fit(df, k = 16)
    val p = Pca.transform(df, m)
      .select(col("vec_id"), expr("CAST(embedding AS array<double>)").as("x"), col("proj"))
      .collect().map(r => (r.getLong(0), r.getSeq[Double](1).toArray,
        r.getSeq[Double](2).toArray))
    def cos(a: Array[Double], b: Array[Double]) =
      dot(a, b) / math.sqrt(dot(a, a) * dot(b, b))
    def top5(vec: ((Long, Array[Double], Array[Double])) => Array[Double]): Map[Long, Set[Long]] =
      p.take(20).map { q =>
        q._1 -> p.filter(_._1 != q._1)
          .map(c => (cos(vec(q), vec(c)), c._1)).sortBy(t => (-t._1, t._2))
          .take(5).map(_._2).toSet
      }.toMap
    val raw = top5(_._2)
    val proj = top5(_._3)
    val recall = raw.keys.toSeq
      .map(q => raw(q).intersect(proj(q)).size / 5.0).sum / raw.size
    assert(recall >= 0.9,
      f"decaying-spectrum projection lost neighbor structure: recall $recall%.2f")
  }

  test("saveModel/loadModel round-trips the model exactly") {
    val emb = Tables(spark, sf, "embeddings")
    val m = Pca.fitRandomized(emb, k = 4)
    val path = java.nio.file.Files.createTempDirectory("pca-model").toString + "/m"
    Pca.saveModel(spark, m, path)
    val l = Pca.loadModel(spark, path)
    assert(l.mean.toSeq === m.mean.toSeq)
    assert(l.components.map(_.toSeq).toSeq === m.components.map(_.toSeq).toSeq)
    assert(l.variances.toSeq === m.variances.toSeq)
    // loaded model projects identically (the serving-session contract)
    val a = Pca.transform(emb, m, whiten = true).select("vec_id", "proj").collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1))).toMap
    val b = Pca.transform(emb, l, whiten = true).select("vec_id", "proj").collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1))).toMap
    assert(a === b)
  }

  test("randomized model is partition-order and call-order exact") {
    val emb = Tables(spark, sf, "embeddings")
    val m = Pca.fitRandomized(emb, k = 4)
    for (df <- Seq(emb.repartition(1), emb.repartition(13, col("vec_id")))) {
      val m2 = Pca.fitRandomized(df, k = 4)
      assert(m2.mean.toSeq === m.mean.toSeq)
      assert(m2.components.map(_.toSeq).toSeq === m.components.map(_.toSeq).toSeq,
        "randomized PCA model not partition-order exact")
      assert(m2.variances.toSeq === m.variances.toSeq)
    }
  }

  test("graft_matvec: the mergeable (XᵀX)·B pass equals driver arithmetic") {
    import spark.implicits._
    graft.functions.VectorFunctions.register(spark)
    val rows = (0 until 40).map { i =>
      (i.toLong, Array.tabulate(5)(j => ((i * 13 + j * 7) % 11 - 5) * 0.25))
    }
    val basis = Array(Array(1.0, 0.0, -0.5, 0.25, 2.0),
                      Array(0.0, 1.0, 1.0, -1.0, 0.125))
    val expect = basis.map { b =>
      val acc = new Array[Double](5)
      rows.foreach { case (_, x) =>
        val t = x.zip(b).map { case (a, c) => a * c }.sum
        for (i <- 0 until 5) acc(i) += x(i) * t
      }
      acc
    }.flatten
    val basisLit = typedlit[Seq[Seq[Double]]](basis.map(_.toSeq).toSeq)
    for (parts <- Seq(1, 7)) {
      val got = rows.toDF("id", "x").repartition(parts)
        .agg(call_function("graft_matvec", col("x"), basisLit))
        .head().getSeq[Double](0)
      assert(got.length === 10)
      got.zip(expect).zipWithIndex.foreach { case ((g, e), i) =>
        // one 1e-9 grid rounding per row per cell
        assert(math.abs(g - e) < 40 * 1e-9, s"cell $i: $g vs $e")
      }
    }
    // width mismatch between rows and basis fails loudly
    val bad = intercept[Exception] {
      rows.toDF("id", "x")
        .agg(call_function("graft_matvec", col("x"),
          typedlit[Seq[Seq[Double]]](Seq(Seq(1.0, 2.0))))).head()
    }
    val msgs = Iterator.iterate(bad: Throwable)(_.getCause)
      .takeWhile(_ != null).map(t => String.valueOf(t.getMessage)).mkString(" | ")
    assert(msgs.contains("basis width"), msgs)
  }

  test("matrix-free fit matches Jacobi on a decaying spectrum; d² nowhere") {
    val df = decaying(800, 32)
    val k = 5
    val exact = Pca.fit(df, k)
    val mf = Pca.fitMatFree(df, k)
    // the moments-pass mean grids x_i exactly like the Gram's bias column
    // (x_i·1.0 == x_i in IEEE) — identical, not merely close
    assert(mf.mean.toSeq === exact.mean.toSeq,
      "mean differs between the moments pass and the Gram bias column")
    for (i <- 0 until k) {
      val rel = math.abs(mf.variances(i) - exact.variances(i)) /
        math.max(exact.variances(i), 1e-12)
      assert(rel < 1e-3, s"eigenvalue $i off by $rel: " +
        s"${mf.variances(i)} vs ${exact.variances(i)}")
      val inSub = math.sqrt(exact.components.map(e =>
        math.pow(dot(mf.components(i), e), 2)).sum)
      assert(inSub > 0.999,
        s"component $i leaves the exact top-$k subspace: $inSub")
    }
  }

  test("matrix-free fit on the flat real corpus: Ritz bounds + orthonormality") {
    val emb = Tables(spark, sf, "embeddings")
    val k = 8
    val exact = Pca.fit(emb, k)
    val mf = Pca.fitMatFree(emb, k)
    assert(mf.mean.toSeq === exact.mean.toSeq)
    for (i <- 0 until k) {
      // Rayleigh–Ritz interlacing holds on ANY spectrum; the grid's
      // per-pass rounding adds at most a hair, hence the 1e-6 slack
      assert(mf.variances(i) <= exact.variances(i) * (1 + 1e-6),
        s"Ritz value $i exceeds the exact eigenvalue: " +
          s"${mf.variances(i)} vs ${exact.variances(i)}")
      for (j <- 0 until k) {
        val d0 = dot(mf.components(i), mf.components(j))
        assert(math.abs(d0 - (if (i == j) 1.0 else 0.0)) < 1e-9,
          s"components not orthonormal at ($i,$j): $d0")
      }
    }
    assert(mf.variances.sum >= 0.95 * exact.variances.sum,
      s"captured variance ${mf.variances.sum} far below exact ${exact.variances.sum}")
  }

  test("matrix-free at d=1024 agrees with the randomized solver (Jacobi impractical there)") {
    // the width regime fitMatFree exists for: cyclic Jacobi at d=1024 is
    // ~1e9 ops PER SWEEP (not run here), the randomized solver still
    // works (O(d²m) driver) and cross-checks the d²-nowhere path. The
    // two differ only in where the covariance is applied — driver
    // doubles vs the per-pass 1e-9 grid — so agreement is tight.
    val df = decaying(300, 1024)
    val k = 4
    val rnd = Pca.fitRandomized(df, k)
    val mf = Pca.fitMatFree(df, k)
    assert(mf.mean.toSeq === rnd.mean.toSeq,
      "moments-pass mean differs from the Gram bias column")
    for (i <- 0 until k) {
      val rel = math.abs(mf.variances(i) - rnd.variances(i)) /
        math.max(rnd.variances(i), 1e-12)
      assert(rel < 1e-3, s"eigenvalue $i off by $rel: " +
        s"${mf.variances(i)} vs ${rnd.variances(i)}")
      val inSub = math.sqrt(rnd.components.map(e =>
        math.pow(dot(mf.components(i), e), 2)).sum)
      assert(inSub > 0.999,
        s"component $i leaves the randomized top-$k subspace: $inSub")
    }
  }

  test("matrix-free model is partition-order exact") {
    val emb = Tables(spark, sf, "embeddings")
    val m = Pca.fitMatFree(emb, k = 4, powerIters = 2)
    for (df <- Seq(emb.repartition(1), emb.repartition(13, col("vec_id")))) {
      val m2 = Pca.fitMatFree(df, k = 4, powerIters = 2)
      assert(m2.mean.toSeq === m.mean.toSeq)
      assert(m2.components.map(_.toSeq).toSeq === m.components.map(_.toSeq).toSeq,
        "matrix-free PCA model not partition-order exact")
      assert(m2.variances.toSeq === m.variances.toSeq)
    }
  }

  /** Fresh anisotropic rows (same planted u/w directions, disjoint seeds)
    * — the "next week's in-distribution batch" for the drift drill. */
  private def anisotropicFresh(n: Int, d: Int, off: Long) = {
    import spark.implicits._
    def lcg(seed: Long): Long = seed * 6364136223846793005L + 1442695040888963407L
    val u = Array.tabulate(d)(j => if (j % 2 == 0) 1.0 else 0.0).map(_ / math.sqrt(d / 2))
    val w = Array.tabulate(d)(j => if (j % 2 == 1) 1.0 else 0.0).map(_ / math.sqrt(d / 2))
    def gauss(s0: Long): Double = {
      var s = s0; var acc = 0.0
      for (_ <- 1 to 4) { s = lcg(s); acc += (s >>> 11).toDouble / (1L << 53).toDouble }
      (acc - 2.0) * math.sqrt(3.0)
    }
    (0 until n).map { i0 =>
      val i = i0 + off
      val a = 5.0 * gauss(i * 7919L + 1)
      val b = 2.0 * gauss(i * 104729L + 2)
      val x = Array.tabulate(d)(j =>
        (a * u(j) + b * w(j) + 0.1 * gauss(i * 31L + j * 17L + 3)).toFloat)
      (i, x)
    }.toDF("vec_id", "embedding")
  }

  test("staleness: exact self-capture; in-distribution stays high, drift fires the alarm") {
    val d = 16
    val train = anisotropic(600, d)
    val m = Pca.fit(train, k = 2)
    // on the TRAINING corpus itself, captured variance == the model's own
    // eigenvalue sum and the total == the covariance trace — exact up to
    // the Jacobi tolerance and the aggregation grid
    val (n0, cap0, tot0, f0) = Pca.staleness(train, m)
    assert(n0 === 600L)
    assert(math.abs(cap0 - m.variances.sum) / m.variances.sum < 1e-6,
      s"self-capture $cap0 vs eigenvalue sum ${m.variances.sum}")
    assert(f0 > 0.95 && f0 <= 1.0 + 1e-12, s"self fraction $f0")
    assert(tot0 > cap0, "noise coordinates must contribute residual variance")
    // next week, same distribution: the frozen projection still explains it
    val (_, _, _, fIn) = Pca.staleness(anisotropicFresh(400, d, off = 100000L), m)
    assert(fIn > 0.9, s"in-distribution capture dropped to $fIn")
    // drifted batch: the dominant direction rotates to t ⟂ {u, w} — the
    // frozen axes explain almost none of it; a weekly threshold on the
    // captured fraction separates the two regimes cleanly
    val drifted = {
      import spark.implicits._
      def lcg(seed: Long): Long = seed * 6364136223846793005L + 1442695040888963407L
      def gauss(s0: Long): Double = {
        var s = s0; var acc = 0.0
        for (_ <- 1 to 4) { s = lcg(s); acc += (s >>> 11).toDouble / (1L << 53).toDouble }
        (acc - 2.0) * math.sqrt(3.0)
      }
      val t = Array.tabulate(d)(j =>
        if (j % 2 == 0) { if ((j / 2) % 2 == 0) 1.0 else -1.0 } else 0.0)
        .map(_ / math.sqrt(d / 2))
      (0 until 400).map { i =>
        val a = 5.0 * gauss(i * 50021L + 9)
        val x = Array.tabulate(d)(j =>
          (a * t(j) + 0.1 * gauss(i * 37L + j * 13L + 5)).toFloat)
        (i.toLong, x)
      }.toDF("vec_id", "embedding")
    }
    val (_, _, totD, fDrift) = Pca.staleness(drifted, m)
    assert(totD > 10, s"drift fixture lost its planted variance: $totD")
    assert(fDrift < 0.2, s"drifted capture $fDrift — alarm would not fire")
    assert(fIn - fDrift > 0.6, s"separation too narrow: $fIn vs $fDrift")
  }
}
