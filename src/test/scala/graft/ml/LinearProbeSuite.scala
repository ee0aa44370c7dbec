package graft.ml

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

class LinearProbeSuite extends SparkSpec {

  private val sf = "/root/testdata/sf0.01"

  test("exact recovery: a linearly generated task is solved to near-zero error") {
    import spark.implicits._
    // labels = argmax over 3 fixed linear scorers of a 64-dim input ->
    // the probe's hypothesis class contains the truth; ridge at small
    // lambda must recover it almost exactly
    val rnd = new scala.util.Random(7)
    val w = Array.fill(3, 64)(rnd.nextGaussian())
    val rows = (0 until 300).map { i =>
      val x = Array.fill(64)(rnd.nextGaussian().toFloat)
      val scores = w.map(wc => wc.zip(x).map { case (a, b) => a * b }.sum)
      (i.toLong, x, scores.indexOf(scores.max).toLong)
    }
    val df = rows.toDF("vec_id", "embedding", "label")
    val m = LinearProbe.fit(df, lambda = 1e-6)
    val acc = LinearProbe.predict(df, m)
      .filter(col("pred") === col("label")).count().toDouble / rows.size
    // one-vs-rest least squares onto one-hot targets is NOT the argmax
    // bayes rule (the classic masking effect), so demand near- rather
    // than exactly-perfect recovery — chance on 3 classes is 0.33
    assert(acc >= 0.90, s"linear task not recovered: train accuracy $acc")
  }

  test("holdout on the real embeddings is an honest chance-band diagnostic") {
    // the harness embeddings' labels are UNLEARNABLE from the vectors BY
    // CONSTRUCTION (the AdaBoost holdout pins the same chance-band
    // golden) — and reporting that is exactly what a probe is FOR: probe
    // accuracy ~ chance means the embeddings do not encode the label.
    // The learnable-synthetic test above carries the accuracy claim.
    val emb = Tables(spark, sf, "embeddings")
    val m = LinearProbe.fit(emb.filter(col("vec_id") % 5 =!= 0))
    val hold = LinearProbe.predict(emb.filter(col("vec_id") % 5 === 0), m)
    val n = hold.count()
    assert(n === emb.filter(col("vec_id") % 5 === 0).count())
    val acc = hold.filter(col("pred") === col("label")).count().toDouble / n
    assert(acc >= 0.0 && acc <= 0.30,
      s"10-class chance band violated: $acc (a jump above it means the corpus changed)")
    // predictions are valid classes and margins are well-defined
    val classes = m.classes.toSet
    assert(hold.select("pred").collect().forall(r => classes.contains(r.getLong(0))))
    assert(hold.filter(col("margin").isNull).count() === 0)
  }

  test("deterministic across partitionings (grid-summed moments)") {
    val emb = Tables(spark, sf, "embeddings")
    def run(df: DataFrame): Seq[(Long, Long)] = {
      val m = LinearProbe.fit(df.filter(col("vec_id") % 5 =!= 0))
      LinearProbe.predict(emb.filter(col("vec_id") % 5 === 0), m)
        .select("vec_id", "pred").collect()
        .map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1).toSeq
    }
    val base = run(emb)
    assert(run(emb.repartition(1)) === base)
    assert(run(emb.repartition(13, col("vec_id"))) === base)
  }

  test("calibration: confidence tracks correctness on a separable task; deterministic") {
    import spark.implicits._
    // reuse the linearly generated task: margins genuinely separate
    // correct from incorrect predictions, so the fitted slope must be
    // positive and calibrated confidence must rank correct above wrong
    val rnd = new scala.util.Random(11)
    val w = Array.fill(4, 64)(rnd.nextGaussian())
    val rows = (0 until 400).map { i =>
      val x = Array.fill(64)(rnd.nextGaussian().toFloat)
      val scores = w.map(wc => wc.zip(x).map { case (p, q) => p * q }.sum)
      (i.toLong, x, scores.indexOf(scores.max).toLong)
    }
    val df = rows.toDF("vec_id", "embedding", "label")
    val m = LinearProbe.fit(df.filter(col("vec_id") < 300), lambda = 1e-4)
    val hold = LinearProbe.predict(df.filter(col("vec_id") >= 300), m)
      .localCheckpoint()
    val (a, b) = LinearProbe.calibrate(hold)
    assert(a > 0, s"bigger margin must mean more confidence, got slope $a")
    val conf = LinearProbe.withConfidence(hold, a, b)
      .select(col("confidence"), (col("pred") === col("label")).as("ok")).collect()
    val (cOk, cBad) = conf.partition(_.getBoolean(1))
    assert(cOk.nonEmpty && cBad.nonEmpty, "task should produce both outcomes")
    val meanOk = cOk.map(_.getDouble(0)).sum / cOk.length
    val meanBad = cBad.map(_.getDouble(0)).sum / cBad.length
    assert(meanOk > meanBad,
      s"calibrated confidence inverted: correct $meanOk vs wrong $meanBad")
    assert(conf.forall(r => r.getDouble(0) > 0 && r.getDouble(0) < 1))
    // grid-long sums -> the fit is partition-order exact
    val (a2, b2) = LinearProbe.calibrate(hold.repartition(13))
    assert(a === a2 && b === b2, "calibration must be partition-order exact")
  }

  test("aggregate fit is bit-identical to the explode witness, across partitionings") {
    // graft_gram/graft_moments (one mergeable buffer per partition) must
    // reproduce the declarative posexplode form EXACTLY — same grid, same
    // integer sums, same solve inputs — or the aggregate is a different
    // operator, not a faster plan for the same one
    val emb = Tables(spark, sf, "embeddings")
    val ref = LinearProbe.fitViaExplode(emb)
    for (df <- Seq(emb, emb.repartition(1), emb.repartition(13, col("vec_id")))) {
      val m = LinearProbe.fit(df)
      assert(m.classes.toSeq === ref.classes.toSeq)
      assert(m.weights.map(_.toSeq).toSeq === ref.weights.map(_.toSeq).toSeq,
        "aggregate-fit weights diverged from the explode witness")
    }
  }

  test("degenerate inputs: empty fit and empty calibrate fail fast; flat margins bail to (0,0)") {
    import spark.implicits._
    val emb = Tables(spark, sf, "embeddings")
    val none = emb.filter(col("vec_id") < 0)
    intercept[IllegalArgumentException] { LinearProbe.fit(none) }
    val m = LinearProbe.fit(emb.limit(50))
    intercept[IllegalArgumentException] {
      LinearProbe.calibrate(LinearProbe.predict(none, m))
    }
    // all margins identical and every prediction wrong -> the Newton step
    // degenerates; the contract is the identity calibration, not NaN
    val flat = Seq((1L, 0.5, 0L, 1L), (2L, 0.5, 0L, 1L), (3L, 0.5, 0L, 1L))
      .toDF("vec_id", "margin", "pred", "label")
    val (fa, fb) = LinearProbe.calibrate(flat)
    assert(fa.isFinite && fb.isFinite, s"degenerate calibrate produced ($fa, $fb)")
  }

  test("scoring plan is codegen'd expressions — no UDF") {
    val emb = Tables(spark, sf, "embeddings").limit(50)
    val m = LinearProbe.fit(emb)
    val p = LinearProbe.predict(emb, m).queryExecution.executedPlan.toString
    assert(!p.contains("UDF"), s"probe scoring must be built-ins only:\n$p")
  }

  test("loadModel refuses a single-class or ragged frozen artifact at LOAD") {
    // ADVICE r11: a bad persisted model must fail at load with the fit-time
    // error, not serve NULL margins (single class) or garbage (ragged
    // weight widths) downstream
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("probe-model").toString
    LinearProbe.saveModel(spark,
      LinearProbe.Model(Array(1L), Array(Array(0.5, -0.25, 0.1))), s"$dir/one")
    val e1 = intercept[IllegalArgumentException] {
      LinearProbe.loadModel(spark, s"$dir/one")
    }
    assert(e1.getMessage.contains(">= 2"), e1.getMessage)
    // ragged widths: forge the weights table directly (saveModel itself
    // can only be fed a ragged Model by a caller bug — the artifact is
    // what the guard protects against)
    Seq((0L, Seq(0.1, 0.2, 0.3)), (1L, Seq(0.4, 0.5)))
      .toDF("class", "weights")
      .write.mode("overwrite").parquet(s"$dir/ragged/weights")
    Seq((0.0, 0.0)).toDF("a", "b")
      .write.mode("overwrite").parquet(s"$dir/ragged/calib")
    val e2 = intercept[IllegalArgumentException] {
      LinearProbe.loadModel(spark, s"$dir/ragged")
    }
    assert(e2.getMessage.contains("width"), e2.getMessage)
  }
}
