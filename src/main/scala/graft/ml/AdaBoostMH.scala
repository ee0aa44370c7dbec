package graft.ml

import org.apache.spark.ml.{Estimator, Model}
import org.apache.spark.ml.param.{IntParam, Param, ParamMap, ParamValidators}
import org.apache.spark.ml.util.Identifiable
import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Column, DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.storage.StorageLevel

/** One weak hypothesis: h(x)_l = alpha * votes(l) * sign(x(featureIndex) > threshold).
  * Mirrors the decision-stump base learner of AdaBoost.MH (Schapire & Singer
  * 1999/2000; the MultiBoost package, JMLR 2012).
  */
case class DecisionStump(featureIndex: Int, threshold: Double,
                         alpha: Double, votes: Array[Int])

/** Multi-labeled training example: y(l) in {-1,+1}, one unnormalized weight
  * per (example,label) pair kept packed in a single array — never exploded
  * into (example x label) rows. */
case class TrainPoint(id: Long, x: Array[Double], y: Array[Int], w: Array[Double])

/** Multi-class/multi-label AdaBoost.MH over binned decision stumps.
  *
  * Scale design: each boosting round is ONE distributed pass building a flat
  * (feature x bin x label) edge histogram per partition (64*16*10 doubles on
  * the harness data), merged on the driver — the gradient-histogram pattern.
  * No explode, no shuffle inside the loop. Weights stay UNNORMALIZED: the
  * round's normalizer W falls out of the same histogram pass, so
  * re-weighting needs no extra job (the classic boosting-on-Spark pitfall
  * of one normalize action per round).
  *
  * Determinism: partition partials merge in partition-index order; edge
  * argmax is computed on values rounded to 1e-9 with ties broken by
  * (featureIndex, threshold) ascending (SURVEY §7.4 pin).
  */
object AdaBoostMH {

  val NumLabels = 10 // label cardinality of the harness `embeddings` table

  /** Per-dimension equi-width threshold grids from global min/max.
    * (At 100 TB: same single aggregation; approx_percentile quantile bins
    * would replace equi-width without changing anything downstream.) */
  def thresholdGrid(df: DataFrame, numBins: Int): Array[Array[Double]] = {
    val stats = df
      .select(posexplode(col("embedding")).as(Seq("j", "x")))
      .groupBy("j")
      .agg(min(col("x").cast("double")).as("lo"), max(col("x").cast("double")).as("hi"))
      .collect()
      .map(r => (r.getInt(0), r.getDouble(1), r.getDouble(2)))
      .sortBy(_._1)
    stats.map { case (_, lo, hi) =>
      (1 until numBins).map(b => lo + b * (hi - lo) / numBins).toArray
    }
  }

  /** Quantile threshold grids — the 100 TB path for skewed features: same
    * single aggregation shape and the same downstream histogram (bestStump
    * already iterates each dim's actual threshold count), but splits follow
    * the data distribution. approx_percentile is a mergeable sketch, so
    * this stays one pass at any scale. Not used by the oracle-matching
    * queries (equi-width is exactly mirrorable in DuckDB; the sketch isn't). */
  def thresholdGridQuantile(df: DataFrame, numBins: Int,
                            accuracy: Int = 10000): Array[Array[Double]] = {
    val probs = (1 until numBins).map(_.toDouble / numBins).mkString(", ")
    df.select(posexplode(col("embedding")).as(Seq("j", "x")))
      .groupBy("j")
      .agg(expr(s"approx_percentile(CAST(x AS DOUBLE), array($probs), $accuracy)").as("qs"))
      .collect()
      .map(r => (r.getInt(0), r.getSeq[Double](1).toArray
        // the sketch's merge order wobbles interpolated quantiles at the
        // last ulp (~1e-13) across input partitionings; bin boundaries are
        // approximate by construction, so round to 9dp and the trained
        // model is partition-invariant (AdaBoostMHSuite pins it)
        .map(v => java.math.BigDecimal.valueOf(v)
          .setScale(9, java.math.RoundingMode.HALF_UP).doubleValue())
        .distinct.sorted))
      .sortBy(_._1)
      .map(_._2)
  }

  /** bin(x) = #thresholds strictly below x (binary search), in 0..numBins-1. */
  private[ml] def binOf(ts: Array[Double], x: Double): Int = {
    var lo = 0; var hi = ts.length
    while (lo < hi) {
      val mid = (lo + hi) >>> 1
      if (ts(mid) < x) lo = mid + 1 else hi = mid
    }
    lo
  }

  private type HistPartial = (Array[Double], Array[Double], Double)

  /** Executor-level tree fan-in: at P partitions the driver receives
    * min(P, MergeBranch) partials (~82 KB each on the harness shape), not
    * P — the difference between KBs and ~800 MB per round at 10k
    * partitions. 16 keeps the tree one level deep up to 256 partitions. */
  private[ml] val MergeBranch = 16

  /** Add partial `b` into `a` (a is a fresh deserialized copy post-shuffle /
    * post-collect, so in-place mutation is safe) — always called with the
    * lower-partition-id side on the left, preserving the deterministic
    * ascending-pid merge order at every tree level. */
  private def mergePartial(a: HistPartial, b: HistPartial): HistPartial = {
    val (ha, sa, wa) = a
    val (hb, sb, wb) = b
    var i = 0
    while (i < ha.length) { ha(i) += hb(i); i += 1 }
    var l = 0
    while (l < sa.length) { sa(l) += sb(l); l += 1 }
    (ha, sa, wa + wb)
  }

  /** One pass: flat hist[((j*numBins)+bin)*k + l] = sum of w*y over points
    * falling in that bin, plus per-label totals S(l) and global mass W.
    * Partials are merged through a deterministic tree (groups of
    * MergeBranch consecutive partition ids per level, each group merged in
    * ascending-pid order), so driver load is O(MergeBranch), not O(P),
    * and the merge sequence — hence every stump — is identical on every
    * run for a given partitioning. */
  private[ml] def histogramPass(rdd: RDD[TrainPoint], grids: Array[Array[Double]],
                                numBins: Int, k: Int): (Array[Double], Array[Double], Double) = {
    val dims = grids.length
    var parts: RDD[(Int, HistPartial)] = rdd.mapPartitionsWithIndex { (pid, it) =>
      val hist = new Array[Double](dims * numBins * k)
      val s = new Array[Double](k)
      var wTot = 0.0
      it.foreach { p =>
        var l = 0
        while (l < k) {
          s(l) += p.w(l) * p.y(l)
          wTot += p.w(l)
          l += 1
        }
        var j = 0
        while (j < dims) {
          val base = (j * numBins + binOf(grids(j), p.x(j))) * k
          var l2 = 0
          while (l2 < k) {
            hist(base + l2) += p.w(l2) * p.y(l2)
            l2 += 1
          }
          j += 1
        }
      }
      Iterator.single((pid, (hist, s, wTot)))
    }
    var width = rdd.getNumPartitions
    while (width > MergeBranch) {
      parts = parts
        .map { case (pid, p) => (pid / MergeBranch, (pid, p)) }
        .groupByKey(math.max(1, width / MergeBranch))
        .map { case (gid, group) =>
          (gid, group.toArray.sortBy(_._1).map(_._2).reduceLeft(mergePartial))
        }
      width = (width + MergeBranch - 1) / MergeBranch
    }
    parts.collect().sortBy(_._1).map(_._2).reduceLeft(mergePartial)
  }

  /** Driver-side argmax over the histogram: best stump for this round.
    * gamma_l(j, theta_b) = (2 * sum_{x>theta_b} w*y - S_l) / W. */
  private[ml] def bestStump(hist: Array[Double], s: Array[Double], wTot: Double,
                            grids: Array[Array[Double]], numBins: Int, k: Int): DecisionStump = {
    var best: DecisionStump = null
    var bestGamma = Double.NegativeInfinity
    val gammaL = new Array[Double](k)
    for (j <- grids.indices) {
      val acc = new Array[Double](k)
      var b = grids(j).length - 1 // theta index, scanning top-down
      while (b >= 0) {
        val base = (j * numBins + (b + 1)) * k
        var l = 0
        while (l < k) { acc(l) += hist(base + l); l += 1 }
        var g = 0.0
        l = 0
        while (l < k) {
          gammaL(l) = (2.0 * acc(l) - s(l)) / wTot
          g += math.abs(gammaL(l))
          l += 1
        }
        val gr = math.rint(g * 1e9) / 1e9 // 1e-9 rounding: stable argmax
        val theta = grids(j)(b)
        // ties: (featureIndex, threshold) ascending; j already scans
        // ascending but theta scans descending, so compare explicitly
        val wins = gr > bestGamma || (gr == bestGamma && best != null &&
          j == best.featureIndex && theta < best.threshold)
        if (wins) {
          bestGamma = gr
          val votes = gammaL.map(gl => if (math.rint(gl * 1e9) >= 0) 1 else -1)
          val gCap = math.min(g, 1.0 - 1e-12)
          val alpha = 0.5 * math.log((1.0 + gCap) / (1.0 - gCap))
          best = DecisionStump(j, theta, alpha, votes)
        }
        b -= 1
      }
    }
    best
  }

  /** Generic boosting loop over arbitrary multi-labeled points. */
  def trainCore(spark: SparkSession, points: RDD[TrainPoint],
                grids: Array[Array[Double]], numBins: Int, k: Int,
                numRounds: Int): Array[DecisionStump] = {
    var rdd = points.persist(StorageLevel.MEMORY_AND_DISK)
    val stumps = Array.newBuilder[DecisionStump]
    for (t <- 1 to numRounds) {
      val (hist, s, wTot) = histogramPass(rdd, grids, numBins, k)
      val stump = bestStump(hist, s, wTot, grids, numBins, k)
      stumps += stump
      val bcast = spark.sparkContext.broadcast(stump)
      val prev = rdd
      rdd = prev.map { p =>
        val st = bcast.value
        val phi = if (p.x(st.featureIndex) > st.threshold) 1 else -1
        val nw = new Array[Double](k)
        var l = 0
        while (l < k) {
          nw(l) = p.w(l) * math.exp(-st.alpha * st.votes(l) * p.y(l) * phi)
          l += 1
        }
        p.copy(w = nw)
      }.persist(StorageLevel.MEMORY_AND_DISK)
      // cut lineage before it grows one lambda per round
      if (t % 5 == 0) rdd.localCheckpoint()
      rdd.count()
      prev.unpersist(blocking = false)
    }
    rdd.unpersist(blocking = false)
    stumps.result()
  }

  /** Train on the harness `embeddings` schema (one-vs-all label encoding). */
  def train(spark: SparkSession, df: DataFrame, numRounds: Int,
            numBins: Int = 16, quantileBins: Boolean = false): Array[DecisionStump] = {
    val grids =
      if (quantileBins) thresholdGridQuantile(df, numBins)
      else thresholdGrid(df, numBins)
    val m = df.count()
    val w0 = 1.0 / (m * NumLabels)
    val points = df
      .select(col("vec_id").cast("long"), col("embedding").cast("array<double>"),
        col("label").cast("int"))
      .rdd.map { r =>
        val label = r.getInt(2)
        // fail loudly, like MultiLabelText.parseLine: an out-of-range label
        // would otherwise silently become an all-negative label vector and
        // corrupt the training weights
        require(label >= 0 && label < NumLabels,
          s"label $label out of range [0,$NumLabels) for vec_id ${r.getLong(0)}")
        TrainPoint(r.getLong(0), r.getSeq[Double](1).toArray,
          Array.tabulate(NumLabels)(l => if (l == label) 1 else -1),
          Array.fill(NumLabels)(w0))
      }
    trainCore(spark, points, grids, numBins, NumLabels, numRounds)
  }

  /** Persist a trained model as parquet: one row per boosting round, in
    * round order (`t`). Parquet, not JSON/pickle: the model is data — it
    * survives language/version changes, is splittable, and loads anywhere
    * the engine runs. Doubles round-trip exactly through parquet. */
  def saveModel(spark: SparkSession, stumps: Array[DecisionStump], path: String): Unit = {
    import spark.implicits._
    stumps.zipWithIndex.toSeq
      .map { case (st, t) => (t, st.featureIndex, st.threshold, st.alpha, st.votes.toSeq) }
      .toDF("t", "feature_index", "threshold", "alpha", "votes")
      .repartition(1) // a model is KBs; never shard it
      .write.mode("overwrite").parquet(path)
  }

  def loadModel(spark: SparkSession, path: String): Array[DecisionStump] =
    spark.read.parquet(path)
      .select("t", "feature_index", "threshold", "alpha", "votes")
      .collect()
      .sortBy(_.getInt(0))
      .map(r => DecisionStump(r.getInt(1), r.getDouble(2), r.getDouble(3),
        r.getSeq[Int](4).toArray))

  /** F(x)_l = sum_t alpha_t * v_tl * phi_t(x); argmax label, ties -> lowest. */
  def scoreVector(stumps: Array[DecisionStump], x: Seq[Double], k: Int): Array[Double] = {
    val f = new Array[Double](k)
    stumps.foreach { st =>
      val phi = if (x(st.featureIndex) > st.threshold) 1 else -1
      var l = 0
      while (l < k) { f(l) += st.alpha * st.votes(l) * phi; l += 1 }
    }
    f
  }

  def predictUdf(stumps: Array[DecisionStump]) = udf { x: Seq[Double] =>
    val f = scoreVector(stumps, x, NumLabels)
    var best = 0
    var l = 1
    while (l < NumLabels) { if (f(l) > f(best)) best = l; l += 1 }
    best
  }

  /** Codegen'd column form of scoreVector + argmax — the hot scoring path.
    * F_l(x) folds the stumps in round order with the same left-associated
    * double additions as scoreVector (alpha_t·v_tl is one driver-side
    * product, phi flips its IEEE sign exactly), and argmax resolves ties
    * to the lowest label via array_position's first match — so predictions
    * are identical to predictUdf on every FINITE, fully-populated input
    * (AdaBoostMHSuite pins it on real data). Edge semantics follow Spark
    * SQL, which is the engine's contract now that transform uses this
    * path: a NaN feature compares GREATER than any threshold (+w vote;
    * the Scala UDF's `>` is false on NaN), and a null/short array yields
    * a null comparison -> -w vote (the UDF would throw). Unlike the UDF
    * this stays inside whole-stage codegen: no serialization boundary per
    * row, ~T·K fused when() branches. The UDF stays as the fallback for
    * callers without a Column in hand. */
  def predictColumn(stumps: Array[DecisionStump], v: Column): Column = {
    val scores = (0 until NumLabels).map { l =>
      stumps.map { st =>
        val w = st.alpha * st.votes(l)
        when(element_at(v, st.featureIndex + 1) > st.threshold, lit(w))
          .otherwise(lit(-w))
      }.reduceLeft(_ + _)
    }
    val f = array(scores: _*)
    (array_position(f, array_max(f)) - 1).cast("int")
  }
}

/** ml.Pipeline-compatible wrapper around [[AdaBoostMH]]. */
class AdaBoostMHClassifier(override val uid: String)
  extends Estimator[AdaBoostMHModel] {

  def this() = this(Identifiable.randomUID("adaboost_mh"))

  val numRounds = new IntParam(this, "numRounds", "boosting rounds",
    ParamValidators.gtEq(1))
  setDefault(numRounds, 10)
  def setNumRounds(v: Int): this.type = set(numRounds, v)

  val numBins = new IntParam(this, "numBins", "threshold bins per feature",
    ParamValidators.gtEq(2))
  setDefault(numBins, 16)
  def setNumBins(v: Int): this.type = set(numBins, v)

  val predictionCol = new Param[String](this, "predictionCol", "output column")
  setDefault(predictionCol, "pred_label")

  override def fit(ds: Dataset[_]): AdaBoostMHModel = {
    val df = ds.toDF()
    val stumps = AdaBoostMH.train(df.sparkSession, df, $(numRounds), $(numBins))
    new AdaBoostMHModel(uid, stumps).setParent(this)
      .set(predictionCol, $(predictionCol))
  }

  override def copy(extra: ParamMap): AdaBoostMHClassifier = defaultCopy(extra)

  override def transformSchema(schema: StructType): StructType =
    schema.add(StructField($(predictionCol), IntegerType, nullable = false))
}

class AdaBoostMHModel(override val uid: String, val stumps: Array[DecisionStump])
  extends Model[AdaBoostMHModel] {

  val predictionCol = new Param[String](this, "predictionCol", "output column")
  setDefault(predictionCol, "pred_label")

  override def transform(ds: Dataset[_]): DataFrame =
    ds.toDF().withColumn($(predictionCol),
      AdaBoostMH.predictColumn(stumps, col("embedding").cast("array<double>")))

  override def copy(extra: ParamMap): AdaBoostMHModel =
    copyValues(new AdaBoostMHModel(uid, stumps).setParent(parent), extra)

  override def transformSchema(schema: StructType): StructType =
    schema.add(StructField($(predictionCol), IntegerType, nullable = false))
}
