package graft.ml

import org.apache.spark.ml.evaluation.Evaluator
import org.apache.spark.ml.param.{Param, ParamMap}
import org.apache.spark.ml.util.Identifiable
import org.apache.spark.sql.Dataset
import org.apache.spark.sql.functions._

/** Hamming loss of an argmax prediction against one-vs-all {-1,+1}^K labels:
  * mean over (example, label) pairs of 1[sign(F_l) != y_l]. For a single-
  * label prediction p vs true label y, exactly 0 pairs differ when p == y
  * and 2 when p != y, so loss = avg(2 * [p != y]) / K.
  */
class HammingLossEvaluator(override val uid: String) extends Evaluator {

  def this() = this(Identifiable.randomUID("hamming_eval"))

  val predictionCol = new Param[String](this, "predictionCol", "prediction column")
  setDefault(predictionCol, "pred_label")
  def setPredictionCol(v: String): this.type = set(predictionCol, v)

  val labelCol = new Param[String](this, "labelCol", "label column")
  setDefault(labelCol, "label")
  def setLabelCol(v: String): this.type = set(labelCol, v)

  override def evaluate(ds: Dataset[_]): Double = {
    val k = AdaBoostMH.NumLabels.toDouble
    ds.select(
        (when(col($(predictionCol)) === col($(labelCol)), 0.0).otherwise(2.0) / k).as("hl"))
      .agg(avg("hl")).head().getDouble(0)
  }

  /** Lower is better. */
  override def isLargerBetter: Boolean = false

  override def copy(extra: ParamMap): HammingLossEvaluator = defaultCopy(extra)
}
