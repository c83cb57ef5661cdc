package graft.regression

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.api.{Estimator, Model, StageLoader}
import graft.param._
import graft.util.ReadWrite

/**
 * Isotonic (monotone non-decreasing) calibration of a scorer:
 * pool-adjacent-violators regression of the label on the raw score
 * (Zadrozny & Elkan, KDD 2002's calibration recipe; the same model
 * family as spark.ml's IsotonicRegression, differentially tested
 * against it). Where [[graft.evaluation.CalibrationEvaluator]]
 * MEASURES miscalibration, this FIXES it: `fit` learns the stepwise-
 * monotone map from raw score to empirical probability, `transform`
 * applies it with linear interpolation between knots (clamped at the
 * ends, null scores stay null).
 *
 * Distributed shape: the only full-data pass is ONE map-side-
 * combinable groupBy collapsing the corpus to (distinct score,
 * weighted label sum, weight) — at 100 TB a scorer emits bounded
 * distinct scores (floats from a model head), so the PAV merge runs
 * on the driver over O(distinct) pre-aggregated rows, gated by
 * `maxDistinctScores` (the house rule: driver materialization is
 * either O(model) or refused loudly). PAV itself is inherently
 * sequential in score order — the classic stack algorithm here —
 * which is why the parallel part is the aggregation, not the merge
 * (same division of labor as spark.ml, which runs per-partition PAV
 * then re-merges on one node anyway).
 *
 * Model data = (boundary, prediction) knots, non-decreasing in both;
 * transform broadcasts the two arrays (model-sized) into a binary-
 * search + interpolate UDF.
 */
class IsotonicCalibrator extends Estimator[IsotonicCalibrator, IsotonicCalibratorModel]
    with HasLabelCol[IsotonicCalibrator] with HasPredictionCol[IsotonicCalibrator]
    with HasWeightCol[IsotonicCalibrator] {

  final val outputCol: Param[String] =
    param[String]("outputCol", "Calibrated-probability output column", "calibrated")
  def getOutputCol: String = get(outputCol)
  def setOutputCol(v: String): IsotonicCalibrator = set(outputCol, v)

  final val maxDistinctScores: Param[Int] = param[Int](
    "maxDistinctScores",
    "Refuse to fit past this many distinct scores (driver PAV gate)",
    1 << 20, ParamValidators.gt(0))
  def getMaxDistinctScores: Int = get(maxDistinctScores)
  def setMaxDistinctScores(v: Int): IsotonicCalibrator = set(maxDistinctScores, v)

  override def fit(inputs: DataFrame*): IsotonicCalibratorModel = {
    require(inputs.size == 1)
    val df = inputs.head
    val s = col(getPredictionCol).cast("double")
    val y = col(getLabelCol).cast("double")
    val w = Option(getWeightCol).map(c => col(c).cast("double")).getOrElse(lit(1.0))

    val gate = getMaxDistinctScores
    val rows = df.where(s.isNotNull && !isnan(s) && y.isNotNull)
      .select(s.as("s"), (y * w).as("wy"), w.as("w"))
      .groupBy("s").agg(sum("wy").as("wy"), sum("w").as("w"))
      .orderBy("s")
      .limit(gate + 1)
      .collect()
    require(rows.nonEmpty, "IsotonicCalibrator: no valid (score, label) rows to fit on")
    require(rows.length <= gate,
      s"IsotonicCalibrator: more than maxDistinctScores=$gate distinct scores — " +
        "bucket the score upstream (e.g. round it) or raise the gate")

    // pool-adjacent-violators over the score-sorted aggregates: merge
    // a block into its left neighbor while its mean DECREASES the
    // sequence; ties stay separate blocks (interpolation result is
    // identical either way)
    final case class Block(var wy: Double, var w: Double, var lo: Double, var hi: Double) {
      def mean: Double = wy / w
    }
    val blocks = scala.collection.mutable.ArrayBuffer.empty[Block]
    rows.foreach { r =>
      val sc = r.getDouble(0)
      blocks += Block(r.getDouble(1), r.getDouble(2), sc, sc)
      while (blocks.length >= 2 &&
          blocks(blocks.length - 1).mean < blocks(blocks.length - 2).mean) {
        val top = blocks.remove(blocks.length - 1)
        val prev = blocks.last
        prev.wy += top.wy; prev.w += top.w; prev.hi = top.hi
      }
    }

    val knots = blocks.toSeq.flatMap { b =>
      if (b.lo == b.hi) Seq((b.lo, b.mean)) else Seq((b.lo, b.mean), (b.hi, b.mean))
    }
    val spark = df.sparkSession
    import spark.implicits._
    val m = new IsotonicCalibratorModel()
      .setModelData(knots.toDF("boundary", "prediction"))
    copyParamsTo(m)
    m
  }
}

object IsotonicCalibrator extends StageLoader[IsotonicCalibrator] {
  def load(spark: SparkSession, path: String): IsotonicCalibrator =
    ReadWrite.applyParams(new IsotonicCalibrator, path)
}

class IsotonicCalibratorModel extends Model[IsotonicCalibratorModel]
    with HasPredictionCol[IsotonicCalibratorModel] {

  final val outputCol: Param[String] =
    param[String]("outputCol", "Calibrated-probability output column", "calibrated")
  def getOutputCol: String = get(outputCol)
  def setOutputCol(v: String): IsotonicCalibratorModel = set(outputCol, v)

  private var modelData: DataFrame = _
  override def setModelData(data: DataFrame*): IsotonicCalibratorModel = {
    modelData = data.head; this
  }
  override def getModelData: Array[DataFrame] = Array(modelData)

  override def transform(inputs: DataFrame*): Array[DataFrame] = {
    require(inputs.size == 1)
    val knots = modelData.select("boundary", "prediction").collect()
      .map(r => (r.getDouble(0), r.getDouble(1))).sortBy(_._1)
    val bounds = knots.map(_._1)
    val preds = knots.map(_._2)
    val predict = udf { x: java.lang.Double =>
      if (x == null || x.isNaN) null
      else {
        val v = x.doubleValue()
        if (v <= bounds.head) java.lang.Double.valueOf(preds.head)
        else if (v >= bounds.last) java.lang.Double.valueOf(preds.last)
        else {
          var i = java.util.Arrays.binarySearch(bounds, v)
          if (i >= 0) java.lang.Double.valueOf(preds(i))
          else {
            i = -i - 1 // insertion point: bounds(i-1) < v < bounds(i)
            val (x0, x1) = (bounds(i - 1), bounds(i))
            val (y0, y1) = (preds(i - 1), preds(i))
            java.lang.Double.valueOf(y0 + (y1 - y0) * (v - x0) / (x1 - x0))
          }
        }
      }
    }
    Array(inputs.head.withColumn(getOutputCol,
      predict(col(getPredictionCol).cast("double"))))
  }
}

object IsotonicCalibratorModel extends StageLoader[IsotonicCalibratorModel] {
  def load(spark: SparkSession, path: String): IsotonicCalibratorModel = {
    val m = ReadWrite.applyParams(new IsotonicCalibratorModel, path)
    m.setModelData(ReadWrite.loadModelData(spark, path))
  }
}
