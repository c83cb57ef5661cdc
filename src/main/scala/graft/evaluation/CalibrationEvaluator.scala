package graft.evaluation

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.api.{AlgoOperator, StageLoader}
import graft.param._
import graft.util.ReadWrite

/**
 * Probability-calibration diagnostics for binary scorers: a model
 * whose 0.9-scores win only 60% of the time ranks fine (AUC can't
 * see it) but is useless wherever the probability itself is consumed
 * — thresholding, expected-value decisions, data-selection weights.
 * The reference's evaluator (like ours in
 * [[BinaryClassificationEvaluator]]) stops at ranking metrics;
 * beyond-reference addition completing the evaluator family's
 * probability axis.
 *
 * [[transform]] emits the RELIABILITY CURVE: `numBins` equal-width
 * probability bins, one row per non-empty bin — `(bin, n, mean_pred,
 * frac_pos)` — where |mean_pred − frac_pos| is the bin's calibration
 * gap. [[summary]] rolls the same bins into the two standard scalars:
 * Brier score (mean squared probability error, one agg pass) and ECE
 * (expected calibration error — the support-weighted mean bin gap).
 *
 * Predictions must already be probabilities in [0, 1]; out-of-range
 * rows fail loudly rather than silently clamping (a score that isn't
 * a probability is an upstream bug, not a binning choice).
 * Prediction 1.0 falls into the last bin.
 *
 * Scale shape: ONE shuffle to the ≤ numBins bin rows
 * (map-side-combined groupBy); Brier folds into the same pass
 * through [[summary]]'s single collect of the bin frame. Never a
 * sort, never a per-row window.
 */
class CalibrationEvaluator extends AlgoOperator[CalibrationEvaluator]
    with HasLabelCol[CalibrationEvaluator]
    with HasPredictionCol[CalibrationEvaluator] {

  final val numBins: Param[Int] = param[Int](
    "numBins", "Equal-width probability bins for the reliability curve", 10,
    ParamValidators.gtEq(1.0))
  def getNumBins: Int = get(numBins)
  def setNumBins(v: Int): CalibrationEvaluator = set(numBins, v)

  override def transform(inputs: DataFrame*): Array[DataFrame] = {
    require(inputs.size == 1)
    val df = inputs.head
    val p = col(getPredictionCol).cast("double")
    val y = col(getLabelCol).cast("double")
    val b = getNumBins
    val scored = df.select(
      when(p.isNull || p < 0.0 || p > 1.0,
        raise_error(concat(lit("CalibrationEvaluator: prediction out of [0,1]: "), p)))
        .otherwise(p).as("p"),
      y.as("y"))
    // bin = floor(p * numBins), with p = 1.0 folded into the last bin
    val bin = least(floor(col("p") * b).cast("int"), lit(b - 1))
    Array(scored
      .groupBy(bin.as("bin"))
      .agg(count(lit(1)).as("n"),
        avg("p").as("mean_pred"),
        avg("y").as("frac_pos"),
        // per-bin Brier contribution so summary() needs no second scan
        sum((col("p") - col("y")) * (col("p") - col("y"))).as("sq_err"))
      .withColumn("gap", abs(col("mean_pred") - col("frac_pos"))))
  }

  /** Brier score + ECE from the bin frame (O(numBins) driver work). */
  def summary(input: DataFrame): CalibrationSummary = {
    val rows = transform(input).head
      .select("n", "gap", "sq_err").collect()
    val total = rows.map(_.getLong(0)).sum
    require(total > 0, "CalibrationEvaluator: empty input")
    CalibrationSummary(
      brier = rows.map(_.getDouble(2)).sum / total,
      ece = rows.map(r => r.getDouble(1) * r.getLong(0)).sum / total,
      numBinsUsed = rows.length)
  }
}

case class CalibrationSummary(brier: Double, ece: Double, numBinsUsed: Int)

object CalibrationEvaluator extends StageLoader[CalibrationEvaluator] {
  def load(spark: SparkSession, path: String): CalibrationEvaluator =
    ReadWrite.applyParams(new CalibrationEvaluator, path)
}
