package graft.evaluation

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.api.{AlgoOperator, StageLoader}
import graft.param._
import graft.util.ReadWrite

/**
 * Regression metrics from (label, prediction) pairs: one row with
 * rmse, mae, r2, mape (mean absolute percentage error over rows with
 * label ≠ 0) and n. Completes the evaluation tier next to the binary
 * and multiclass evaluators; the reference has no regression
 * evaluator at all — beyond-reference addition. R² uses the standard
 * 1 − SS_res/SS_tot definition (R² = 0 when the label is constant
 * and predictions are off; 1 when SS_res = 0).
 *
 * Scale shape: ONE aggregation pass (partial+final, codegen) — five
 * sums over the pairs; no sort, no shuffle beyond the single global
 * aggregate.
 */
class RegressionEvaluator extends AlgoOperator[RegressionEvaluator]
    with HasLabelCol[RegressionEvaluator]
    with HasPredictionCol[RegressionEvaluator] {

  override def transform(inputs: DataFrame*): Array[DataFrame] = {
    require(inputs.size == 1)
    val y = col(getLabelCol).cast("double")
    val p = col(getPredictionCol).cast("double")
    val err = y - p
    // rows missing either side carry no error signal; dropping them up
    // front keeps n consistent with the sums (a null label with a
    // counted n would silently deflate rmse/mae/mape)
    val pairs = inputs.head.where(y.isNotNull && p.isNotNull)
    val agg = pairs.agg(
      count(lit(1)).as("n"),
      sum(err * err).as("ss_res"),
      sum(abs(err)).as("sae"),
      sum(y).as("sy"),
      sum(y * y).as("syy"),
      sum(when(y =!= 0.0, abs(err / y))).as("sape"),
      sum(when(y =!= 0.0, 1L).otherwise(0L)).as("n_nonzero"))
    val out = agg.select(
      col("n"),
      sqrt(col("ss_res") / col("n")).as("rmse"),
      (col("sae") / col("n")).as("mae"),
      // SS_tot = Σy² − (Σy)²/n; constant label → SS_tot 0 → R² 0 unless exact
      when(col("ss_res") === 0.0, 1.0)
        .otherwise(
          when(col("syy") - col("sy") * col("sy") / col("n") <= 0.0, 0.0)
            .otherwise(lit(1.0) - col("ss_res") /
              (col("syy") - col("sy") * col("sy") / col("n")))).as("r2"),
      when(col("n_nonzero") === 0L, lit(null).cast("double"))
        .otherwise(col("sape") / col("n_nonzero")).as("mape"))
    Array(out)
  }
}
object RegressionEvaluator extends StageLoader[RegressionEvaluator] {
  def load(spark: SparkSession, path: String): RegressionEvaluator =
    ReadWrite.applyParams(new RegressionEvaluator, path)
}
