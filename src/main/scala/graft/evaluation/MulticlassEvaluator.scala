package graft.evaluation

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.api.{AlgoOperator, StageLoader}
import graft.param._
import graft.util.ReadWrite

/**
 * Multiclass classification metrics from (label, prediction) pairs:
 * one row per class — true positives, support, predicted count,
 * precision, recall, F1 — plus [[summary]] for the scalar roll-ups
 * (accuracy, macro precision/recall/F1, weighted F1). The reference
 * ships only a binary evaluator (evaluation/binaryclassification/
 * BinaryClassificationEvaluator.java); every multiclass model in this
 * engine (NaiveBayes, Knn, KMeans-as-classifier, multinomial LR)
 * needs this to be evaluated at all — beyond-reference addition.
 *
 * Conventions (the scikit-learn defaults): the class set is the UNION
 * of observed labels and observed predictions; a class never
 * predicted has precision 0, a class never present has recall 0, and
 * F1 is 0 whenever precision + recall is 0.
 *
 * Scale shape: ONE shuffle on (label, prediction) to the confusion
 * counts — a |classes|² relation at most — then class-level arithmetic
 * on that tiny frame (broadcast-joined). No per-row state, no sort,
 * no collect beyond the summary's O(|classes|) row set.
 */
class MulticlassEvaluator extends AlgoOperator[MulticlassEvaluator]
    with HasLabelCol[MulticlassEvaluator]
    with HasPredictionCol[MulticlassEvaluator] {

  /** Per-class metric rows: (clazz, tp, support, predicted, precision, recall, f1). */
  override def transform(inputs: DataFrame*): Array[DataFrame] = {
    require(inputs.size == 1)
    val df = inputs.head
    val label = col(getLabelCol).cast("double")
    val pred = col(getPredictionCol).cast("double")

    val conf = df.groupBy(label.as("l"), pred.as("p")).agg(count(lit(1)).as("n"))
    val classes = conf.select(col("l").as("clazz"))
      .union(conf.select(col("p").as("clazz"))).distinct()
    val support = conf.groupBy(col("l").as("clazz")).agg(sum("n").as("support"))
    val predicted = conf.groupBy(col("p").as("clazz")).agg(sum("n").as("predicted"))
    val tp = conf.where(col("l") === col("p"))
      .select(col("l").as("clazz"), col("n").as("tp"))

    val joined = classes
      .join(support, Seq("clazz"), "left")
      .join(predicted, Seq("clazz"), "left")
      .join(tp, Seq("clazz"), "left")
      .na.fill(0L, Seq("support", "predicted", "tp"))
    val precision = when(col("predicted") === 0L, 0.0)
      .otherwise(col("tp") / col("predicted"))
    val recall = when(col("support") === 0L, 0.0)
      .otherwise(col("tp") / col("support"))
    val out = joined
      .withColumn("precision", precision)
      .withColumn("recall", recall)
      .withColumn("f1",
        when(col("precision") + col("recall") === 0.0, 0.0)
          .otherwise(lit(2.0) * col("precision") * col("recall")
            / (col("precision") + col("recall"))))
    Array(out)
  }

  /** Scalar roll-ups computed from the per-class rows (O(|classes|)
    * driver work): accuracy, macro precision/recall/F1 (unweighted
    * class mean), support-weighted F1. */
  def summary(input: DataFrame): MulticlassSummary = {
    val rows = transform(input).head
      .select("clazz", "tp", "support", "precision", "recall", "f1").collect()
    val total = rows.map(_.getLong(2)).sum
    val correct = rows.map(_.getLong(1)).sum
    val k = rows.length
    MulticlassSummary(
      accuracy = if (total == 0) 0.0 else correct.toDouble / total,
      macroPrecision = rows.map(_.getDouble(3)).sum / k,
      macroRecall = rows.map(_.getDouble(4)).sum / k,
      macroF1 = rows.map(_.getDouble(5)).sum / k,
      weightedF1 =
        if (total == 0) 0.0
        else rows.map(r => r.getDouble(5) * r.getLong(2)).sum / total,
      numClasses = k)
  }
}

case class MulticlassSummary(
    accuracy: Double,
    macroPrecision: Double,
    macroRecall: Double,
    macroF1: Double,
    weightedF1: Double,
    numClasses: Int)

object MulticlassEvaluator extends StageLoader[MulticlassEvaluator] {
  def load(spark: SparkSession, path: String): MulticlassEvaluator =
    ReadWrite.applyParams(new MulticlassEvaluator, path)
}
