package graft.classification

import org.apache.spark.ml.linalg.Vector
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.api._
import graft.param._
import graft.util.ReadWrite

/**
 * Naive Bayes over categorical feature values (each vector dimension is
 * a categorical feature; the reference's "multinomial" NB).
 *
 * Model math (reference classification/naivebayes/NaiveBayes.java:68,
 * GenerateModelFunction): with per-label doc counts n_i, per-feature
 * distinct-value counts c_j, F features, N total docs:
 *   theta[i][j][v] = log(count(label=i, feat_j=v) + smoothing)
 *                    - log(n_i + smoothing·c_j)
 *   pi[i] = log(n_i·F + smoothing) - log(N·F + L·smoothing)
 * Predict: argmax_i pi[i] + Σ_j theta[i][j][x_j].
 */
class NaiveBayes extends Estimator[NaiveBayes, NaiveBayesModel]
    with HasFeaturesCol[NaiveBayes] with HasLabelCol[NaiveBayes]
    with HasPredictionCol[NaiveBayes] {

  final val smoothing: Param[Double] =
    param[Double]("smoothing", "The smoothing parameter", 1.0, ParamValidators.gtEq(0))
  def setSmoothing(v: Double): NaiveBayes = set(smoothing, v)
  def getSmoothing: Double = get(smoothing)

  override def fit(inputs: DataFrame*): NaiveBayesModel = {
    require(inputs.size == 1)
    val df = inputs.head
    val sm = getSmoothing

    // one shuffle: (label, featureIdx, value) → count; everything after
    // operates on the (small) contingency table. The limit bounds driver
    // memory: a continuous feature fed as categorical would otherwise
    // make the contingency collect O(rows)
    val counts = df.select(col(getLabelCol).cast("double").as("label"),
        posexplode(org.apache.spark.ml.functions.vector_to_array(col(getFeaturesCol)))
          .as(Seq("fidx", "value")))
      .groupBy("label", "fidx", "value").agg(count(lit(1)).as("cnt"))
      .limit(NaiveBayes.MaxContingencyCells + 1)
      .collect()
      .map(r => (r.getDouble(0), r.getInt(1), r.getDouble(2), r.getLong(3)))
    require(counts.length <= NaiveBayes.MaxContingencyCells,
      s"NaiveBayes contingency table exceeds ${NaiveBayes.MaxContingencyCells} " +
        "(label, feature, value) cells; features must be categorical — " +
        "discretize continuous columns (e.g. Bucketizer/KBinsDiscretizer) first")

    val labels = counts.map(_._1).distinct.sorted
    val numFeatures = counts.map(_._2).max + 1
    val docCount: Map[Double, Long] = counts.filter(_._2 == 0).groupBy(_._1)
      .map { case (l, rows) => l -> rows.map(_._4).sum }
    val distinctPerFeature: Map[Int, Array[Double]] = counts.groupBy(_._2)
      .map { case (j, rows) => j -> rows.map(_._3).distinct.sorted }
    val byLabelFeature = counts.groupBy(r => (r._1, r._2))
      .map { case (k, rows) => k -> rows.map(r => r._3 -> r._4).toMap }

    val totalDocs = docCount.values.sum
    // ragged inputs would silently train a model that indexes past the
    // short vectors; the reference rejects them at fit
    // (NaiveBayes.java — "Feature vectors should be of equal length.").
    // Every feature index must appear exactly once per document:
    val perFeatureTotals: Map[Int, Long] =
      counts.groupBy(_._2).map { case (j, rows) => j -> rows.map(_._4).sum }
    require((0 until numFeatures).forall(j => perFeatureTotals.getOrElse(j, 0L) == totalDocs),
      "Feature vectors should be of equal length.")
    val piLog = math.log(totalDocs.toDouble * numFeatures + labels.length * sm)

    // model rows: (labelIdx, label, pi, fidx, value, logProb)
    val rows = for {
      (l, li) <- labels.zipWithIndex
      j <- 0 until numFeatures
      v <- distinctPerFeature(j)
    } yield {
      val thetaLog = math.log(docCount(l) + sm * distinctPerFeature(j).length)
      val cnt = byLabelFeature.getOrElse((l, j), Map.empty).getOrElse(v, 0L)
      val pi = math.log(docCount(l).toDouble * numFeatures + sm) - piLog
      (li, l, pi, j, v, math.log(cnt + sm) - thetaLog)
    }

    val spark = df.sparkSession
    import spark.implicits._
    val modelDf = rows.toSeq.toDF("labelIdx", "label", "pi", "fidx", "value", "logProb")
    val m = new NaiveBayesModel().setModelData(modelDf)
    copyParamsTo(m)
    m
  }
}
object NaiveBayes extends StageLoader[NaiveBayes] {
  /** Driver-memory bound on collected (label, feature, value) cells (~100 MB of rows). */
  val MaxContingencyCells: Int = 1 << 22

  def load(spark: SparkSession, path: String): NaiveBayes =
    ReadWrite.applyParams(new NaiveBayes, path)
}

class NaiveBayesModel extends Model[NaiveBayesModel]
    with HasFeaturesCol[NaiveBayesModel] with HasPredictionCol[NaiveBayesModel] {

  private var modelData: DataFrame = _
  override def setModelData(data: DataFrame*): NaiveBayesModel = { modelData = data.head; this }
  override def getModelData: Array[DataFrame] = Array(modelData)

  override def transform(inputs: DataFrame*): Array[DataFrame] = {
    require(inputs.size == 1)
    val rows = modelData.select("label", "pi", "fidx", "value", "logProb").collect()
    val labels = rows.map(r => (r.getDouble(0), r.getDouble(1))).distinct.sortBy(_._1)
    val theta: Map[(Double, Int), Map[Double, Double]] =
      rows.groupBy(r => (r.getDouble(0), r.getInt(2)))
        .map { case (k, rs) => k -> rs.map(r => r.getDouble(3) -> r.getDouble(4)).toMap }
    val bc = inputs.head.sparkSession.sparkContext.broadcast((labels, theta))
    val predict = udf { v: Vector =>
      if (v == null) null
      else {
        val (ls, th) = bc.value
        // start from the first model label so an all-minus-infinity
        // posterior never yields a label the model does not contain
        var bestLabel = ls.head._1
        var bestProb = Double.NegativeInfinity
        ls.foreach { case (label, pi) =>
          var p = pi
          var j = 0
          while (j < v.size && p > Double.NegativeInfinity) {
            p += th.getOrElse((label, j), Map.empty)
              .getOrElse(v(j), Double.NegativeInfinity)
            j += 1
          }
          if (p > bestProb) { bestProb = p; bestLabel = label }
        }
        java.lang.Double.valueOf(bestLabel)
      }
    }
    Array(inputs.head.withColumn(getPredictionCol, predict(col(getFeaturesCol))))
  }
}
object NaiveBayesModel extends StageLoader[NaiveBayesModel] {
  def load(spark: SparkSession, path: String): NaiveBayesModel = {
    val m = ReadWrite.applyParams(new NaiveBayesModel, path)
    m.setModelData(ReadWrite.loadModelData(spark, path))
  }
}
