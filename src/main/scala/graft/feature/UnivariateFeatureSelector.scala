package graft.feature

import org.apache.spark.ml.linalg.{DenseVector, SparseVector, Vector, Vectors}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.api._
import graft.param._
import graft.util.ReadWrite

/**
 * Selects features by univariate statistical tests of each feature
 * against the label. The score function follows from the declared
 * (featureType, labelType) pair — (categorical, categorical) → χ²,
 * (continuous, categorical) → ANOVA F, (continuous, continuous) →
 * regression F — and the selection mode picks indices from the
 * resulting p-values.
 * Reference: feature/univariatefeatureselector/UnivariateFeatureSelector.java:103
 * (score routing), :205-255 (selection modes),
 * UnivariateFeatureSelectorModel.java:125 (ascending slice).
 *
 * Scale notes: the heavy lifting is the underlying test (one shuffle
 * over (featureIdx, value, label)); selection itself handles
 * O(numFeatures) p-values on the driver.
 */
trait UnivariateFeatureSelectorParams[T] extends WithParams[T]
    with HasFeaturesCol[T] with HasOutputCol[T] {
  final val featureType: Param[String] =
    paramNoDefault[String]("featureType", "The feature type (categorical or continuous).",
      ParamValidators.inArray("categorical", "continuous"))
  def getFeatureType: String = get(featureType)
  def setFeatureType(v: String): T = set(featureType, v)

  final val selectionMode: Param[String] =
    param[String]("selectionMode", "The feature selection mode.", "numTopFeatures",
      ParamValidators.inArray("numTopFeatures", "percentile", "fpr", "fdr", "fwe"))
  def getSelectionMode: String = get(selectionMode)
  def setSelectionMode(v: String): T = set(selectionMode, v)
}

class UnivariateFeatureSelector
    extends Estimator[UnivariateFeatureSelector, UnivariateFeatureSelectorModel]
    with UnivariateFeatureSelectorParams[UnivariateFeatureSelector]
    with HasLabelCol[UnivariateFeatureSelector] {

  final val labelType: Param[String] =
    paramNoDefault[String]("labelType", "The label type (categorical or continuous).",
      ParamValidators.inArray("categorical", "continuous"))
  def getLabelType: String = get(labelType)
  def setLabelType(v: String): UnivariateFeatureSelector = set(labelType, v)

  final val selectionThreshold: Param[Double] =
    paramNoDefault[Double]("selectionThreshold", "The upper bound of the features that selector will select.")
  def getSelectionThreshold: Double = get(selectionThreshold)
  def setSelectionThreshold(v: Double): UnivariateFeatureSelector = set(selectionThreshold, v)

  /** Mode-dependent default, validated like the reference (:156-184). */
  private def actualThreshold: Double = {
    if (!isSet(selectionThreshold)) getSelectionMode match {
      case "numTopFeatures" => 50.0
      case "percentile" => 0.1
      case _ => 0.05
    } else {
      val t = getSelectionThreshold
      if (getSelectionMode == "numTopFeatures")
        require(t >= 1 && t.toInt == t,
          s"SelectionThreshold needs to be a positive Integer for selection mode numTopFeatures, but got $t.")
      else
        require(t >= 0 && t <= 1,
          s"SelectionThreshold needs to be in the range [0, 1] for selection mode $getSelectionMode, but got $t.")
      t
    }
  }

  override def fit(inputs: DataFrame*): UnivariateFeatureSelectorModel = {
    require(inputs.size == 1)
    val df = inputs.head
    val flat = (getFeatureType, getLabelType) match {
      case ("categorical", "categorical") => new graft.stats.ChiSqTest()
        .setFeaturesCol(getFeaturesCol).setLabelCol(getLabelCol).setFlatten(true)
        .transform(df).head
      case ("continuous", "categorical") => new graft.stats.ANOVATest()
        .setFeaturesCol(getFeaturesCol).setLabelCol(getLabelCol).setFlatten(true)
        .transform(df).head
      case ("continuous", "continuous") => new graft.stats.FValueTest()
        .setFeaturesCol(getFeaturesCol).setLabelCol(getLabelCol).setFlatten(true)
        .transform(df).head
      case (f, l) => throw new IllegalArgumentException(
        s"Unsupported combination: featureType=$f, labelType=$l.")
    }
    val pv = flat.select("pValue", "featureIndex").collect()
      .map(r => (r.getDouble(0), r.getInt(1)))
    val threshold = actualThreshold
    val byP = pv.sortBy { case (p, i) => (p, i) }
    val indices: Array[Int] = getSelectionMode match {
      case "numTopFeatures" => byP.take(threshold.toInt).map(_._2)
      case "percentile" => byP.take((pv.length * threshold).toInt).map(_._2)
      case "fpr" => pv.filter(_._1 < threshold).map(_._2)
      case "fdr" =>
        // Benjamini-Hochberg: largest i with p_(i) < (t/n)·(i+1)
        val maxIndex = byP.zipWithIndex
          .filter { case ((p, _), i) => p < threshold / pv.length * (i + 1) }
          .map(_._2).foldLeft(-1)(math.max)
        byP.take(maxIndex + 1).map(_._2)
      case "fwe" => pv.filter(_._1 < threshold / pv.length).map(_._2)
    }
    val spark = df.sparkSession
    import spark.implicits._
    val m = new UnivariateFeatureSelectorModel()
      .setModelData(Seq(Tuple1(indices)).toDF("indices"))
    copyParamsTo(m)
    m
  }
}
object UnivariateFeatureSelector extends StageLoader[UnivariateFeatureSelector] {
  def load(spark: SparkSession, path: String): UnivariateFeatureSelector =
    ReadWrite.applyParams(new UnivariateFeatureSelector, path)
}

class UnivariateFeatureSelectorModel extends Model[UnivariateFeatureSelectorModel]
    with UnivariateFeatureSelectorParams[UnivariateFeatureSelectorModel] {

  private var modelData: DataFrame = _
  override def setModelData(data: DataFrame*): UnivariateFeatureSelectorModel = {
    modelData = data.head; this
  }
  override def getModelData: Array[DataFrame] = Array(modelData)

  override def transform(inputs: DataFrame*): Array[DataFrame] = {
    require(inputs.size == 1)
    // slice in ascending index order (reference Model.java:125)
    val idx = modelData.select("indices").head().getSeq[Int](0).toArray.sorted
    val slice = udf { v: Vector =>
      v match {
        case null => null
        case d: DenseVector => Vectors.dense(idx.map(d.apply)): Vector
        case s: SparseVector =>
          val pairs = idx.zipWithIndex.flatMap { case (orig, newI) =>
            val x = s(orig); if (x != 0.0) Some((newI, x)) else None
          }
          Vectors.sparse(idx.length, pairs.map(_._1), pairs.map(_._2)): Vector
      }
    }
    Array(inputs.head.withColumn(getOutputCol, slice(col(getFeaturesCol))))
  }
}
object UnivariateFeatureSelectorModel extends StageLoader[UnivariateFeatureSelectorModel] {
  def load(spark: SparkSession, path: String): UnivariateFeatureSelectorModel = {
    val m = ReadWrite.applyParams(new UnivariateFeatureSelectorModel, path)
    m.setModelData(ReadWrite.loadModelData(spark, path))
  }
}
