package graft.feature

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.api.{Estimator, Model, StageLoader}
import graft.param._
import graft.util.ReadWrite

/**
 * Frequency and smoothed-target encoding for categorical columns —
 * the two workhorse alternatives to one-hot when cardinality is large
 * (high-cardinality categoricals one-hot into millions of columns;
 * frequency/target encoding keeps them ONE numeric column). The
 * reference has no counterpart (its categorical support stops at
 * StringIndexer/OneHotEncoder — feature/stringindexer/
 * StringIndexer.java, feature/onehotencoder/OneHotEncoder.java);
 * beyond-reference addition.
 *
 * Scale shape (both): fit = ONE shuffle, a map-side-combinable
 * groupBy on the category; the model is |categories| rows. transform
 * = a broadcast left join of the model onto the data — no shuffle of
 * the fact table, which is what makes these encoders viable where
 * OneHotEncoder isn't.
 */

// ---------------------------------------------------------------------------
// FrequencyEncoder
// ---------------------------------------------------------------------------

/**
 * Replace each category with its training-set relative frequency
 * (or raw count, via `encoding = "count"`). Unseen categories at
 * transform time encode to 0.0 — "never observed" — the convention
 * that keeps the column total mass-preserving.
 */
class FrequencyEncoder extends Estimator[FrequencyEncoder, FrequencyEncoderModel]
    with HasInputCol[FrequencyEncoder] with HasOutputCol[FrequencyEncoder] {

  final val encoding: Param[String] = param[String](
    "encoding", "What to emit: relative frequency or raw training count",
    "frequency", ParamValidators.inArray("frequency", "count"))
  def getEncoding: String = get(encoding)
  def setEncoding(v: String): FrequencyEncoder = set(encoding, v)

  override def fit(inputs: DataFrame*): FrequencyEncoderModel = {
    require(inputs.size == 1)
    val df = inputs.head
    val counts = df
      .groupBy(col(getInputCol).cast("string").as("category"))
      .agg(count(lit(1)).as("n"))
    // total via a broadcast scalar aggregate, NOT an unpartitioned
    // window: Window.partitionBy() would funnel the ENTIRE model table
    // through one partition — a real straggler at the tens-of-millions
    // of categories these encoders exist for. ReuseExchange shares the
    // groupBy shuffle between the two branches, so the input is
    // scanned once and only 32 partial-sum rows hit the gather.
    val total = counts.agg(sum("n").as("__fe_total"))
    val modelDf = counts
      .crossJoin(broadcast(total))
      .withColumn("frequency", col("n") / col("__fe_total"))
      .drop("__fe_total")
    val m = new FrequencyEncoderModel().setModelData(modelDf)
    copyParamsTo(m)
    m
  }
}
object FrequencyEncoder extends StageLoader[FrequencyEncoder] {
  def load(spark: SparkSession, path: String): FrequencyEncoder =
    ReadWrite.applyParams(new FrequencyEncoder, path)
}

class FrequencyEncoderModel extends Model[FrequencyEncoderModel]
    with HasInputCol[FrequencyEncoderModel] with HasOutputCol[FrequencyEncoderModel] {

  final val encoding: Param[String] = param[String](
    "encoding", "What to emit: relative frequency or raw training count",
    "frequency", ParamValidators.inArray("frequency", "count"))
  def getEncoding: String = get(encoding)

  private var modelData: DataFrame = _
  override def setModelData(data: DataFrame*): FrequencyEncoderModel = {
    modelData = data.head; this
  }
  override def getModelData: Array[DataFrame] = Array(modelData)

  override def transform(inputs: DataFrame*): Array[DataFrame] = {
    require(inputs.size == 1)
    val df = inputs.head
    val value =
      if (getEncoding == "count") col("n").cast("double") else col("frequency")
    // reserved join-column name so an input column literally named
    // "category" stays unambiguous
    val slim = modelData.select(col("category").as("__fe_cat"), value.as("__fe_enc"))
    val out = df
      .join(broadcast(slim), col(getInputCol).cast("string") === col("__fe_cat"), "left")
      .withColumn(getOutputCol, coalesce(col("__fe_enc"), lit(0.0)))
      .drop("__fe_cat", "__fe_enc")
    Array(out)
  }
}
object FrequencyEncoderModel extends StageLoader[FrequencyEncoderModel] {
  def load(spark: SparkSession, path: String): FrequencyEncoderModel = {
    val m = ReadWrite.applyParams(new FrequencyEncoderModel, path)
    m.setModelData(ReadWrite.loadModelData(spark, path))
  }
}

// ---------------------------------------------------------------------------
// TargetEncoder
// ---------------------------------------------------------------------------

/**
 * m-estimate (additive-smoothing) target encoding: category c with n_c
 * training rows and label mean μ_c encodes to
 * (n_c·μ_c + m·μ_global)/(n_c + m), shrinking rare categories toward
 * the global prior (Micci-Barreca, SIGKDD Explorations 2001). Unseen
 * or null categories encode to the prior.
 *
 * Leakage note: encoding a training set with statistics fit on ITSELF
 * leaks the label; fit on a disjoint fold (RandomSplitter /
 * GroupedSplitter) or on out-of-fold data for honest training
 * features. The operator computes statistics exactly as asked — the
 * fold discipline is the pipeline's responsibility.
 */
class TargetEncoder extends Estimator[TargetEncoder, TargetEncoderModel]
    with HasInputCol[TargetEncoder] with HasOutputCol[TargetEncoder]
    with HasLabelCol[TargetEncoder] {

  final val smoothing: Param[Double] = param[Double](
    "smoothing", "m-estimate pseudo-count shrinking rare categories toward the prior",
    20.0, ParamValidators.gtEq(0.0))
  def getSmoothing: Double = get(smoothing)
  def setSmoothing(v: Double): TargetEncoder = set(smoothing, v)

  override def fit(inputs: DataFrame*): TargetEncoderModel = {
    require(inputs.size == 1)
    val df = inputs.head
    val labeled = df.where(col(getLabelCol).isNotNull)
      .select(col(getInputCol).cast("string").as("category"),
        col(getLabelCol).cast("double").as("__y"))
    // fail at fit (with the cause) rather than as a bare
    // NoSuchElementException at transform time on an empty model
    require(!labeled.isEmpty,
      s"TargetEncoder.fit: no rows with a non-null label '$getLabelCol' — cannot fit")
    val stats = labeled
      .groupBy("category")
      .agg(count(lit(1)).as("n"), sum("__y").as("sum_y"))
    val m = getSmoothing
    // prior via a broadcast scalar aggregate, NOT Window.partitionBy()
    // (which would single-partition the whole model table; see
    // FrequencyEncoder.fit). ReuseExchange shares the groupBy shuffle.
    val totals = stats.agg(
      (sum("sum_y") / sum("n")).as("__te_prior"))
    val modelDf = stats
      .crossJoin(broadcast(totals))
      .withColumn("prior", col("__te_prior"))
      .drop("__te_prior")
      .withColumn("mean", col("sum_y") / col("n"))
      .withColumn("encoding",
        (col("sum_y") + lit(m) * col("prior")) / (col("n") + lit(m)))
      .select("category", "n", "mean", "prior", "encoding")
    val model = new TargetEncoderModel().setModelData(modelDf)
    copyParamsTo(model)
    model
  }
}
object TargetEncoder extends StageLoader[TargetEncoder] {
  def load(spark: SparkSession, path: String): TargetEncoder =
    ReadWrite.applyParams(new TargetEncoder, path)
}

class TargetEncoderModel extends Model[TargetEncoderModel]
    with HasInputCol[TargetEncoderModel] with HasOutputCol[TargetEncoderModel] {

  final val smoothing: Param[Double] = param[Double](
    "smoothing", "m-estimate pseudo-count shrinking rare categories toward the prior",
    20.0, ParamValidators.gtEq(0.0))
  def getSmoothing: Double = get(smoothing)

  private var modelData: DataFrame = _
  override def setModelData(data: DataFrame*): TargetEncoderModel = {
    modelData = data.head; this
  }
  override def getModelData: Array[DataFrame] = Array(modelData)

  override def transform(inputs: DataFrame*): Array[DataFrame] = {
    require(inputs.size == 1)
    val df = inputs.head
    // prior repeats on every model row; first() is model-sized driver work
    val prior = modelData.select("prior").head().getDouble(0)
    // reserved join-column name so an input column literally named
    // "category" stays unambiguous
    val slim = modelData.select(col("category").as("__te_cat"), col("encoding").as("__te_enc"))
    val out = df
      .join(broadcast(slim), col(getInputCol).cast("string") === col("__te_cat"), "left")
      .withColumn(getOutputCol, coalesce(col("__te_enc"), lit(prior)))
      .drop("__te_cat", "__te_enc")
    Array(out)
  }
}
object TargetEncoderModel extends StageLoader[TargetEncoderModel] {
  def load(spark: SparkSession, path: String): TargetEncoderModel = {
    val m = ReadWrite.applyParams(new TargetEncoderModel, path)
    m.setModelData(ReadWrite.loadModelData(spark, path))
  }
}
