package graft.streaming

import org.apache.spark.ml.linalg.{DenseVector, SparseVector, Vector, Vectors}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.api._
import graft.param._
import graft.util.ReadWrite

/**
 * Online logistic regression trained with the FTRL-Proximal optimizer
 * over mini-batches.
 * Reference: classification/logisticregression/OnlineLogisticRegression.java:86;
 * gradient (per-dimension mean) :355-395, FTRL update :292-320:
 *   σ_i = (√(n_i + g_i²) − √n_i) / α
 *   z_i += g_i − σ_i·w_i ;  n_i += g_i²
 *   w_i = 0                         if |z_i| ≤ l1
 *       = (sign(z_i)·l1 − z_i) / ((β + √n_i)/α + l2)  otherwise
 * with l1 = elasticNet·reg, l2 = (1 − elasticNet)·reg.
 *
 * Scale shape per batch: one treeReduce of the [gradient | weightSum]
 * pair; the FTRL state (z, n, w — each O(dim)) advances on the driver,
 * mirroring the reference's parallelism-1 updater.
 */
class OnlineLogisticRegression
    extends Estimator[OnlineLogisticRegression, OnlineLogisticRegressionModel]
    with HasFeaturesCol[OnlineLogisticRegression] with HasLabelCol[OnlineLogisticRegression]
    with HasPredictionCol[OnlineLogisticRegression] with HasWeightCol[OnlineLogisticRegression]
    with HasGlobalBatchSize[OnlineLogisticRegression] with HasReg[OnlineLogisticRegression]
    with HasElasticNet[OnlineLogisticRegression] {

  final val alpha: Param[Double] =
    param[Double]("alpha", "The alpha parameter of FTRL.", 0.1, ParamValidators.gt(0))
  final val beta: Param[Double] =
    param[Double]("beta", "The beta parameter of FTRL.", 0.1, ParamValidators.gt(0))
  def setAlpha(v: Double): OnlineLogisticRegression = set(alpha, v)
  def setBeta(v: Double): OnlineLogisticRegression = set(beta, v)
  def getAlpha: Double = get(alpha)
  def getBeta: Double = get(beta)

  private var initialModel: Option[DataFrame] = None
  def setInitialModelData(df: DataFrame): OnlineLogisticRegression = {
    initialModel = Some(df); this
  }

  override def fit(inputs: DataFrame*): OnlineLogisticRegressionModel = {
    require(inputs.size == 1)
    val df = inputs.head
    val spark = df.sparkSession
    val init = initialModel.getOrElse(
      sys.error("OnlineLogisticRegression requires initial model data (setInitialModelData)"))
    var model = new OnlineLogisticRegressionModel().setModelData(init)
    copyParamsTo(model)

    val batchSize = getGlobalBatchSize
    val weightExpr = if (getWeightCol == null) lit(1.0) else col(getWeightCol).cast("double")
    import spark.implicits._
    val indexed = df.select(col(getFeaturesCol), col(getLabelCol).cast("double"), weightExpr)
      .rdd.zipWithIndex()
      .map { case (r, i) => (i / batchSize, r.getAs[Vector](0), r.getDouble(1), r.getDouble(2)) }
      .toDF("batch", "features", "label", "w")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val numBatches = indexed.count() / batchSize
    var b = 0L
    while (b < numBatches) {
      model = model.update(indexed.where(col("batch") === b),
        "features", "label", "w")
      b += 1
    }
    indexed.unpersist(blocking = false)
    model
  }
}
object OnlineLogisticRegression extends StageLoader[OnlineLogisticRegression] {
  def load(spark: SparkSession, path: String): OnlineLogisticRegression =
    ReadWrite.applyParams(new OnlineLogisticRegression, path)
}

/**
 * FTRL state + coefficients: model data rows
 * (coefficient vector, zParam vector, nParam vector). `update`
 * advances the state by one mini-batch (Structured Streaming hook:
 * call from foreachBatch).
 */
class OnlineLogisticRegressionModel extends Model[OnlineLogisticRegressionModel]
    with HasFeaturesCol[OnlineLogisticRegressionModel]
    with HasPredictionCol[OnlineLogisticRegressionModel]
    with HasRawPredictionCol[OnlineLogisticRegressionModel]
    with HasReg[OnlineLogisticRegressionModel]
    with HasElasticNet[OnlineLogisticRegressionModel] {

  final val alpha: Param[Double] =
    param[Double]("alpha", "The alpha parameter of FTRL.", 0.1, ParamValidators.gt(0))
  final val beta: Param[Double] =
    param[Double]("beta", "The beta parameter of FTRL.", 0.1, ParamValidators.gt(0))
  def getAlpha: Double = get(alpha)
  def getBeta: Double = get(beta)

  private var modelData: DataFrame = _
  override def setModelData(data: DataFrame*): OnlineLogisticRegressionModel = {
    modelData = data.head; this
  }
  override def getModelData: Array[DataFrame] = Array(modelData)

  /** One FTRL mini-batch step. A ZERO-PARTITION micro-batch (a
    * rate/kafka source's first trigger) is a no-op — the only shape
    * that crashes treeReduce; all-empty partitions still emit one
    * partial each. getNumPartitions is free, unlike an isEmpty job. */
  def update(batch: DataFrame, featuresCol: String, labelCol: String,
      weightCol: String): OnlineLogisticRegressionModel = {
    val spark = batch.sparkSession
    if (batch.rdd.getNumPartitions == 0) return this
    val row = modelData.select("coefficient", "zParam", "nParam").head()
    val coefficient = row.getAs[Vector](0).toArray.clone()
    val zParam = row.getAs[Vector](1).toArray.clone()
    val nParam = row.getAs[Vector](2).toArray.clone()
    val dim = coefficient.length
    val bc = spark.sparkContext.broadcast(Vectors.dense(coefficient))

    // distributed gradient: Σ (σ(w·x) − y)·x and per-dimension weight
    // sums (the reference adds 1.0 per dense row, `weight` per sparse
    // active index), merged with one treeReduce
    val (grad, wsum) = batch
      .select(col(featuresCol), col(labelCol).cast("double"), col(weightCol).cast("double"))
      .rdd
      .mapPartitions { it =>
        val g = new Array[Double](dim)
        val ws = new Array[Double](dim)
        it.foreach { r =>
          val vec = r.getAs[Vector](0)
          val label = r.getDouble(1)
          val weight = r.getDouble(2)
          val p = 1.0 / (1.0 + math.exp(-graft.linalg.BLAS.dot(bc.value, vec)))
          vec match {
            case d: DenseVector =>
              var i = 0
              while (i < dim) { g(i) += (p - label) * d.values(i); ws(i) += 1.0; i += 1 }
            case s: SparseVector =>
              var i = 0
              while (i < s.indices.length) {
                val idx = s.indices(i)
                g(idx) += (p - label) * s.values(i)
                ws(idx) += weight
                i += 1
              }
          }
        }
        Iterator.single((g, ws))
      }
      .treeReduce { case ((g1, w1), (g2, w2)) =>
        var i = 0
        while (i < dim) { g1(i) += g2(i); w1(i) += w2(i); i += 1 }
        (g1, w1)
      }
    bc.destroy()

    // all partitions empty → zero gradient and weight: no-op rather
    // than pushing a zero "observation" through the FTRL state
    if (wsum.forall(_ == 0.0) && grad.forall(_ == 0.0)) return this

    val l1 = getElasticNet * getReg
    val l2 = (1.0 - getElasticNet) * getReg
    var i = 0
    while (i < dim) {
      val g = if (wsum(i) != 0.0) grad(i) / wsum(i) else grad(i)
      val sigma = (math.sqrt(nParam(i) + g * g) - math.sqrt(nParam(i))) / getAlpha
      zParam(i) += g - sigma * coefficient(i)
      nParam(i) += g * g
      coefficient(i) =
        if (math.abs(zParam(i)) <= l1) 0.0
        else ((if (zParam(i) < 0) -1.0 else 1.0) * l1 - zParam(i)) /
          ((getBeta + math.sqrt(nParam(i))) / getAlpha + l2)
      i += 1
    }

    import spark.implicits._
    val next = Seq((coefficient, zParam, nParam)).toDF("c", "z", "n")
      .select(org.apache.spark.ml.functions.array_to_vector(col("c")).as("coefficient"),
        org.apache.spark.ml.functions.array_to_vector(col("z")).as("zParam"),
        org.apache.spark.ml.functions.array_to_vector(col("n")).as("nParam"))
    val m = new OnlineLogisticRegressionModel().setModelData(next)
    copyParamsTo(m)
    m
  }

  override def transform(inputs: DataFrame*): Array[DataFrame] = {
    require(inputs.size == 1)
    val coeff = modelData.select("coefficient").head().getAs[Vector](0)
    val bc = inputs.head.sparkSession.sparkContext.broadcast(coeff)
    val raw = udf { v: Vector =>
      if (v == null) null
      else {
        val margin = graft.linalg.BLAS.dot(bc.value, v)
        val p = 1.0 / (1.0 + math.exp(-margin))
        Vectors.dense(1.0 - p, p): Vector
      }
    }
    val out = inputs.head
      .withColumn(getRawPredictionCol, raw(col(getFeaturesCol)))
      .withColumn(getPredictionCol,
        when(element_at(org.apache.spark.ml.functions.vector_to_array(col(getRawPredictionCol)), 2)
          >= 0.5, 1.0).otherwise(0.0))
    Array(out)
  }
}
object OnlineLogisticRegressionModel extends StageLoader[OnlineLogisticRegressionModel] {
  /** Zero-initialized FTRL state for `dim` features. */
  def zeroInit(spark: SparkSession, dim: Int): DataFrame = {
    import spark.implicits._
    Seq((new Array[Double](dim), new Array[Double](dim), new Array[Double](dim)))
      .toDF("c", "z", "n")
      .select(org.apache.spark.ml.functions.array_to_vector(col("c")).as("coefficient"),
        org.apache.spark.ml.functions.array_to_vector(col("z")).as("zParam"),
        org.apache.spark.ml.functions.array_to_vector(col("n")).as("nParam"))
  }

  def load(spark: SparkSession, path: String): OnlineLogisticRegressionModel = {
    val m = ReadWrite.applyParams(new OnlineLogisticRegressionModel, path)
    m.setModelData(ReadWrite.loadModelData(spark, path))
  }
}
