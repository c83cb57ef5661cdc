package graft.streaming

import org.apache.spark.ml.linalg.{Vector, Vectors}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.api._
import graft.linalg.{DistanceMeasure, VectorWithNorm}
import graft.param._
import graft.util.ReadWrite

/**
 * Mini-batch k-means with exponential forgetting, fed either by a
 * bounded input split into count batches or by Structured Streaming
 * micro-batches (call [[OnlineKMeansModel.update]] from foreachBatch).
 *
 * Per batch, starting from the previous centroids:
 *   assign each point to its nearest centroid;
 *   w_i ← decayFactor · w_i + count_i;
 *   c_i ← (1 − λ) · c_i + λ · mean_i  with λ = count_i / w_i.
 * Reference: clustering/kmeans/OnlineKMeans.java:86 (iteration),
 * :295-325 (decay update; the reference splits the decay across
 * parallel subtasks then weight-averages — the single-model update
 * above is that computation's net effect for a whole batch).
 *
 * Scale shape per batch: broadcast centroids → mapPartitions partial
 * (sum, count) per cluster → treeReduce; driver state is O(k·dim).
 */
class OnlineKMeans extends Estimator[OnlineKMeans, OnlineKMeansModel]
    with HasFeaturesCol[OnlineKMeans] with HasPredictionCol[OnlineKMeans]
    with HasDistanceMeasure[OnlineKMeans] with HasGlobalBatchSize[OnlineKMeans]
    with HasSeed[OnlineKMeans] {

  final val k: Param[Int] = param[Int]("k", "The max number of clusters.", 2, ParamValidators.gt(1))
  final val decayFactor: Param[Double] =
    param[Double]("decayFactor", "The forgetfulness of the previous centroids.", 0.0,
      ParamValidators.gtEq(0))
  def setK(v: Int): OnlineKMeans = set(k, v)
  def setDecayFactor(v: Double): OnlineKMeans = set(decayFactor, v)
  def getK: Int = get(k)
  def getDecayFactor: Double = get(decayFactor)

  private var initialModel: Option[DataFrame] = None
  def setInitialModelData(df: DataFrame): OnlineKMeans = { initialModel = Some(df); this }

  /**
   * Bounded-input fit: splits the input into globalBatchSize count
   * batches (trailing partial batch dropped, like the reference's
   * batch generator) and folds the update; the fitted model holds the
   * final centroids.
   */
  override def fit(inputs: DataFrame*): OnlineKMeansModel = {
    require(inputs.size == 1)
    val df = inputs.head
    val spark = df.sparkSession
    val init = initialModel.getOrElse(
      sys.error("OnlineKMeans requires initial model data (setInitialModelData) — " +
        "use OnlineKMeansModel.randomInit for a seeded random start"))
    var model = new OnlineKMeansModel().setModelData(init)
    copyParamsTo(model)

    val batchSize = getGlobalBatchSize
    import spark.implicits._
    val indexed = df.select(col(getFeaturesCol)).rdd.zipWithIndex()
      .map { case (r, i) => (i / batchSize, r.getAs[Vector](0)) }
      .toDF("batch", "features")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val numBatches = indexed.count() / batchSize
    var b = 0L
    while (b < numBatches) {
      model = model.update(indexed.where(col("batch") === b).select("features"), getFeaturesCol)
      b += 1
    }
    indexed.unpersist(blocking = false)
    model
  }
}
object OnlineKMeans extends StageLoader[OnlineKMeans] {
  def load(spark: SparkSession, path: String): OnlineKMeans =
    ReadWrite.applyParams(new OnlineKMeans, path)
}

/**
 * Current model of [[OnlineKMeans]]: (centroidId, centroid, weight)
 * rows. `update` consumes one batch and returns the advanced model —
 * the hook to call from a Structured Streaming foreachBatch.
 */
class OnlineKMeansModel extends Model[OnlineKMeansModel]
    with HasFeaturesCol[OnlineKMeansModel] with HasPredictionCol[OnlineKMeansModel]
    with HasDistanceMeasure[OnlineKMeansModel] {

  final val decayFactor: Param[Double] =
    param[Double]("decayFactor", "The forgetfulness of the previous centroids.", 0.0,
      ParamValidators.gtEq(0))
  def getDecayFactor: Double = get(decayFactor)
  def setDecayFactor(v: Double): OnlineKMeansModel = set(decayFactor, v)

  private var modelData: DataFrame = _
  override def setModelData(data: DataFrame*): OnlineKMeansModel = { modelData = data.head; this }
  override def getModelData: Array[DataFrame] = Array(modelData)

  /** One mini-batch step; returns the model holding the new centroids.
    * A ZERO-PARTITION micro-batch (a rate/kafka source's first trigger)
    * is a no-op — that is the only shape that crashes treeReduce, since
    * mapPartitions emits one partial per partition even when all
    * partitions are empty. Checking getNumPartitions is free; an
    * isEmpty check here would cost one extra Spark job per mini-batch
    * in the bounded fit loop. */
  def update(batch: DataFrame, featuresCol: String = getFeaturesCol): OnlineKMeansModel = {
    val spark = batch.sparkSession
    if (batch.rdd.getNumPartitions == 0) return this
    val measure = DistanceMeasure(getDistanceMeasure)
    val current = modelData.select("centroidId", "centroid", "weight").collect()
      .sortBy(_.getInt(0))
      .map(r => (r.getAs[Vector](1), r.getDouble(2)))
    val centroids = current.map(c => VectorWithNorm(c._1))
    val weights = current.map(_._2)
    val kk = centroids.length
    val dim = centroids.head.vector.size
    val bc = spark.sparkContext.broadcast(centroids)

    // one pass: per-cluster (sum, count) partials merged with treeReduce
    val (sums, counts) = batch.select(col(featuresCol)).rdd
      .mapPartitions { it =>
        val localSums = Array.fill(kk)(new Array[Double](dim))
        val localCounts = new Array[Long](kk)
        it.foreach { r =>
          val v = r.getAs[Vector](0)
          val cid = bc.value.zipWithIndex.minBy { case (c, _) =>
            measure.distance(c, VectorWithNorm(v))
          }._2
          localCounts(cid) += 1
          val s = localSums(cid)
          v.foreachActive((i, x) => s(i) += x)
        }
        Iterator.single((localSums, localCounts))
      }
      .treeReduce { case ((s1, c1), (s2, c2)) =>
        var i = 0
        while (i < kk) {
          var j = 0
          while (j < dim) { s1(i)(j) += s2(i)(j); j += 1 }
          c1(i) += c2(i)
          i += 1
        }
        (s1, c1)
      }
    bc.destroy()

    // a batch with rows in no cluster (all partitions empty) is a
    // no-op: the reference's batches are never empty, and decaying
    // weights on nothing would drift the model on idle streams
    if (counts.forall(_ == 0L)) return this

    val newCentroids = new Array[Vector](kk)
    val newWeights = new Array[Double](kk)
    var i = 0
    while (i < kk) {
      newWeights(i) = getDecayFactor * weights(i)
      if (counts(i) == 0) {
        newCentroids(i) = centroids(i).vector
      } else {
        newWeights(i) += counts(i)
        val lambda = counts(i) / newWeights(i)
        val old = centroids(i).vector.toArray
        val out = new Array[Double](dim)
        var j = 0
        while (j < dim) {
          out(j) = (1.0 - lambda) * old(j) + (lambda / counts(i)) * sums(i)(j)
          j += 1
        }
        newCentroids(i) = Vectors.dense(out)
      }
      i += 1
    }
    import spark.implicits._
    val next = newCentroids.zip(newWeights).zipWithIndex
      .map { case ((c, w), id) => (id, c.toArray, w) }.toSeq
      .toDF("centroidId", "arr", "weight")
      .select(col("centroidId"),
        org.apache.spark.ml.functions.array_to_vector(col("arr")).as("centroid"),
        col("weight"))
    val m = new OnlineKMeansModel().setModelData(next)
    copyParamsTo(m)
    m
  }

  override def transform(inputs: DataFrame*): Array[DataFrame] = {
    require(inputs.size == 1)
    val measure = DistanceMeasure(getDistanceMeasure)
    val centroids = modelData.select("centroidId", "centroid").collect()
      .sortBy(_.getInt(0)).map(r => VectorWithNorm(r.getAs[Vector](1)))
    val bc = inputs.head.sparkSession.sparkContext.broadcast(centroids)
    val predict = udf { v: Vector =>
      if (v == null) null
      else java.lang.Integer.valueOf(measure.findClosest(bc.value, VectorWithNorm(v)))
    }
    Array(inputs.head.withColumn(getPredictionCol, predict(col(getFeaturesCol))))
  }
}
object OnlineKMeansModel extends StageLoader[OnlineKMeansModel] {
  /** Seeded random initial model (uniform [0,1) per coordinate, like
    * the reference KMeansModelData.generateRandomModelData). */
  def randomInit(spark: SparkSession, k: Int, dim: Int, weight: Double, seed: Long): DataFrame = {
    val rnd = new java.util.Random(seed)
    import spark.implicits._
    (0 until k).map { i =>
      (i, Array.fill(dim)(rnd.nextDouble()), weight)
    }.toDF("centroidId", "arr", "weight")
      .select(col("centroidId"),
        org.apache.spark.ml.functions.array_to_vector(col("arr")).as("centroid"),
        col("weight"))
  }

  def load(spark: SparkSession, path: String): OnlineKMeansModel = {
    val m = ReadWrite.applyParams(new OnlineKMeansModel, path)
    m.setModelData(ReadWrite.loadModelData(spark, path))
  }
}
