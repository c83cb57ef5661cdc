package graft.classification

import org.apache.spark.ml.linalg.{Vector, Vectors}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.api._
import graft.param._
import graft.util.ReadWrite

/**
 * Brute-force k-nearest-neighbors classifier: "fit" materializes the
 * training matrix; predict broadcasts it and runs a per-row bounded
 * top-k scan, label = majority among the k nearest by Euclidean
 * distance. Reference: classification/knn/Knn.java:61, KnnModel.java:73.
 */
class Knn extends Estimator[Knn, KnnModel]
    with HasFeaturesCol[Knn] with HasLabelCol[Knn] with HasPredictionCol[Knn] {

  final val k: Param[Int] = param[Int]("k", "Number of nearest neighbors", 5, ParamValidators.gt(0))
  def setK(v: Int): Knn = set(k, v)
  def getK: Int = get(k)

  override def fit(inputs: DataFrame*): KnnModel = {
    require(inputs.size == 1)
    val df = inputs.head
    val modelDf = df.select(
      col(getFeaturesCol).as("features"), col(getLabelCol).cast("double").as("label"))
    val m = new KnnModel().setModelData(modelDf)
    copyParamsTo(m)
    m
  }
}
object Knn extends StageLoader[Knn] {
  def load(spark: SparkSession, path: String): Knn = ReadWrite.applyParams(new Knn, path)
}

class KnnModel extends Model[KnnModel]
    with HasFeaturesCol[KnnModel] with HasPredictionCol[KnnModel] {

  final val k: Param[Int] = param[Int]("k", "Number of nearest neighbors", 5, ParamValidators.gt(0))
  def setK(v: Int): KnnModel = set(k, v)
  def getK: Int = get(k)

  private var modelData: DataFrame = _
  override def setModelData(data: DataFrame*): KnnModel = { modelData = data.head; this }
  override def getModelData: Array[DataFrame] = Array(modelData)

  override def transform(inputs: DataFrame*): Array[DataFrame] = {
    require(inputs.size == 1)
    val df = inputs.head
    // train set is O(model): collected once, broadcast with cached norms
    val train = modelData.select("features", "label").collect()
      .map(r => (r.getAs[Vector](0), r.getDouble(1)))
    val trainArr = train.map { case (v, l) =>
      (v, graft.linalg.BLAS.dot(v, v), l)
    }
    val bc = df.sparkSession.sparkContext.broadcast(trainArr)
    val kk = getK

    val predict = udf { v: Vector =>
      if (v == null) null
      else {
        val data = bc.value
        // bounded max-heap of (dist², label)
        val heap = new java.util.PriorityQueue[(Double, Double)](
          kk, (a: (Double, Double), b: (Double, Double)) => java.lang.Double.compare(b._1, a._1))
        val vNorm2 = graft.linalg.BLAS.dot(v, v)
        var i = 0
        while (i < data.length) {
          val (t, tNorm2, label) = data(i)
          val d2 = vNorm2 + tNorm2 - 2 * graft.linalg.BLAS.dot(v, t)
          if (heap.size < kk) heap.add((d2, label))
          else if (d2 < heap.peek()._1) { heap.poll(); heap.add((d2, label)) }
          i += 1
        }
        // majority vote; tie → smallest label (deterministic)
        val votes = scala.collection.mutable.HashMap.empty[Double, Int]
        heap.forEach(t => votes(t._2) = votes.getOrElse(t._2, 0) + 1)
        java.lang.Double.valueOf(votes.toSeq.minBy { case (l, c) => (-c, l) }._1)
      }
    }
    Array(df.withColumn(getPredictionCol, predict(col(getFeaturesCol))))
  }
}
object KnnModel extends StageLoader[KnnModel] {
  def load(spark: SparkSession, path: String): KnnModel = {
    val m = ReadWrite.applyParams(new KnnModel, path)
    m.setModelData(ReadWrite.loadModelData(spark, path))
  }
}
