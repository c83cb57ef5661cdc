package graft.benchmark

import org.apache.spark.ml.linalg.{Vector, Vectors}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Synthetic workload generators reproducing the reference benchmark
 * inputs (flink-ml-benchmark datagenerator/common: DenseVectorGenerator,
 * LabeledPointWithWeightGenerator, RandomStringGenerator — uniform
 * [0, 1) doubles, integer-arity categories, indexed string pools).
 *
 * Generation is partition-parallel and seed-deterministic: each
 * partition draws from java.util.Random(seed + partitionId), so a
 * 1000-executor cluster generates a 10⁹-row workload with no driver
 * involvement and no shuffle.
 */
object DataGenerators {

  /** numValues rows of a dense `vec` column with uniform [0,1) entries. */
  def denseVectors(spark: SparkSession, numValues: Long, vectorDim: Int, seed: Long,
      numPartitions: Int = 32): DataFrame = {
    import spark.implicits._
    spark.range(0, numValues, 1, numPartitions).rdd
      .mapPartitionsWithIndex { (pid, it) =>
        val rnd = new java.util.Random(seed + pid)
        it.map { _ =>
          val values = Array.fill(vectorDim)(rnd.nextDouble())
          Tuple1(Vectors.dense(values): Vector)
        }
      }.toDF("vec")
  }

  /** (features, label, weight) rows: integer-arity categorical values
    * when arity > 0, continuous uniform [0,1) when arity == 0 —
    * reference LabeledPointWithWeightGenerator semantics. */
  def labeledPoints(spark: SparkSession, numValues: Long, vectorDim: Int,
      featureArity: Int, labelArity: Int, seed: Long,
      numPartitions: Int = 32): DataFrame = {
    import spark.implicits._
    spark.range(0, numValues, 1, numPartitions).rdd
      .mapPartitionsWithIndex { (pid, it) =>
        val rnd = new java.util.Random(seed + pid)
        def draw(arity: Int): Double =
          if (arity > 0) rnd.nextInt(arity).toDouble else rnd.nextDouble()
        it.map { _ =>
          val features = Array.fill(vectorDim)(draw(featureArity))
          (Vectors.dense(features): Vector, draw(labelArity), rnd.nextDouble())
        }
      }.toDF("features", "label", "weight")
  }

  /** numValues rows of a `str` column drawn from numDistinct values. */
  def randomStrings(spark: SparkSession, numValues: Long, numDistinct: Int, seed: Long,
      numPartitions: Int = 32): DataFrame = {
    import spark.implicits._
    spark.range(0, numValues, 1, numPartitions).rdd
      .mapPartitionsWithIndex { (pid, it) =>
        val rnd = new java.util.Random(seed + pid)
        it.map(_ => Tuple1(s"str_${rnd.nextInt(numDistinct)}"))
      }.toDF("str")
  }

  /** numValues rows of `colNames` double columns: continuous uniform
    * [0,1) when arity == 0, else integer categories in [0, arity)
    * (reference DoubleGenerator semantics incl. the ARITY param). */
  def doubles(spark: SparkSession, numValues: Long, colNames: Seq[String], arity: Int,
      seed: Long, numPartitions: Int = 32): DataFrame = {
    val rdd = spark.range(0, numValues, 1, numPartitions).rdd
      .mapPartitionsWithIndex { (pid, it) =>
        val rnd = new java.util.Random(seed + pid)
        def draw(): Double = if (arity > 0) rnd.nextInt(arity).toDouble else rnd.nextDouble()
        it.map(_ => org.apache.spark.sql.Row.fromSeq(colNames.map(_ => draw())))
      }
    val schema = org.apache.spark.sql.types.StructType(colNames.map(c =>
      org.apache.spark.sql.types.StructField(c, org.apache.spark.sql.types.DoubleType)))
    spark.createDataFrame(rdd, schema)
  }

  /** numValues rows of a string-array column with arraySize elements
    * drawn from numDistinct integer-named values (reference
    * RandomStringArrayGenerator). */
  def randomStringArrays(spark: SparkSession, numValues: Long, arraySize: Int,
      numDistinct: Int, seed: Long, numPartitions: Int = 32): DataFrame = {
    import spark.implicits._
    spark.range(0, numValues, 1, numPartitions).rdd
      .mapPartitionsWithIndex { (pid, it) =>
        val rnd = new java.util.Random(seed + pid)
        it.map(_ => Tuple1(Array.fill(arraySize)(Integer.toString(rnd.nextInt(numDistinct)))))
      }.toDF("arr")
  }

  /** One KMeans model-data table of `arraySize` random centroids
    * (reference KMeansModelDataGenerator), shaped for our
    * KMeansModel.setModelData: (centroidId, centroid). */
  def kmeansModelData(spark: SparkSession, arraySize: Int, vectorDim: Int,
      seed: Long): DataFrame = {
    import spark.implicits._
    val rnd = new java.util.Random(seed)
    val rows = (0 until arraySize).map { i =>
      (i, Vectors.dense(Array.fill(vectorDim)(rnd.nextDouble())): Vector)
    }
    spark.createDataFrame(rows).toDF("centroidId", "centroid")
  }

  /** numValues rows of whitespace-joined token sentences. */
  def randomSentences(spark: SparkSession, numValues: Long, numDistinctTokens: Int,
      tokensPerRow: Int, seed: Long, numPartitions: Int = 32): DataFrame = {
    import spark.implicits._
    spark.range(0, numValues, 1, numPartitions).rdd
      .mapPartitionsWithIndex { (pid, it) =>
        val rnd = new java.util.Random(seed + pid)
        it.map { _ =>
          Tuple1(Array.fill(tokensPerRow)(s"tok${rnd.nextInt(numDistinctTokens)}").mkString(" "))
        }
      }.toDF("text")
  }
}
