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
