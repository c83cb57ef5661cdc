package graft.feature

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.api.{AlgoOperator, StageLoader}
import graft.param._
import graft.util.ReadWrite

/**
 * RandomSplitter: split one table into N tables by weights — a genuinely
 * multi-output operator (the reference uses side-outputs;
 * feature/randomsplitter/RandomSplitter.java:46-76). Spark's
 * `randomSplit` does the same with per-partition deterministic sampling,
 * no shuffle and no data movement.
 */
class RandomSplitter extends AlgoOperator[RandomSplitter] with HasSeed[RandomSplitter] {

  final val weights: Param[Array[Double]] =
    param[Array[Double]]("weights", "Relative weights of the output tables",
      Array(1.0, 1.0), (a: Array[Double]) => a != null && a.length >= 2 && a.forall(_ > 0))
  def setWeights(v: Double*): RandomSplitter = set(weights, v.toArray)
  def getWeights: Array[Double] = get(weights)

  override def transform(inputs: DataFrame*): Array[DataFrame] = {
    require(inputs.size == 1, "RandomSplitter expects exactly one input table")
    inputs.head.randomSplit(getWeights, getSeed)
  }
}
object RandomSplitter extends StageLoader[RandomSplitter] {
  def load(spark: SparkSession, path: String): RandomSplitter =
    ReadWrite.applyParams(new RandomSplitter, path)
}
