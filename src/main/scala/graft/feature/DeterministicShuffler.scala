package graft.feature

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.api.{AlgoOperator, StageLoader}
import graft.param._
import graft.util.ReadWrite

/**
 * Reproducible corpus shuffling into training shards: every row gets
 * a `shard` in [0, numShards) and a 0-based `shard_pos` under the
 * md5(id ⊕ seed) total order — the "shuffle once, train anywhere"
 * step that makes epoch order independent of cluster size, input
 * partitioning, and rerun (unlike `orderBy(rand())`, whose order
 * changes with the partitioning). Same hash as [[StratifiedSampler]] /
 * [[WeightedMixer]], so shuffling composes with sampling and mixing.
 *
 * Shard assignment divides the md5 key space into numShards equal
 * intervals, so shards are balanced in expectation and a row's shard
 * never depends on other rows. Position is the rank within the shard
 * under (key, id).
 *
 * Scale shape: one hash-partition shuffle on `shard` with an in-shard
 * sort for the rank — numShards tasks each sorting corpus/numShards
 * rows, the plan you'd use to write N shuffled training files at
 * 100 TB. No global sort, no driver state.
 *
 * No reference counterpart — beyond-reference LLM-data-pipeline tier.
 */
class DeterministicShuffler extends AlgoOperator[DeterministicShuffler]
    with HasSeed[DeterministicShuffler] {

  final val idCol: Param[String] =
    param[String]("idCol", "Unique row id column; (id, seed) fully determine the order.", "id")
  def getIdCol: String = get(idCol)
  def setIdCol(v: String): DeterministicShuffler = set(idCol, v)

  final val numShards: Param[Int] =
    param[Int]("numShards", "Number of output shards.", 8, ParamValidators.gt(0))
  def getNumShards: Int = get(numShards)
  def setNumShards(v: Int): DeterministicShuffler = set(numShards, v)

  override def transform(inputs: DataFrame*): Array[DataFrame] = {
    require(inputs.size == 1)
    val n = getNumShards
    val key = StratifiedSampler.hashKey(col(getIdCol), getSeed)
    // shard = how many of the n−1 interval thresholds the key clears —
    // a pure comparison sum, identical math in any engine that can
    // compare the md5 hex string (no hex→int parsing needed)
    val shard = (1 until n)
      .map(s => when(key >= lit(StratifiedSampler.fractionThreshold(s.toDouble / n)), 1)
        .otherwise(0))
      .foldLeft(lit(0))(_ + _)
    val w = Window.partitionBy("shard").orderBy(col("__ds_key"), col(getIdCol))
    Array(inputs.head
      .withColumn("__ds_key", key)
      .withColumn("shard", shard)
      .withColumn("shard_pos", row_number().over(w).cast("long") - 1)
      .drop("__ds_key"))
  }
}
object DeterministicShuffler extends StageLoader[DeterministicShuffler] {
  def load(spark: SparkSession, path: String): DeterministicShuffler =
    ReadWrite.applyParams(new DeterministicShuffler, path)
}
