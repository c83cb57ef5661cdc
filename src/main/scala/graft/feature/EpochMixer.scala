package graft.feature

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.api.{AlgoOperator, StageLoader}
import graft.param._
import graft.util.ReadWrite

/**
 * Dataset mixing with UPSAMPLING: per-stratum weights may exceed 1 —
 * every row is emitted ⌊w⌋ times and one further time iff its
 * md5(id ⊕ seed) key falls under the fractional remainder, so a
 * stratum with weight 2.3 contributes each row 2 times plus a
 * deterministic 30% third copy ("3 epochs of wiki, 0.4 epochs of
 * web" — the published-recipe dial for oversampling rare high-quality
 * sources, e.g. the Llama/GPT-3 data-mixture tables). The 0-based
 * `epochCol` distinguishes copies so a downstream
 * [[DeterministicShuffler]] spreads them across shards.
 *
 * Shares [[StratifiedSampler.hashKey]] with [[WeightedMixer]] /
 * [[StratifiedSampler]]: for w ≤ 1 this operator selects EXACTLY
 * WeightedMixer's row set (one copy, same keys kept), so mixes
 * compose — raising a weight past 1 never changes which base rows
 * appear, only how often.
 *
 * Scale shape: one codegen'd projection computing the copy count from
 * a CASE expression, then a generator explode — no shuffle, no RNG
 * state, reproducible under any partitioning. Output size is
 * Σ stratum-rows · w, exactly, ± the hash fraction's binomial noise.
 *
 * No reference counterpart — beyond-reference LLM-data-pipeline tier.
 */
class EpochMixer extends AlgoOperator[EpochMixer] with HasSeed[EpochMixer] {

  final val idCol: Param[String] =
    param[String]("idCol", "Unique row id column; (id, seed) fully determine the copy count.", "id")
  def getIdCol: String = get(idCol)
  def setIdCol(v: String): EpochMixer = set(idCol, v)

  final val stratumCol: Param[String] =
    param[String]("stratumCol", "Column naming each row's stratum (e.g. source).", "source")
  def getStratumCol: String = get(stratumCol)
  def setStratumCol(v: String): EpochMixer = set(stratumCol, v)

  final val strataKeys: Param[Array[String]] =
    paramNoDefault[Array[String]]("strataKeys",
      "Stratum values, parallel to strataWeights.", ParamValidators.nonEmptyArray)
  def getStrataKeys: Array[String] = get(strataKeys)

  final val strataWeights: Param[Array[Double]] =
    paramNoDefault[Array[Double]]("strataWeights",
      "Epochs per stratum (>= 0; 2.3 = two full copies + a 30% third), parallel to strataKeys.",
      (a: Array[Double]) => a != null && a.forall(w => w >= 0.0 && w <= 1000.0))
  def getStrataWeights: Array[Double] = get(strataWeights)

  def setWeights(pairs: (String, Double)*): EpochMixer = {
    set(strataKeys, pairs.map(_._1).toArray)
    set(strataWeights, pairs.map(_._2).toArray)
  }

  // tuple-free setters (the Python wrapper can pass lists, not tuples)
  def setStrataKeys(v: String*): EpochMixer = set(strataKeys, v.toArray)
  def setStrataWeights(v: Double*): EpochMixer = set(strataWeights, v.toArray)

  final val defaultWeight: Param[Double] =
    param[Double]("defaultWeight", "Epochs for strata not listed in strataKeys.",
      1.0, (w: Double) => w >= 0.0 && w <= 1000.0)
  def getDefaultWeight: Double = get(defaultWeight)
  def setDefaultWeight(v: Double): EpochMixer = set(defaultWeight, v)

  final val epochCol: Param[String] =
    param[String]("epochCol", "Output column holding the 0-based copy ordinal.", "epoch")
  def getEpochCol: String = get(epochCol)
  def setEpochCol(v: String): EpochMixer = set(epochCol, v)

  override def transform(inputs: DataFrame*): Array[DataFrame] = {
    require(inputs.size == 1)
    val keys = getStrataKeys
    val weights = getStrataWeights
    require(keys.length == weights.length,
      s"strataKeys (${keys.length}) and strataWeights (${weights.length}) must be parallel")
    val key = StratifiedSampler.hashKey(col(getIdCol), getSeed)

    // copies(w) = floor(w) + [key < threshold(frac(w))]
    def copies(w: Double): Column = {
      val whole = math.floor(w).toLong
      val frac = w - whole
      if (frac <= 0.0) lit(whole)
      else lit(whole) +
        when(key < lit(StratifiedSampler.fractionThreshold(frac)), 1L).otherwise(0L)
    }
    val n = keys.zip(weights).foldRight(copies(getDefaultWeight)) {
      case ((k, w), rest) => when(col(getStratumCol) === k, copies(w)).otherwise(rest)
    }
    // explode of an empty array drops the row — weight 0 strata vanish
    val out = inputs.head
      .withColumn("__em_n", n)
      .withColumn(getEpochCol,
        explode(when(col("__em_n") > 0, sequence(lit(0L), col("__em_n") - 1))
          .otherwise(array().cast("array<bigint>"))))
      .drop("__em_n")
    Array(out)
  }
}
object EpochMixer extends StageLoader[EpochMixer] {
  def load(spark: SparkSession, path: String): EpochMixer =
    ReadWrite.applyParams(new EpochMixer, path)
}
