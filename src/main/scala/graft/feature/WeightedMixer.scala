package graft.feature

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.api.{AlgoOperator, StageLoader}
import graft.param._
import graft.util.ReadWrite

/**
 * Deterministic per-stratum sampling rates for dataset mixing: keep a
 * row iff its md5(id ⊕ seed) key falls under the threshold of ITS
 * stratum's fraction — "sample 100% of wiki, 30% of web, 5% of logs"
 * as one pass. The per-source counterpart of [[StratifiedSampler]]'s
 * single global fraction, sharing its hash so mixes compose with
 * fraction sampling and caps (same key ⇒ nested fractions select
 * nested row sets — lowering a source's rate always selects a subset).
 *
 * Strata absent from the configured (key, fraction) pairs keep
 * `defaultFraction` (1.0 = pass through, 0.0 = drop).
 *
 * Scale shape: the whole operator is one codegen'd filter over a CASE
 * expression on the stratum column — no shuffle, no RNG state, no
 * partition-order dependence; selection is a pure function of
 * (id, seed, stratum), reproducible across cluster sizes and reruns.
 *
 * No reference counterpart — beyond-reference LLM-data-pipeline tier.
 */
class WeightedMixer extends AlgoOperator[WeightedMixer]
    with HasSeed[WeightedMixer] {

  final val idCol: Param[String] =
    param[String]("idCol", "Unique row id column; (id, seed) fully determine selection.", "id")
  def getIdCol: String = get(idCol)
  def setIdCol(v: String): WeightedMixer = set(idCol, v)

  final val stratumCol: Param[String] =
    param[String]("stratumCol", "Column naming each row's stratum (e.g. source).", "source")
  def getStratumCol: String = get(stratumCol)
  def setStratumCol(v: String): WeightedMixer = set(stratumCol, v)

  final val strataKeys: Param[Array[String]] =
    paramNoDefault[Array[String]]("strataKeys",
      "Stratum values, parallel to strataFractions.", ParamValidators.nonEmptyArray)
  def getStrataKeys: Array[String] = get(strataKeys)

  final val strataFractions: Param[Array[Double]] =
    paramNoDefault[Array[Double]]("strataFractions",
      "Sampling rate in [0, 1] per stratum, parallel to strataKeys.",
      (a: Array[Double]) => a != null && a.forall(f => f >= 0.0 && f <= 1.0))
  def getStrataFractions: Array[Double] = get(strataFractions)

  def setWeights(pairs: (String, Double)*): WeightedMixer = {
    set(strataKeys, pairs.map(_._1).toArray)
    set(strataFractions, pairs.map(_._2).toArray)
  }

  final val defaultFraction: Param[Double] =
    param[Double]("defaultFraction",
      "Rate for strata not listed in strataKeys (1.0 keeps, 0.0 drops).",
      1.0, ParamValidators.inRange(0, 1))
  def getDefaultFraction: Double = get(defaultFraction)
  def setDefaultFraction(v: Double): WeightedMixer = set(defaultFraction, v)

  override def transform(inputs: DataFrame*): Array[DataFrame] = {
    require(inputs.size == 1)
    val keys = getStrataKeys
    val fracs = getStrataFractions
    require(keys.length == fracs.length,
      s"strataKeys (${keys.length}) and strataFractions (${fracs.length}) must be parallel")
    val key = StratifiedSampler.hashKey(col(getIdCol), getSeed)
    // md5 hex < threshold ⇔ 128-bit value < fraction·2¹²⁸; fraction
    // 1.0 short-circuits to true (its threshold would need 33 digits)
    def keep(f: Double): Column =
      if (f >= 1.0) lit(true)
      else if (f <= 0.0) lit(false)
      else key < lit(StratifiedSampler.fractionThreshold(f))
    val cond = keys.zip(fracs).foldRight(keep(getDefaultFraction)) {
      case ((k, f), rest) => when(col(getStratumCol) === k, keep(f)).otherwise(rest)
    }
    Array(inputs.head.where(cond))
  }
}
object WeightedMixer extends StageLoader[WeightedMixer] {
  def load(spark: SparkSession, path: String): WeightedMixer =
    ReadWrite.applyParams(new WeightedMixer, path)
}
