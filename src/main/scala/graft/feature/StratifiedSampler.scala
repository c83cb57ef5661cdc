package graft.feature

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.api.{AlgoOperator, StageLoader}
import graft.param._
import graft.util.ReadWrite

/**
 * Deterministic, reproducible sampling for training-data mixes — the
 * sampling counterpart of [[RandomSplitter]] for pipelines that must
 * select the SAME rows on every run, every cluster size, and every
 * partitioning (dataset mixing, per-language caps, decontamination
 * re-runs). Two composable modes, both pure functions of (id, seed):
 *
 *  - '''fraction''': keep a row iff md5(id ⊕ seed) < fraction · 2¹²⁸.
 *    An md5 hex string compares lexicographically like a 128-bit
 *    integer, so the filter is a single codegen'd string compare
 *    against a precomputed threshold literal — no RNG state, no
 *    partition dependence (unlike `randomSplit`, whose selection
 *    changes with the partitioning).
 *  - '''maxPerStratum''': keep each stratum's first N rows under the
 *    total order (md5 key, id). Strata at or under the cap — the
 *    overwhelming majority — bypass ranking entirely; only over-cap
 *    strata go through a salted two-phase top-N (the
 *    [[graft.recommendation.Swing]] cap pattern) so no task ever
 *    sorts one hot stratum's full row set: phase 1 ranks within
 *    (stratum, salt) keeping N per salt, phase 2 re-ranks the
 *    ≤ Salts·N survivors. The union of per-salt top-Ns contains the
 *    global top-N, so the selected set is identical to a single-phase
 *    global rank.
 *
 * With both set, the fraction filter applies first (the cap sees only
 * surviving rows). `strataCols` empty = the whole table is one
 * stratum; the salted two-phase cap makes even that single hot key
 * scale-safe.
 *
 * No reference counterpart — beyond-reference LLM-data-pipeline tier
 * (the reference's only sampling is `DataStreamUtils.sample`,
 * flink-ml-core .../datastream/DataStreamUtils.java:300, a driver-side
 * reservoir that is neither stratified nor reproducible across
 * parallelism changes).
 */
class StratifiedSampler extends AlgoOperator[StratifiedSampler]
    with HasSeed[StratifiedSampler] {

  final val idCol: Param[String] =
    param[String]("idCol", "Unique row id column; (id, seed) fully determine selection.", "id")
  def getIdCol: String = get(idCol)
  def setIdCol(v: String): StratifiedSampler = set(idCol, v)

  final val strataCols: Param[Array[String]] =
    param[Array[String]]("strataCols",
      "Columns defining the strata; empty = one global stratum.",
      Array.empty[String], (a: Array[String]) => a != null)
  def getStrataCols: Array[String] = get(strataCols)
  def setStrataCols(v: String*): StratifiedSampler = set(strataCols, v.toArray)

  final val fraction: Param[Double] =
    paramNoDefault[Double]("fraction",
      "Deterministic hash-sampling rate in (0, 1].")
  def getFraction: Double = get(fraction)
  def setFraction(v: Double): StratifiedSampler = set(fraction, v)

  final val maxPerStratum: Param[Int] =
    paramNoDefault[Int]("maxPerStratum",
      "Keep at most this many rows per stratum, lowest (md5 key, id) first.")
  def getMaxPerStratum: Int = get(maxPerStratum)
  def setMaxPerStratum(v: Int): StratifiedSampler = set(maxPerStratum, v)

  override def transform(inputs: DataFrame*): Array[DataFrame] = {
    require(inputs.size == 1, "StratifiedSampler expects exactly one input table")
    require(isSet(fraction) || isSet(maxPerStratum),
      "Set fraction and/or maxPerStratum; with neither, the sampler would be the identity.")
    if (isSet(fraction))
      require(getFraction > 0.0 && getFraction <= 1.0, s"fraction must be in (0, 1], got $getFraction")
    val df = inputs.head
    val key = StratifiedSampler.hashKey(col(getIdCol), getSeed)

    val filtered =
      if (isSet(fraction) && getFraction < 1.0)
        df.where(key < lit(StratifiedSampler.fractionThreshold(getFraction)))
      else df
    if (!isSet(maxPerStratum)) return Array(filtered)

    val n = getMaxPerStratum
    val strata: Seq[Column] =
      if (getStrataCols.isEmpty) Seq(lit(0).as("__stratum0"))
      else getStrataCols.toSeq.map(col)
    val keyed = filtered.withColumn("__ss_key", key)
      .withColumn("__ss_stratum", struct(strata: _*))

    // over-cap strata are few by definition (≤ rows/cap) → broadcast
    val hot = broadcast(keyed.groupBy("__ss_stratum").agg(count(lit(1)).as("__ss_cnt"))
      .where(col("__ss_cnt") > n))
    val flagged = keyed.join(hot, Seq("__ss_stratum"), "left")
    val under = flagged.where(col("__ss_cnt").isNull)
    val over = flagged.where(col("__ss_cnt").isNotNull)
    val order: Seq[Column] = Seq(col("__ss_key"), col(getIdCol))
    val w1 = Window.partitionBy(col("__ss_stratum"), col("__ss_salt")).orderBy(order: _*)
    val phase1 = over
      .withColumn("__ss_salt", pmod(xxhash64(col("__ss_key")), lit(StratifiedSampler.CapSalts)))
      .withColumn("__ss_rn", row_number().over(w1))
      .where(col("__ss_rn") <= n).drop("__ss_rn", "__ss_salt")
    val w2 = Window.partitionBy(col("__ss_stratum")).orderBy(order: _*)
    val phase2 = phase1.withColumn("__ss_rn", row_number().over(w2))
      .where(col("__ss_rn") <= n).drop("__ss_rn")
    Array(under.unionByName(phase2)
      .drop("__ss_key", "__ss_stratum", "__ss_cnt"))
  }
}

object StratifiedSampler extends StageLoader[StratifiedSampler] {
  /** Salt fan-out for the two-phase cap (see [[graft.recommendation.Swing.CapSalts]]). */
  val CapSalts = 32

  /** The selection key: md5 over "id<0x01>seed" — byte-identical in any
    * engine with md5 + concat (the DuckDB oracle uses
    * `md5(concat_ws(chr(1), CAST(id AS VARCHAR), '<seed>'))`). */
  def hashKey(id: Column, seed: Long): Column =
    md5(concat_ws("\u0001", id.cast("string"), lit(seed.toString)))

  /** 32-digit lowercase-hex literal of ⌊fraction · 16³²⌋: an md5 hex
    * string is kept iff it is lexicographically below this. */
  def fractionThreshold(fraction: Double): String = {
    val full = BigInt(16).pow(32)
    // exact java.math arithmetic: scala.BigDecimal's default DECIMAL128
    // context would round the 39-digit product
    val t = BigInt(new java.math.BigDecimal(fraction)
      .multiply(new java.math.BigDecimal(full.bigInteger)).toBigInteger)
    if (t >= full) "g" // above every hex digit → keep all
    else {
      val hex = t.toString(16)
      "0" * (32 - hex.length) + hex
    }
  }

  def load(spark: SparkSession, path: String): StratifiedSampler =
    ReadWrite.applyParams(new StratifiedSampler, path)
}
