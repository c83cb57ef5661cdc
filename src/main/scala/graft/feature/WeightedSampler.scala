package graft.feature

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.api.{AlgoOperator, StageLoader}
import graft.param._
import graft.util.ReadWrite

/**
 * Deterministic weight-proportional sampling WITHOUT replacement:
 * keep `sampleSize` rows with inclusion biased by a per-row weight
 * (quality score, importance weight, domain multiplier) — the
 * "sample 50k documents proportional to quality" curation step.
 * Efraimidis & Spiridakis 2006 (A-Res): each row gets the key
 * ln(u)/w for a uniform u, and the k LARGEST keys are the sample —
 * exactly equivalent to sequential weighted draws without
 * replacement, but embarrassingly parallel.
 *
 * u is NOT an RNG: it is the same md5(id ⊕ seed) construction as
 * [[StratifiedSampler]] (13 hex chars → 52 bits, kept under 2⁵³ so
 * the integer is EXACT in a double and any SQL engine replays the
 * key bit-for-bit). Selection is a pure function of (id, seed,
 * weight) — reproducible across cluster sizes, reruns, and engines.
 *
 * Weight semantics: weight 0 or null = never sampled (dropped before
 * ranking — a zero-weight row has inclusion probability zero by
 * definition); NEGATIVE weights raise at execution (in-row
 * raise_error, no extra validation pass over the corpus).
 *
 * Scale shape: one slim projection (id, key) feeds a per-partition
 * top-k merge (TakeOrdered — only `sampleSize` 16-byte pairs ever
 * concentrate), then the winners join back to the full rows (AQE
 * broadcasts the id list when it is small). The corpus is scanned
 * twice but never shuffled, and the wide payload never sorts.
 */
class WeightedSampler extends AlgoOperator[WeightedSampler]
    with HasSeed[WeightedSampler] {

  final val idCol: Param[String] =
    param[String]("idCol", "Unique row id column; (id, seed, weight) fully determine selection.", "id")
  def getIdCol: String = get(idCol)
  def setIdCol(v: String): WeightedSampler = set(idCol, v)

  final val weightCol: Param[String] =
    paramNoDefault[String]("weightCol",
      "Positive sampling weight column (0/null = never sampled, negative = error).")
  def getWeightCol: String = get(weightCol)
  def setWeightCol(v: String): WeightedSampler = set(weightCol, v)

  final val sampleSize: Param[Int] =
    paramNoDefault[Int]("sampleSize", "Number of rows to keep.", ParamValidators.gt(0))
  def getSampleSize: Int = get(sampleSize)
  def setSampleSize(v: Int): WeightedSampler = set(sampleSize, v)

  override def transform(inputs: DataFrame*): Array[DataFrame] = {
    require(inputs.size == 1)
    val df = inputs.head
    val id = col(getIdCol)
    val w = col(getWeightCol).cast("double")

    // 13 hex chars = 52 bits: exact as a double, so (v+1)/2^52 is the
    // same IEEE value in every engine that parses the same md5
    val v = conv(substring(StratifiedSampler.hashKey(id, getSeed), 1, 13), 16, 10)
      .cast("double")
    val u = (v + lit(1.0)) / lit(4503599627370496.0) // 2^52
    val esKey = when(w < 0.0 || isnan(w),
        raise_error(concat(lit(s"WeightedSampler: negative/NaN weight in '$getWeightCol' for id "),
          id.cast("string"))).cast("double"))
      .otherwise(log(u) / w)

    val winners = df
      .where(w.isNotNull && (w =!= 0.0))
      .select(id.as("__ws_id"), esKey.as("__ws_key"))
      .orderBy(col("__ws_key").desc, col("__ws_id"))
      .limit(getSampleSize)
      .select("__ws_id")
    Array(df.join(winners, id === col("__ws_id")).drop("__ws_id"))
  }
}

object WeightedSampler extends StageLoader[WeightedSampler] {
  def load(spark: SparkSession, path: String): WeightedSampler =
    ReadWrite.applyParams(new WeightedSampler, path)
}
