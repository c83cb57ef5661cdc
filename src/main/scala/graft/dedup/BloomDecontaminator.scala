package graft.dedup

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.api.{AlgoOperator, StageLoader}
import graft.param._
import graft.util.ReadWrite

/**
 * Bloom-filter decontamination: the broadcast-membership variant of
 * [[Decontaminator]]. The eval set's distinct n-grams are folded into
 * one Bloom filter (built distributively by Spark's
 * `DataFrameStatFunctions.bloomFilter` — a treeAggregate of bitsets,
 * the eval grams never shuffle against the corpus), the filter is
 * broadcast, and every training document counts its distinct grams
 * that MIGHT be in the eval set with a pure in-row probe.
 *
 * Contract vs the exact join: Bloom filters have NO false negatives,
 * so every contaminated document is flagged (recall 1 by
 * construction); false positives OVERCOUNT matches at rate ≤ `fpp`
 * per probed gram — the safe direction for decontamination (you drop
 * a clean doc with probability ~fpp·grams, you never keep a
 * contaminated one). The filter content is a pure function of the
 * eval gram SET (insertion is bitwise OR — order-independent), so
 * results are deterministic run to run.
 *
 * Scale shape (100 TB design): the corpus side is ONE scan with zero
 * shuffle — this is the variant you run when the training corpus is
 * 100 TB and the eval suite is megabytes. Filter size ≈ n·ln(1/fpp)/
 * ln²2 bits: 1M grams at fpp 1e-6 ≈ 3.4 MB broadcast. The exact
 * [[Decontaminator]] stays the right tool when you need the true
 * match count or the eval side is too large to broadcast.
 *
 * No reference counterpart — beyond-reference LLM-data-pipeline tier.
 */
class BloomDecontaminator extends AlgoOperator[BloomDecontaminator]
    with HasInputCol[BloomDecontaminator] {

  final val idCol: Param[String] =
    param[String]("idCol", "Unique training-document id column.", "id")
  def getIdCol: String = get(idCol)
  def setIdCol(v: String): BloomDecontaminator = set(idCol, v)

  final val minMatches: Param[Int] =
    param[Int]("minMatches", "Distinct might-contain n-grams that mark a doc contaminated.",
      1, ParamValidators.gt(0))
  def getMinMatches: Int = get(minMatches)
  def setMinMatches(v: Int): BloomDecontaminator = set(minMatches, v)

  final val fpp: Param[Double] =
    param[Double]("fpp", "Bloom filter false-positive probability per probed gram.",
      1e-6, (v: Double) => v > 0 && v < 1)
  def getFpp: Double = get(fpp)
  def setFpp(v: Double): BloomDecontaminator = set(fpp, v)

  final val expectedItems: Param[Long] =
    param[Long]("expectedItems", "Expected distinct eval grams (filter sizing); 0 counts " +
      "the eval side first.", 0L, ParamValidators.gtEq(0L))
  def getExpectedItems: Long = get(expectedItems)
  def setExpectedItems(v: Long): BloomDecontaminator = set(expectedItems, v)

  final val outputCol: Param[String] =
    param[String]("outputCol", "Output column flagging contaminated docs.", "contaminated")
  def getOutputCol: String = get(outputCol)
  def setOutputCol(v: String): BloomDecontaminator = set(outputCol, v)

  final val matchCountCol: Param[String] =
    param[String]("matchCountCol", "Output column counting distinct might-contain n-grams.",
      "matched_ngrams")
  def getMatchCountCol: String = get(matchCountCol)
  def setMatchCountCol(v: String): BloomDecontaminator = set(matchCountCol, v)

  /** transform(train, eval): flag train docs sharing n-grams with eval. */
  override def transform(inputs: DataFrame*): Array[DataFrame] = {
    require(inputs.size == 2, "BloomDecontaminator expects (train, eval) input tables")
    val (train, eval) = (inputs(0), inputs(1))
    val spark = train.sparkSession
    val evalGrams = eval.select(explode(col(getInputCol)).as("__bd_g0"))
      .select(col("__bd_g0").cast("string").as("__bd_g"))
    val n = if (getExpectedItems > 0) getExpectedItems
      else math.max(evalGrams.distinct().count(), 1L)
    val bf = evalGrams.stat.bloomFilter("__bd_g", n, getFpp)
    val bc = spark.sparkContext.broadcast(bf)
    val countHits = udf { grams: Seq[String] =>
      if (grams == null) 0L
      else grams.distinct.count(g => g != null && bc.value.mightContainString(g)).toLong
    }
    Array(train
      .withColumn(getMatchCountCol, countHits(col(getInputCol)))
      .withColumn(getOutputCol, col(getMatchCountCol) >= getMinMatches))
  }
}
object BloomDecontaminator extends StageLoader[BloomDecontaminator] {
  def load(spark: SparkSession, path: String): BloomDecontaminator =
    ReadWrite.applyParams(new BloomDecontaminator, path)
}
