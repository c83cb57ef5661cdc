package graft.dedup

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.api.{AlgoOperator, StageLoader}
import graft.param._
import graft.util.ReadWrite

/**
 * Benchmark decontamination: flag every training document that shares
 * at least `minMatches` distinct n-grams with ANY document of an
 * evaluation set — the standard guard against test-set leakage into
 * training corpora (the n-gram-overlap rule used by public LLM data
 * pipelines). Inputs are two tables carrying an id column and a
 * token-n-gram array column (the RegexTokenizer → NGram output that
 * the whole dedup family consumes).
 *
 * Output: the training table plus `matchCountCol` (distinct
 * contaminated n-grams in the doc) and `outputCol` (true iff
 * matchCount >= minMatches).
 *
 * Scale shape (100 TB design): both sides explode to DISTINCT
 * (id, gram) rows; candidates come from an equi-join on the gram —
 * never a doc×doc comparison — followed by one count per training
 * doc and a left join back. The eval side collapses to its distinct
 * gram set first, which is tiny relative to the corpus (an eval
 * suite, not a crawl), so AQE turns the probe into a broadcast join;
 * the plan also holds with a shuffle join when the eval set is big.
 */
class Decontaminator extends AlgoOperator[Decontaminator]
    with HasInputCol[Decontaminator] {

  final val idCol: Param[String] =
    param[String]("idCol", "Unique training-document id column.", "id")
  def getIdCol: String = get(idCol)
  def setIdCol(v: String): Decontaminator = set(idCol, v)

  final val minMatches: Param[Int] =
    param[Int]("minMatches", "Distinct shared n-grams that mark a doc contaminated.", 1,
      ParamValidators.gt(0))
  def getMinMatches: Int = get(minMatches)
  def setMinMatches(v: Int): Decontaminator = set(minMatches, v)

  final val outputCol: Param[String] =
    param[String]("outputCol", "Output column flagging contaminated docs.", "contaminated")
  def getOutputCol: String = get(outputCol)
  def setOutputCol(v: String): Decontaminator = set(outputCol, v)

  final val matchCountCol: Param[String] =
    param[String]("matchCountCol", "Output column counting distinct contaminated n-grams.", "matched_ngrams")
  def getMatchCountCol: String = get(matchCountCol)
  def setMatchCountCol(v: String): Decontaminator = set(matchCountCol, v)

  /** transform(train, eval): flag train docs sharing n-grams with eval. */
  override def transform(inputs: DataFrame*): Array[DataFrame] = {
    require(inputs.size == 2, "Decontaminator expects (train, eval) input tables")
    val (train, eval) = (inputs(0), inputs(1))
    val trainGrams = train.select(col(getIdCol).as("__dc_id"),
      explode(array_distinct(col(getInputCol))).as("__dc_g"))
    val evalGrams = eval.select(explode(col(getInputCol)).as("__dc_g")).distinct()
    // per-id distinct grams joined to distinct eval grams → count(*) IS
    // the distinct-match count, no countDistinct needed
    val counts = trainGrams.join(evalGrams, "__dc_g")
      .groupBy("__dc_id").agg(count(lit(1)).as("__dc_n"))
    val out = train.join(counts, train(getIdCol) === counts("__dc_id"), "left")
      .withColumn(getMatchCountCol, coalesce(col("__dc_n"), lit(0L)))
      .withColumn(getOutputCol, col(getMatchCountCol) >= getMinMatches)
      .drop("__dc_id", "__dc_n")
    Array(out)
  }
}
object Decontaminator extends StageLoader[Decontaminator] {
  def load(spark: SparkSession, path: String): Decontaminator =
    ReadWrite.applyParams(new Decontaminator, path)
}
