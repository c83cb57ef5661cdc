package graft.text

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.api.{AlgoOperator, StageLoader}
import graft.param._
import graft.util.ReadWrite

/**
 * The Gopher quality rules (Rae et al. 2021, "Scaling Language Models:
 * Methods, Analysis & Insights from Training Gopher", Appendix A —
 * the MassiveWeb filter bundle reused by MassiveText, RefinedWeb and
 * most open LLM corpora): per document,
 *
 *  - word count within [`minWords`, `maxWords`];
 *  - mean word length within [`minMeanWordLen`, `maxMeanWordLen`];
 *  - symbol-to-word ratio (`#` and `…`/`...`) ≤ `maxSymbolRatio`;
 *  - fraction of lines starting with a bullet ≤ `maxBulletRatio` and
 *    fraction ending with an ellipsis ≤ `maxEllipsisLineRatio`;
 *  - fraction of words containing ≥ 1 alphabetic character ≥
 *    `minAlphaWordRatio`;
 *  - ≥ `minStopwordHits` distinct hits from the paper's 8-stopword
 *    list (the, be, to, of, and, that, have, with).
 *
 * Appends one boolean per rule (`rule_*`) plus the conjunction
 * `gopher_keep` — exposing WHICH rule fired, the practical need when
 * tuning a corpus filter. Complements [[TextQualityScorer]] (a scalar
 * score) with the published hard-rule bundle.
 *
 * Scale shape: pure in-row Column expressions over one pass — no
 * shuffle, no UDF, whole-stage codegen throughout; at 100 TB this is
 * scan-bound, exactly like the reference recipes intend.
 *
 * No reference counterpart — beyond-reference LLM-data-pipeline tier.
 */
class GopherFilter extends AlgoOperator[GopherFilter]
    with HasInputCol[GopherFilter] {

  final val minWords: Param[Int] = param[Int]("minWords", "Minimum word count.", 50)
  final val maxWords: Param[Int] = param[Int]("maxWords", "Maximum word count.", 100000)
  final val minMeanWordLen: Param[Double] =
    param[Double]("minMeanWordLen", "Minimum mean word length.", 3.0)
  final val maxMeanWordLen: Param[Double] =
    param[Double]("maxMeanWordLen", "Maximum mean word length.", 10.0)
  final val maxSymbolRatio: Param[Double] =
    param[Double]("maxSymbolRatio", "Max (# + ellipsis) per word.", 0.1)
  final val maxBulletRatio: Param[Double] =
    param[Double]("maxBulletRatio", "Max fraction of lines starting with a bullet.", 0.9)
  final val maxEllipsisLineRatio: Param[Double] =
    param[Double]("maxEllipsisLineRatio", "Max fraction of lines ending with an ellipsis.", 0.3)
  final val minAlphaWordRatio: Param[Double] =
    param[Double]("minAlphaWordRatio", "Min fraction of words containing a letter.", 0.8)
  final val minStopwordHits: Param[Int] =
    param[Int]("minStopwordHits", "Min distinct hits from the 8-stopword list.", 2)
  def setMinWords(v: Int): GopherFilter = set(minWords, v)
  def setMaxWords(v: Int): GopherFilter = set(maxWords, v)
  def setMinMeanWordLen(v: Double): GopherFilter = set(minMeanWordLen, v)
  def setMaxMeanWordLen(v: Double): GopherFilter = set(maxMeanWordLen, v)
  def setMaxSymbolRatio(v: Double): GopherFilter = set(maxSymbolRatio, v)
  def setMaxBulletRatio(v: Double): GopherFilter = set(maxBulletRatio, v)
  def setMaxEllipsisLineRatio(v: Double): GopherFilter = set(maxEllipsisLineRatio, v)
  def setMinAlphaWordRatio(v: Double): GopherFilter = set(minAlphaWordRatio, v)
  def setMinStopwordHits(v: Int): GopherFilter = set(minStopwordHits, v)
  def getMinWords: Int = get(minWords)
  def getMaxWords: Int = get(maxWords)
  def getMinMeanWordLen: Double = get(minMeanWordLen)
  def getMaxMeanWordLen: Double = get(maxMeanWordLen)
  def getMaxSymbolRatio: Double = get(maxSymbolRatio)
  def getMaxBulletRatio: Double = get(maxBulletRatio)
  def getMaxEllipsisLineRatio: Double = get(maxEllipsisLineRatio)
  def getMinAlphaWordRatio: Double = get(minAlphaWordRatio)
  def getMinStopwordHits: Int = get(minStopwordHits)

  override def transform(inputs: DataFrame*): Array[DataFrame] = {
    require(inputs.size == 1)
    val df = inputs.head
    val text = col(getInputCol)

    // whitespace words (empty text -> empty array, matching NgramLm)
    val words = when(length(trim(text)) === 0, array().cast("array<string>"))
      .otherwise(split(trim(text), "\\s+"))
    val nWords = size(words)
    val meanLen = when(nWords > 0,
      aggregate(words, lit(0L), (acc: Column, w: Column) => acc + length(w)).cast("double")
        / nWords)
    // symbols: '#' occurrences + ellipsis occurrences ('…' or '...'),
    // counted by length difference after removal
    val hashes = length(text) - length(regexp_replace(text, "#", ""))
    val ellipsisCount =
      ((length(text) - length(regexp_replace(text, "\\.\\.\\.", ""))) / 3) +
        (length(text) - length(regexp_replace(text, "…", "")))
    val symbolRatio = when(nWords > 0, (hashes + ellipsisCount).cast("double") / nWords)

    val lines = split(text, "\n")
    val nLines = size(lines)
    val bulletLines = size(filter(lines, l => trim(l).rlike("^[-*•‣◦]")))
    val ellipsisLines = size(filter(lines, l => trim(l).rlike("(\\.\\.\\.|…)$")))
    val bulletRatio = when(nLines > 0, bulletLines.cast("double") / nLines)
    val ellipsisLineRatio = when(nLines > 0, ellipsisLines.cast("double") / nLines)

    val alphaWords = size(filter(words, w => w.rlike("[A-Za-z]")))
    val alphaRatio = when(nWords > 0, alphaWords.cast("double") / nWords)

    val stops = Seq("the", "be", "to", "of", "and", "that", "have", "with")
    val lowered = concat(lit(" "),
      regexp_replace(org.apache.spark.sql.functions.lower(text), "\\s+", " "), lit(" "))
    val stopHits = stops.map(s =>
      when(lowered.contains(s" $s "), 1).otherwise(0)).reduce(_ + _)

    val rWords = nWords.between(getMinWords, getMaxWords)
    val rMeanLen = coalesce(meanLen.between(getMinMeanWordLen, getMaxMeanWordLen), lit(false))
    val rSymbol = coalesce(symbolRatio <= getMaxSymbolRatio, lit(false))
    val rBullet = coalesce(bulletRatio <= getMaxBulletRatio, lit(false))
    val rEllipsis = coalesce(ellipsisLineRatio <= getMaxEllipsisLineRatio, lit(false))
    val rAlpha = coalesce(alphaRatio >= getMinAlphaWordRatio, lit(false))
    val rStops = stopHits >= getMinStopwordHits

    Array(df
      .withColumn("rule_word_count", rWords)
      .withColumn("rule_mean_word_len", rMeanLen)
      .withColumn("rule_symbol_ratio", rSymbol)
      .withColumn("rule_bullet_lines", rBullet)
      .withColumn("rule_ellipsis_lines", rEllipsis)
      .withColumn("rule_alpha_words", rAlpha)
      .withColumn("rule_stopwords", rStops)
      .withColumn("gopher_keep",
        rWords && rMeanLen && rSymbol && rBullet && rEllipsis && rAlpha && rStops))
  }
}

object GopherFilter extends StageLoader[GopherFilter] {
  def load(spark: SparkSession, path: String): GopherFilter =
    ReadWrite.applyParams(new GopherFilter, path)
}
