package graft.text

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.api.{AlgoOperator, StageLoader}
import graft.param._
import graft.util.ReadWrite

/**
 * The C4 cleaning recipe (Raffel et al. 2020, "Exploring the Limits of
 * Transfer Learning with a Unified Text-to-Text Transformer" §2.2 —
 * the rules that produced the public C4 corpus from Common Crawl):
 *
 * Line level (applied first; the page is rebuilt from surviving lines):
 *  - keep only lines ending in a terminal punctuation mark
 *    (`. ! ?`, optionally followed by a closing double quote);
 *  - keep only lines with at least `minLineWords` words (paper: 5);
 *  - drop any line containing a `lineDropTokens` word (paper: the
 *    word "javascript", case-insensitive).
 *
 * Page level:
 *  - drop pages whose CLEANED text has fewer than `minSentences`
 *    sentences (paper: 3) — sentences counted as terminal-punctuation
 *    marks, the deterministic stand-in for a sentence splitter;
 *  - drop pages containing any `bannedSubstrings` entry,
 *    case-insensitive, checked on the ORIGINAL page (paper: the
 *    "lorem ipsum" placeholder and the curly brace `{`).
 *
 * Appends `c4_text` (the line-filtered page), `n_lines_kept`,
 * `n_sentences`, one boolean per page rule, and `c4_keep`.
 *
 * Scale shape: like [[GopherFilter]] — pure in-row Column expressions
 * (split / filter / array_join / regexp), zero shuffle, zero UDF,
 * whole-stage codegen; at 100 TB this is scan-bound by design.
 *
 * No reference counterpart — beyond-reference LLM-data-pipeline tier.
 */
class C4Filter extends AlgoOperator[C4Filter] with HasInputCol[C4Filter] {

  final val minLineWords: Param[Int] =
    param[Int]("minLineWords", "Minimum words for a line to survive.", 5,
      ParamValidators.gtEq(0))
  final val minSentences: Param[Int] =
    param[Int]("minSentences", "Minimum sentences (terminal punctuation marks) in the " +
      "cleaned page.", 3, ParamValidators.gtEq(0))
  final val lineDropTokens: Param[Array[String]] =
    param[Array[String]]("lineDropTokens", "Case-insensitive words whose presence drops " +
      "a line.", Array("javascript"))
  final val bannedSubstrings: Param[Array[String]] =
    param[Array[String]]("bannedSubstrings", "Case-insensitive substrings whose presence " +
      "drops the whole page.", Array("lorem ipsum", "{"))
  def setMinLineWords(v: Int): C4Filter = set(minLineWords, v)
  def setMinSentences(v: Int): C4Filter = set(minSentences, v)
  def setLineDropTokens(v: Array[String]): C4Filter = set(lineDropTokens, v)
  def setBannedSubstrings(v: Array[String]): C4Filter = set(bannedSubstrings, v)
  def getMinLineWords: Int = get(minLineWords)
  def getMinSentences: Int = get(minSentences)
  def getLineDropTokens: Array[String] = get(lineDropTokens)
  def getBannedSubstrings: Array[String] = get(bannedSubstrings)

  override def transform(inputs: DataFrame*): Array[DataFrame] = {
    require(inputs.size == 1)
    val df = inputs.head
    val text = col(getInputCol)

    def lineOk(l: Column): Column = {
      val t = trim(l)
      val terminal = t.rlike("[.!?][\"”]?$")
      val wordCount = when(length(t) === 0, 0).otherwise(size(split(t, "\\s+")))
      val dropHit = getLineDropTokens
        .map(tok => lower(l).rlike("\\b" + java.util.regex.Pattern.quote(
          tok.toLowerCase(java.util.Locale.ROOT)) + "\\b"))
        .reduceOption(_ || _).getOrElse(lit(false))
      terminal && wordCount >= getMinLineWords && !dropHit
    }

    val kept = filter(split(text, "\n"), lineOk _)
    val cleaned = array_join(kept, "\n")
    val nSentences = length(cleaned) - length(regexp_replace(cleaned, "[.!?]", ""))
    val banned = getBannedSubstrings
      .map(s => lower(text).contains(s.toLowerCase(java.util.Locale.ROOT)))
      .reduceOption(_ || _).getOrElse(lit(false))

    val rSentences = nSentences >= getMinSentences
    val rBanned = !coalesce(banned, lit(false))
    Array(df
      .withColumn("c4_text", cleaned)
      .withColumn("n_lines_kept", size(kept))
      .withColumn("n_sentences", nSentences)
      .withColumn("rule_min_sentences", rSentences)
      .withColumn("rule_not_banned", rBanned)
      .withColumn("c4_keep", rSentences && rBanned && size(kept) >= 1))
  }
}

object C4Filter extends StageLoader[C4Filter] {
  def load(spark: SparkSession, path: String): C4Filter =
    ReadWrite.applyParams(new C4Filter, path)
}
