package graft.text

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.api.{AlgoOperator, StageLoader, Transformer}
import graft.param._
import graft.util.ReadWrite

/**
 * Training-data text analysis operators. All of them are pure Column
 * expressions — no UDFs — so they stay inside whole-stage codegen and
 * scale as a single projection over the corpus scan.
 */

/**
 * Per-document surface statistics and a heuristic quality score in
 * [0, 1] (Gopher-style length / word-shape / punctuation / stopword
 * density checks). Appended columns:
 * n_chars, n_tokens, mean_token_len, alpha_ratio, punct_ratio,
 * stopword_ratio, quality_score.
 */
class TextQualityScorer extends Transformer[TextQualityScorer]
    with HasInputCol[TextQualityScorer] {

  override def transform(inputs: DataFrame*): Array[DataFrame] = {
    require(inputs.size == 1)
    val text = col(getInputCol)
    val toks = split(trim(text), "\\s+")
    val nTokens = when(length(trim(text)) === 0, 0).otherwise(size(toks)).cast("long")
    val nChars = length(text).cast("long")
    // regexp_count, not length(regexp_replace(...)): counting matches
    // avoids materializing a rewritten copy of every document per
    // statistic — three fewer full-text allocations per row
    val nonSpace = (nChars - regexp_count(text, lit("\\s"))).cast("double")
    val alpha = regexp_count(text, lit("[A-Za-z]")).cast("double")
    val punct = regexp_count(text, lit("\\p{Punct}")).cast("double")
    val stopHits = size(filter(
      org.apache.spark.sql.functions.transform(toks, t => lower(t)),
      t => array_contains(lit(TextQualityScorer.CommonStopWords), t))).cast("double")

    val meanTokenLen = when(nTokens === 0, 0.0).otherwise(nonSpace / nTokens)
    val alphaRatio = when(nChars === 0, 0.0).otherwise(alpha / nChars)
    val punctRatio = when(nChars === 0, 0.0).otherwise(punct / nChars)
    val stopRatio = when(nTokens === 0, 0.0).otherwise(stopHits / nTokens)

    // quality: four equally-weighted [0,1] components — in-range token
    // count, in-range mean word length, low punctuation density, and a
    // saturating reward for natural-language stopword density
    val lengthOk = when(nTokens.between(5, 2000), 1.0).otherwise(0.0)
    val shapeOk = when(meanTokenLen >= 2.0 && meanTokenLen <= 12.0, 1.0).otherwise(0.0)
    val punctOk = lit(1.0) - least(punctRatio * 4.0, lit(1.0))
    val stopOk = least(stopRatio * 5.0, lit(1.0))
    val quality = (lengthOk + shapeOk + punctOk + stopOk) / 4.0

    Array(inputs.head
      .withColumn("n_chars", nChars)
      .withColumn("n_tokens", nTokens)
      .withColumn("mean_token_len", meanTokenLen)
      .withColumn("alpha_ratio", alphaRatio)
      .withColumn("punct_ratio", punctRatio)
      .withColumn("stopword_ratio", stopRatio)
      .withColumn("quality_score", quality))
  }
}
object TextQualityScorer extends StageLoader[TextQualityScorer] {
  /** Compact high-frequency English stopword list used for the density signal. */
  val CommonStopWords: Array[String] = Array(
    "the", "a", "an", "and", "or", "of", "to", "in", "is", "it",
    "that", "for", "on", "with", "as", "was", "at", "by", "be", "this")

  def load(spark: SparkSession, path: String): TextQualityScorer =
    ReadWrite.applyParams(new TextQualityScorer, path)
}

/**
 * Stopword-profile language identification: counts token hits against
 * a small per-language stopword profile; the language with the most
 * hits wins (ties and zero hits → "und"). Appends `langCol` and one
 * hit-count column per profile (`lang_hits_<code>`).
 */
class LanguageDetector extends Transformer[LanguageDetector]
    with HasInputCol[LanguageDetector] {

  final val langCol: Param[String] =
    param[String]("langCol", "Output column for the detected language code.", "detected_lang")
  def getLangCol: String = get(langCol)
  def setLangCol(v: String): LanguageDetector = set(langCol, v)

  override def transform(inputs: DataFrame*): Array[DataFrame] = {
    require(inputs.size == 1)
    val lowered = split(trim(lower(col(getInputCol))), "\\s+")
    val hits: Seq[(String, Column)] = LanguageDetector.Profiles.map { case (code, words) =>
      code -> size(filter(lowered, t => array_contains(lit(words), t))).cast("long")
    }
    // argmax with deterministic profile-order tie-break; zero hits → und
    val best = hits.foldLeft((lit("und"), lit(0L))) { case ((bl, bh), (code, h)) =>
      (when(h > bh, lit(code)).otherwise(bl), when(h > bh, h).otherwise(bh))
    }
    val out = hits.foldLeft(inputs.head) { case (d, (code, h)) =>
      d.withColumn(s"lang_hits_$code", h)
    }
    Array(out.withColumn(getLangCol, best._1))
  }
}
object LanguageDetector extends StageLoader[LanguageDetector] {
  /** Tiny function-word profiles; order fixes tie-breaking. */
  val Profiles: Seq[(String, Array[String])] = Seq(
    "en" -> Array("the", "a", "of", "and", "to", "in", "is", "that", "it", "for"),
    "de" -> Array("der", "die", "das", "und", "ist", "nicht", "ein", "mit", "für", "auf"),
    "fr" -> Array("le", "la", "les", "et", "est", "une", "pour", "dans", "que", "pas"),
    "es" -> Array("el", "la", "los", "y", "es", "una", "para", "en", "que", "no"))

  def load(spark: SparkSession, path: String): LanguageDetector =
    ReadWrite.applyParams(new LanguageDetector, path)
}

/**
 * Token counting for budget estimation: whitespace tokens, a BPE-ish
 * pre-tokenizer count (letter runs | digit runs | single punctuation),
 * and the chars/4 rule-of-thumb LLM token estimate.
 */
class TokenCounter extends Transformer[TokenCounter]
    with HasInputCol[TokenCounter] {

  override def transform(inputs: DataFrame*): Array[DataFrame] = {
    require(inputs.size == 1)
    val text = col(getInputCol)
    val ws = when(length(trim(text)) === 0, 0)
      .otherwise(size(split(trim(text), "\\s+"))).cast("long")
    val bpe = size(regexp_extract_all(text, lit(TokenCounter.BpePattern), lit(0))).cast("long")
    val est = ceil(length(text) / 4.0).cast("long")
    Array(inputs.head
      .withColumn("n_ws_tokens", ws)
      .withColumn("n_bpe_tokens", bpe)
      .withColumn("n_est_tokens", est))
  }
}
object TokenCounter extends StageLoader[TokenCounter] {
  /** Simple enough to mean the same thing in java.util.regex and RE2. */
  val BpePattern: String = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"

  def load(spark: SparkSession, path: String): TokenCounter =
    ReadWrite.applyParams(new TokenCounter, path)
}

/**
 * Exact deduplication by content hash: normalize (lowercase, trim,
 * collapse whitespace) → md5 → per-hash canonical id (minimum) and a
 * duplicate flag. One shuffle on the 128-bit fingerprint; group sizes
 * are tiny (true duplicates only), so no skew concern at corpus scale.
 */
class ExactDeduplicator extends AlgoOperator[ExactDeduplicator]
    with HasInputCol[ExactDeduplicator] {

  final val idCol: Param[String] = param[String]("idCol", "Unique document id column.", "id")
  def getIdCol: String = get(idCol)
  def setIdCol(v: String): ExactDeduplicator = set(idCol, v)

  override def transform(inputs: DataFrame*): Array[DataFrame] = {
    require(inputs.size == 1)
    val fp = md5(to_binary(
      regexp_replace(lower(trim(col(getInputCol))), "\\s+", " "), lit("utf-8")))
    val w = Window.partitionBy("content_fingerprint")
    val out = inputs.head
      .withColumn("content_fingerprint", fp)
      .withColumn("canonical_id", min(col(getIdCol)).over(w))
      .withColumn("is_exact_duplicate", col(getIdCol) =!= col("canonical_id"))
    Array(out)
  }
}
object ExactDeduplicator extends StageLoader[ExactDeduplicator] {
  def load(spark: SparkSession, path: String): ExactDeduplicator =
    ReadWrite.applyParams(new ExactDeduplicator, path)
}

/**
 * Winnowing document fingerprints (Schleimer/Wilkerson/Aiken, SIGMOD
 * 2003): hash every character k-gram, slide a window of `windowSize`
 * hashes, keep each window's minimum, and emit the sorted distinct
 * selected hashes. Any two documents sharing a substring of length
 * ≥ k + windowSize − 1 share at least one fingerprint — the standard
 * near-copy detection guarantee.
 *
 * Hashes are md5 hex strings: fixed-length hex compares
 * lexicographically exactly like the underlying 128-bit integer, and
 * md5 means the same bytes in every engine. Tie-breaking inside a
 * window does not matter because the output is the distinct VALUE
 * set. Texts shorter than k get an empty fingerprint array.
 *
 * Implemented as ONE compiled single-pass UDF per row (m md5 calls +
 * a monotonic-deque sliding minimum, O(m) total). A pure Column
 * formulation (sequence/transform/slice/array_min) reads nicer but
 * Catalyst re-evaluates the k-gram hash array inside the per-window
 * lambda, turning O(m) into O(m·w·hash) — 40× slower at sf0.1. Still
 * a pure per-row projection: no shuffle, trivially parallel.
 */
class DocumentFingerprinter extends Transformer[DocumentFingerprinter]
    with HasInputCol[DocumentFingerprinter] with HasOutputCol[DocumentFingerprinter] {

  final val k: Param[Int] =
    param[Int]("k", "Character k-gram size.", 5, ParamValidators.gt(0))
  def getK: Int = get(k)
  def setK(v: Int): DocumentFingerprinter = set(k, v)

  final val windowSize: Param[Int] =
    param[Int]("windowSize", "Winnowing window: one fingerprint kept per this many k-gram hashes.",
      4, ParamValidators.gt(0))
  def getWindowSize: Int = get(windowSize)
  def setWindowSize(v: Int): DocumentFingerprinter = set(windowSize, v)

  override def transform(inputs: DataFrame*): Array[DataFrame] = {
    require(inputs.size == 1)
    val kk = getK
    val w = getWindowSize
    val fp = udf { text: String =>
      if (text == null) null
      else {
        val m = text.length - kk + 1
        if (m < 1) Seq.empty[String]
        else {
          val md = java.security.MessageDigest.getInstance("MD5")
          val hashes = new Array[String](m)
          var i = 0
          while (i < m) {
            val digest = md.digest(text.substring(i, i + kk).getBytes("UTF-8"))
            val sb = new java.lang.StringBuilder(32)
            var b = 0
            while (b < digest.length) {
              sb.append(Character.forDigit((digest(b) >> 4) & 0xf, 16))
              sb.append(Character.forDigit(digest(b) & 0xf, 16))
              b += 1
            }
            hashes(i) = sb.toString
            md.reset()
            i += 1
          }
          // sliding minimum via monotonic deque; selected VALUE set is
          // tie-break-independent
          val selected = new java.util.TreeSet[String]()
          val dq = new java.util.ArrayDeque[Int]()
          var j = 0
          while (j < m) {
            while (!dq.isEmpty && hashes(dq.peekLast()) >= hashes(j)) dq.pollLast()
            dq.addLast(j)
            while (dq.peekFirst() <= j - w) dq.pollFirst()
            if (j >= w - 1 || j == m - 1) selected.add(hashes(dq.peekFirst()))
            j += 1
          }
          scala.jdk.CollectionConverters.IteratorHasAsScala(selected.iterator()).asScala.toSeq
        }
      }
    }
    Array(inputs.head.withColumn(getOutputCol, fp(col(getInputCol))))
  }
}
object DocumentFingerprinter extends StageLoader[DocumentFingerprinter] {
  def load(spark: SparkSession, path: String): DocumentFingerprinter =
    ReadWrite.applyParams(new DocumentFingerprinter, path)
}
