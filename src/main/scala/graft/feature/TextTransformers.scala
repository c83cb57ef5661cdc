package graft.feature

import java.util.Locale
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.api.{OneToOne, StageLoader, Transformer}
import graft.param._
import graft.util.ReadWrite

/**
 * Tokenizer: lowercase + split on single whitespace chars.
 * Reference: flink-ml-lib feature/tokenizer/Tokenizer.java:49
 * (`input.toLowerCase().split("\\s")` — Java split semantics: trailing
 * empty tokens dropped, interior ones kept).
 */
class Tokenizer extends Transformer[Tokenizer] with OneToOne[Tokenizer]
    with HasInputCol[Tokenizer] with HasOutputCol[Tokenizer] {

  override protected def transformOne(df: DataFrame): DataFrame = {
    val tok = udf { s: String => if (s == null) null else s.toLowerCase.split("\\s") }
    df.withColumn(getOutputCol, tok(col(getInputCol)))
  }
}
object Tokenizer extends StageLoader[Tokenizer] {
  def load(spark: SparkSession, path: String): Tokenizer =
    ReadWrite.applyParams(new Tokenizer, path)
}

/**
 * RegexTokenizer: regex split (gaps=true) or regex match (gaps=false),
 * optional lowercasing, min token length filter.
 * Reference: feature/regextokenizer/RegexTokenizer.java:63 (UDF body).
 */
class RegexTokenizer extends Transformer[RegexTokenizer] with OneToOne[RegexTokenizer]
    with HasInputCol[RegexTokenizer] with HasOutputCol[RegexTokenizer] {

  final val minTokenLength: Param[Int] =
    param[Int]("minTokenLength", "Minimum token length", 1, ParamValidators.gtEq(0))
  final val gaps: Param[Boolean] =
    param[Boolean]("gaps", "If regex splits on gaps (true) or matches tokens (false)", true)
  final val pattern: Param[String] =
    param[String]("pattern", "Regex pattern used for tokenizing", "\\s+", ParamValidators.notNull)
  final val toLowercase: Param[Boolean] =
    param[Boolean]("toLowercase", "Whether to lowercase before tokenizing", true)

  def setMinTokenLength(v: Int): RegexTokenizer = set(minTokenLength, v)
  def setGaps(v: Boolean): RegexTokenizer = set(gaps, v)
  def setPattern(v: String): RegexTokenizer = set(pattern, v)
  def setToLowercase(v: Boolean): RegexTokenizer = set(toLowercase, v)
  def getMinTokenLength: Int = get(minTokenLength)
  def getGaps: Boolean = get(gaps)
  def getPattern: String = get(pattern)
  def getToLowercase: Boolean = get(toLowercase)

  override protected def transformOne(df: DataFrame): DataFrame = {
    val (pat, useGaps, lower, minLen) = (getPattern, getGaps, getToLowercase, getMinTokenLength)
    val tok = udf { s: String =>
      if (s == null) null
      else {
        val re = java.util.regex.Pattern.compile(pat)
        val text = if (lower) s.toLowerCase else s
        val tokens =
          if (useGaps) re.split(text).toSeq
          else {
            val m = re.matcher(text)
            val buf = scala.collection.mutable.ArrayBuffer.empty[String]
            while (m.find()) buf += m.group()
            buf.toSeq
          }
        tokens.filter(_.length >= minLen)
      }
    }
    df.withColumn(getOutputCol, tok(col(getInputCol)))
  }
}
object RegexTokenizer extends StageLoader[RegexTokenizer] {
  def load(spark: SparkSession, path: String): RegexTokenizer =
    ReadWrite.applyParams(new RegexTokenizer, path)
}

/**
 * NGram: sliding n-grams over a string array, each joined by a space;
 * fewer than n input tokens → empty array.
 * Reference: feature/ngram/NGram.java:53 (NGramUdf).
 */
class NGram extends Transformer[NGram] with OneToOne[NGram]
    with HasInputCol[NGram] with HasOutputCol[NGram] {

  final val n: Param[Int] = param[Int]("n", "Number of elements per n-gram (>=1)", 2, ParamValidators.gtEq(1))
  def setN(v: Int): NGram = set(n, v)
  def getN: Int = get(n)

  override protected def transformOne(df: DataFrame): DataFrame = {
    val nv = getN
    // imperative window walk: the idiomatic sliding().map(mkString)
    // allocated a fresh window Seq + iterator per gram and ran ~10x
    // slower on the 10M-row reference workload (30s -> 4s)
    val gram = udf { items: Seq[String] =>
      if (items == null) null
      else {
        val m = items.length - nv + 1
        if (m <= 0) Seq.empty[String]
        else {
          val out = new Array[String](m)
          var i = 0
          while (i < m) {
            val sb = new java.lang.StringBuilder
            var j = 0
            while (j < nv) {
              if (j > 0) sb.append(' ')
              sb.append(items(i + j))
              j += 1
            }
            out(i) = sb.toString
            i += 1
          }
          scala.collection.immutable.ArraySeq.unsafeWrapArray(out)
        }
      }
    }
    df.withColumn(getOutputCol, gram(col(getInputCol)))
  }
}
object NGram extends StageLoader[NGram] {
  def load(spark: SparkSession, path: String): NGram =
    ReadWrite.applyParams(new NGram, path)
}

/**
 * StopWordsRemover: filter stop words out of string-array columns
 * (multi in/out cols, case-(in)sensitive via locale).
 * Reference: feature/stopwordsremover/StopWordsRemover.java:62.
 * Default stop word lists come from Spark MLlib's bundled resources
 * (same upstream lists the reference bundles).
 */
class StopWordsRemover extends Transformer[StopWordsRemover] with OneToOne[StopWordsRemover]
    with HasInputCols[StopWordsRemover] with HasOutputCols[StopWordsRemover] {

  final val stopWords: Param[Array[String]] =
    param[Array[String]]("stopWords", "The words to be filtered out",
      StopWordsRemover.loadDefaultStopWords("english"), ParamValidators.nonEmptyArray)
  final val caseSensitive: Param[Boolean] =
    param[Boolean]("caseSensitive", "Whether to do a case-sensitive comparison", false)
  final val locale: Param[String] =
    param[String]("locale", "Locale of the input for case-insensitive matching",
      StopWordsRemover.getDefaultOrUS, ParamValidators.notNull)

  def setStopWords(v: Array[String]): StopWordsRemover = set(stopWords, v)
  def setCaseSensitive(v: Boolean): StopWordsRemover = set(caseSensitive, v)
  def setLocale(v: String): StopWordsRemover = set(locale, v)
  def getStopWords: Array[String] = get(stopWords)
  def getCaseSensitive: Boolean = get(caseSensitive)
  def getLocale: String = get(locale)

  override protected def transformOne(df: DataFrame): DataFrame = {
    require(getInputCols.length == getOutputCols.length,
      "inputCols and outputCols must have the same length")
    val (words, cs, loc) = (getStopWords, getCaseSensitive, getLocale)
    val remove = udf { arr: Seq[String] =>
      if (arr == null) null
      else {
        val localeObj = new Locale(loc)
        val set: Set[String] =
          if (cs) words.toSet
          else words.iterator.map(w => if (w == null) null else w.toLowerCase(localeObj)).toSet
        arr.filter { t =>
          val key = if (cs || t == null) t else t.toLowerCase(localeObj)
          !set.contains(key)
        }
      }
    }
    getInputCols.zip(getOutputCols).foldLeft(df) { case (d, (in, out)) =>
      d.withColumn(out, remove(col(in)))
    }
  }
}
object StopWordsRemover extends StageLoader[StopWordsRemover] {
  def load(spark: SparkSession, path: String): StopWordsRemover =
    ReadWrite.applyParams(new StopWordsRemover, path)

  /** Same 14+1 language lists the reference bundles; Spark ships them too. */
  def loadDefaultStopWords(language: String): Array[String] =
    org.apache.spark.ml.feature.StopWordsRemover.loadDefaultStopWords(language)

  def getDefaultOrUS: String =
    if (Locale.getAvailableLocales.contains(Locale.getDefault)) Locale.getDefault.toString
    else Locale.US.toString
}
