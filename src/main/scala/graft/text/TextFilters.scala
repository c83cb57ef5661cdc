package graft.text

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.api.{StageLoader, Transformer}
import graft.param._
import graft.util.ReadWrite

/**
 * Word-level repetition statistics in the style of the Gopher quality
 * rules (Rae et al. 2021, "Scaling Language Models", appendix A1.1):
 * documents dominated by a few repeated words or n-grams are low-value
 * training data. Appended columns:
 *
 *  - `n_words`             total whitespace tokens
 *  - `distinct_word_ratio` |distinct words| / n_words
 *  - `top_word_fraction`   occurrences of the most frequent word / n_words
 *  - `dup_2gram_fraction`  1 - |distinct 2-grams| / |2-grams|
 *  - `dup_3gram_fraction`  1 - |distinct 3-grams| / |3-grams|
 *
 * Everything is a pure Column expression over higher-order array
 * functions — no UDFs, no explode, no shuffle. At 100 TB this is a
 * single codegen'd projection over the corpus scan; the most-frequent-
 * word count is computed in-row as the longest run of the sorted token
 * array rather than an explode+groupBy (which would shuffle
 * words-times-documents rows on a skewed key).
 */
class RepetitionStats extends Transformer[RepetitionStats]
    with HasInputCol[RepetitionStats] {

  override def transform(inputs: DataFrame*): Array[DataFrame] = {
    require(inputs.size == 1)
    val text = col(getInputCol)
    val empty = length(trim(text)) === 0
    val words = split(trim(text), "\\s+")
    val n = when(empty, 0L).otherwise(size(words).cast("long"))
    val nD = n.cast("double")

    val distinctRatio =
      when(n === 0, 0.0).otherwise(size(array_distinct(words)) / nD)

    // longest run in the sorted token array == count of the mode word,
    // found by ONE sequential aggregate() fold whose lambda touches
    // only the accumulator and the current element. (An earlier
    // formulation indexed the sorted array from inside a filter()
    // lambda — Catalyst cannot hoist a common subexpression into a
    // higher-order lambda, so the O(n log n) sort re-ran per element:
    // O(n² log n) per document, 53 s for the sf0.1 corpus vs <1 s now.)
    val runState = aggregate(
      array_sort(words),
      struct(lit(null).cast("string").as("prev"), lit(0).as("run"), lit(0).as("best")),
      (acc, w) => {
        val run = when(acc.getField("prev").isNotNull && w === acc.getField("prev"),
          acc.getField("run") + 1).otherwise(lit(1))
        struct(w.as("prev"), run.as("run"),
          greatest(acc.getField("best"), run).as("best"))
      })
    val topFrac = when(n === 0, 0.0).otherwise(runState.getField("best") / nD)

    def gram2(a: Column, b: Column): Column = concat_ws(" ", a, b)
    val dup2 = {
      val g = size(words) - 1
      val grams = zip_with(slice(words, lit(1), g), slice(words, lit(2), g), gram2)
      when(n < 2, 0.0)
        .otherwise(lit(1.0) - size(array_distinct(grams)) / g.cast("double"))
    }
    val dup3 = {
      val g = size(words) - 2
      val grams = zip_with(
        zip_with(slice(words, lit(1), g), slice(words, lit(2), g), gram2),
        slice(words, lit(3), g), gram2)
      when(n < 3, 0.0)
        .otherwise(lit(1.0) - size(array_distinct(grams)) / g.cast("double"))
    }

    Array(inputs.head
      .withColumn("n_words", n)
      .withColumn("distinct_word_ratio", distinctRatio)
      .withColumn("top_word_fraction", topFrac)
      .withColumn("dup_2gram_fraction", dup2)
      .withColumn("dup_3gram_fraction", dup3))
  }
}
object RepetitionStats extends StageLoader[RepetitionStats] {
  def load(spark: SparkSession, path: String): RepetitionStats =
    ReadWrite.applyParams(new RepetitionStats, path)
}

/**
 * Regex-based PII redaction for training-data scrubbing: replaces
 * email addresses, dotted-quad IPs, and international-format phone
 * numbers with `<EMAIL>` / `<IP>` / `<PHONE>` sentinels, in that
 * order, and appends per-category hit counts (`n_emails`, `n_ips`,
 * `n_phones`) counted on the text as each pattern sees it.
 *
 * The patterns deliberately use the common subset of java.util.regex
 * and RE2 syntax (no backreferences or lookaround) so the same
 * pattern text is portable to RE2-based engines. Pure codegen'd
 * `regexp_replace`/`regexp_extract_all` — one projection, no shuffle.
 */
class PiiRedactor extends Transformer[PiiRedactor]
    with HasInputCol[PiiRedactor] with HasOutputCol[PiiRedactor] {

  override def transform(inputs: DataFrame*): Array[DataFrame] = {
    require(inputs.size == 1)
    import PiiRedactor._
    val t0 = col(getInputCol)
    def hits(c: Column, p: String): Column =
      size(regexp_extract_all(c, lit(p), lit(0))).cast("long")
    // email first (its local part may contain digits a later numeric
    // pattern would chew on), then IPs, then phones on what remains
    val nEmails = hits(t0, EmailPattern)
    val t1 = regexp_replace(t0, EmailPattern, "<EMAIL>")
    val nIps = hits(t1, Ipv4Pattern)
    val t2 = regexp_replace(t1, Ipv4Pattern, "<IP>")
    val nPhones = hits(t2, PhonePattern)
    val t3 = regexp_replace(t2, PhonePattern, "<PHONE>")
    Array(inputs.head
      .withColumn(getOutputCol, t3)
      .withColumn("n_emails", nEmails)
      .withColumn("n_ips", nIps)
      .withColumn("n_phones", nPhones))
  }
}
object PiiRedactor extends StageLoader[PiiRedactor] {
  val EmailPattern: String = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val Ipv4Pattern: String = "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b"
  /** International form only (leading +): avoids false hits on prose numbers. */
  val PhonePattern: String = "\\+\\d[\\d -]{6,}\\d"

  def load(spark: SparkSession, path: String): PiiRedactor =
    ReadWrite.applyParams(new PiiRedactor, path)
}
