package graft.dedup

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.api.{AlgoOperator, StageLoader}
import graft.param._
import graft.util.ReadWrite

/**
 * Span-level exact-substring deduplication — the ExactSubstr recipe of
 * Lee et al. 2021 ("Deduplicating Training Data Makes Language Models
 * Better") re-expressed for a distributed engine: instead of a global
 * suffix array, every overlapping `n`-token window is fingerprinted
 * (md5 over the joined tokens — 128 bits, so false merges stay
 * negligible at 100 TB window counts) and a window whose fingerprint
 * occurs often enough corpus-wide marks its [pos, pos+n) token range
 * as duplicated. Overlapping/adjacent marked ranges are merged into
 * maximal spans (gaps-and-islands), which is exactly the union of
 * duplicated substrings of length ≥ n that the suffix-array method
 * yields for cross-document repeats.
 *
 * `scope`:
 *  - `cross_doc` (default): a window counts as duplicated only when it
 *    appears in ≥ `minOccurrences` DISTINCT documents — pure
 *    cross-document dedup; in-document repetition is left alone (that
 *    is [[graft.text.TextFilters]]' RepetitionStats' job).
 *  - `any`: total occurrence count ≥ `minOccurrences`, also catching
 *    a passage pasted twice into one document.
 *
 * Appends to every input row: `<outputCol>` (text with duplicated
 * spans' tokens removed), `dup_windows` (how many of the doc's windows
 * were duplicated), `dup_spans` (merged span count), `dup_tokens`
 * (tokens covered by merged spans). Docs shorter than `n` tokens pass
 * through with zeros.
 *
 * Scale shape: the windowing pass is in-row (one HOF over the token
 * array — no explode until the count); the corpus-wide count is a
 * groupBy on the 128-bit fingerprint with map-side partial
 * aggregation, and only over-threshold fingerprints (a small set — by
 * definition repeated content) ride the join back, so AQE turns the
 * join broadcast when the dup set is small. Span merging is one
 * window-function pass partitioned by doc id (never a global window).
 * No driver collects anywhere; the ×(tokens−n) window blow-up exists
 * only inside the count shuffle where each row is (16-byte hash).
 *
 * No reference counterpart — beyond-reference LLM-data-pipeline tier.
 */
class SpanDeduplicator extends AlgoOperator[SpanDeduplicator]
    with HasInputCol[SpanDeduplicator] with HasOutputCol[SpanDeduplicator] {

  final val idCol: Param[String] =
    param[String]("idCol", "Unique document id column.", "id")
  def getIdCol: String = get(idCol)
  def setIdCol(v: String): SpanDeduplicator = set(idCol, v)

  final val n: Param[Int] =
    param[Int]("n", "Window length in tokens; duplicated runs shorter than this are not detected.",
      20, ParamValidators.gt(1))
  def getN: Int = get(n)
  def setN(v: Int): SpanDeduplicator = set(n, v)

  final val minOccurrences: Param[Int] =
    param[Int]("minOccurrences",
      "A window is duplicated when it occurs at least this many times (see scope).",
      2, ParamValidators.gt(1))
  def getMinOccurrences: Int = get(minOccurrences)
  def setMinOccurrences(v: Int): SpanDeduplicator = set(minOccurrences, v)

  final val scope: Param[String] =
    param[String]("scope", "cross_doc: count distinct documents; any: count total occurrences.",
      "cross_doc", ParamValidators.inArray("cross_doc", "any"))
  def getScope: String = get(scope)
  def setScope(v: String): SpanDeduplicator = set(scope, v)

  override def transform(inputs: DataFrame*): Array[DataFrame] = {
    require(inputs.size == 1)
    val df = inputs.head
    val id = getIdCol
    val win = getN

    // In-row tokenization + windowing: tokens on any whitespace, empties
    // dropped; window i fingerprints tokens [i, i+n).
    val toks = df.select(col(id).as("__id"),
      expr(s"filter(split(${getInputCol}, '\\\\s+'), x -> x != '')").as("__toks"))
    val windows = toks
      .where(size(col("__toks")) >= win)
      .select(col("__id"),
        posexplode(expr(
          s"transform(sequence(0, size(__toks) - $win), i -> md5(array_join(slice(__toks, i + 1, $win), ' ')))"))
          .as(Seq("__pos", "__h")))

    // Corpus-wide duplicated-fingerprint set (partial agg map-side; only
    // over-threshold hashes survive).
    val occ = if (getScope == "cross_doc") countDistinct(col("__id")) else count(lit(1))
    val dupHashes = windows.groupBy("__h")
      .agg(occ.as("__occ")).where(col("__occ") >= getMinOccurrences)
      .select("__h")

    // Positions of duplicated windows per doc → gaps-and-islands merge.
    // A window starting at p covers [p, p+n); islands break when the next
    // start exceeds the running max end (adjacent spans merge: contiguous
    // duplicated text is one span).
    val marked = windows.join(dupHashes, Seq("__h")).select("__id", "__pos")
    val byDoc = Window.partitionBy("__id").orderBy("__pos")
    val prevEnd = max(col("__pos") + win)
      .over(byDoc.rowsBetween(Window.unboundedPreceding, -1))
    val islands = marked
      .withColumn("__new", when(col("__pos") > coalesce(prevEnd, lit(Int.MinValue)), 1).otherwise(0))
      .withColumn("__isl", sum(col("__new")).over(byDoc))
    val spans = islands.groupBy("__id", "__isl")
      .agg(min(col("__pos")).as("__s"), max(col("__pos") + win).as("__e"),
        count(lit(1)).as("__w"))
    val stats = spans.groupBy("__id")
      .agg(sum(col("__w")).as("dup_windows"),
        count(lit(1)).as("dup_spans"),
        sum(col("__e") - col("__s")).as("dup_tokens"),
        sort_array(collect_list(struct(col("__s"), col("__e")))).as("__spans"))

    // Rebuild text: drop every token inside a merged span. Spans are
    // merged and typically few, so the per-token exists() is cheap.
    val joined = df
      .join(toks.select(col("__id"), col("__toks")), df(id) === toks("__id"), "left")
      .drop("__id")
      .join(stats, df(id) === stats("__id"), "left")
      .drop("__id")
    val cleaned = when(col("__spans").isNull, col(getInputCol))
      .otherwise(expr(
        "array_join(filter(__toks, (t, i) -> !exists(__spans, sp -> i >= sp.__s AND i < sp.__e)), ' ')"))
    Array(joined
      .withColumn(getOutputCol, cleaned)
      .withColumn("dup_windows", coalesce(col("dup_windows"), lit(0L)))
      .withColumn("dup_spans", coalesce(col("dup_spans"), lit(0L)))
      .withColumn("dup_tokens", coalesce(col("dup_tokens"), lit(0L)))
      .drop("__toks", "__spans"))
  }
}

object SpanDeduplicator extends StageLoader[SpanDeduplicator] {
  def load(spark: SparkSession, path: String): SpanDeduplicator =
    ReadWrite.applyParams(new SpanDeduplicator, path)
}
