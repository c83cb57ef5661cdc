package graft.text

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.api.{AlgoOperator, StageLoader}
import graft.param._
import graft.util.ReadWrite

/**
 * Corpus-level line deduplication — the C4 "three-sentence span" /
 * RefinedWeb boilerplate-removal recipe specialized to lines: any
 * line whose normalized form (trim + lowercase) occurs more than
 * `maxOccurrences` times across the WHOLE corpus is deleted from
 * every document ("subscribe to our newsletter", cookie banners,
 * navigation menus). Remaining lines keep their original text and
 * order. Blank lines are kept and never counted. Appends
 * `<outputCol>` (the cleaned text), `n_lines`, `n_removed`.
 *
 * Scale shape: explode lines with their positions → count normalized
 * fingerprints (partial agg does the corpus-wide counting map-side) →
 * keep only the over-threshold fingerprints (a SMALL "boilerplate
 * set": only repeated lines survive the filter, so the join back is
 * broadcast-friendly and AQE-safe even though the raw line table is
 * corpus-sized) → regroup by document with an ordered in-row rebuild.
 * Two shuffles total (the count and the regroup), both on well-spread
 * keys; no driver collects.
 *
 * No reference counterpart — beyond-reference LLM-data-pipeline tier.
 */
class LineDeduplicator extends AlgoOperator[LineDeduplicator]
    with HasInputCol[LineDeduplicator] with HasOutputCol[LineDeduplicator] {

  final val idCol: Param[String] =
    param[String]("idCol", "Unique document id column.", "id")
  def getIdCol: String = get(idCol)
  def setIdCol(v: String): LineDeduplicator = set(idCol, v)

  final val separator: Param[String] =
    param[String]("separator", "Line separator.", "\n", ParamValidators.notNull)
  def getSeparator: String = get(separator)
  def setSeparator(v: String): LineDeduplicator = set(separator, v)

  final val maxOccurrences: Param[Int] =
    param[Int]("maxOccurrences",
      "Lines occurring more than this many times corpus-wide are removed.",
      1, ParamValidators.gt(0))
  def getMaxOccurrences: Int = get(maxOccurrences)
  def setMaxOccurrences(v: Int): LineDeduplicator = set(maxOccurrences, v)

  override def transform(inputs: DataFrame*): Array[DataFrame] = {
    require(inputs.size == 1)
    val df = inputs.head
    val id = getIdCol
    val sep = getSeparator

    val lines = df
      .select(col(id).as("__id"),
        posexplode(split(col(getInputCol), java.util.regex.Pattern.quote(sep), -1))
          .as(Seq("__pos", "__line")))
      .withColumn("__norm", lower(trim(col("__line"))))
    // corpus-wide counts of non-blank normalized lines; only the
    // over-threshold survivors ride the join back
    val boilerplate = lines
      .where(col("__norm") =!= "")
      .groupBy("__norm").agg(count(lit(1)).as("__cnt"))
      .where(col("__cnt") > getMaxOccurrences)
    val flagged = lines
      .join(boilerplate, Seq("__norm"), "left")
      .withColumn("__drop", col("__cnt").isNotNull)
    val rebuilt = flagged
      .groupBy("__id")
      .agg(
        count(lit(1)).as("n_lines"),
        sum(when(col("__drop"), 1L).otherwise(0L)).as("n_removed"),
        array_join(
          org.apache.spark.sql.functions.transform(
            sort_array(collect_list(when(!col("__drop"),
              struct(col("__pos"), col("__line"))))),
            s => s.getField("__line")),
          sep).as(getOutputCol))
    Array(df
      .join(rebuilt, df(id) === rebuilt("__id"), "left")
      .drop("__id"))
  }
}
object LineDeduplicator extends StageLoader[LineDeduplicator] {
  def load(spark: SparkSession, path: String): LineDeduplicator =
    ReadWrite.applyParams(new LineDeduplicator, path)
}
