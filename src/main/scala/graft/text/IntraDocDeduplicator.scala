package graft.text

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.api.{StageLoader, Transformer}
import graft.param._
import graft.util.ReadWrite

/**
 * WITHIN-document repetition removal: drop repeated lines (or
 * paragraphs) inside each document, keeping the first occurrence in
 * original order — the complement of [[LineDeduplicator]], which
 * dedups lines CORPUS-wide. Boilerplate chat headers, repeated
 * navigation rows, and copy-paste stutter inside one page are
 * intra-doc phenomena; corpus-level dedup never sees them (each
 * occurrence is in the same document).
 *
 * Emits `<out>_text` (rebuilt with the granularity's separator),
 * `<out>_kept` and `<out>_removed` (unit counts). Granularity:
 * `line` (split on \n) or `paragraph` (split on blank lines; rebuilt
 * with \n\n). Comparison is EXACT — normalize upstream
 * (TextNormalizer) for case/whitespace-insensitive matching.
 *
 * Scale shape: pure in-row array math (split → array_distinct →
 * array_join) — zero shuffle, zero UDF. array_distinct keeps the
 * first occurrence of each element in encounter order (pinned by
 * spec — the rebuild depends on it).
 */
class IntraDocDeduplicator extends Transformer[IntraDocDeduplicator]
    with HasInputCol[IntraDocDeduplicator] with HasOutputCol[IntraDocDeduplicator] {

  final val granularity: Param[String] = param[String](
    "granularity", "Dedup unit: line or paragraph", "line",
    ParamValidators.inArray("line", "paragraph"))
  def getGranularity: String = get(granularity)
  def setGranularity(v: String): IntraDocDeduplicator = set(granularity, v)

  override def transform(inputs: DataFrame*): Array[DataFrame] = {
    require(inputs.size == 1)
    val (splitPat, sep) = getGranularity match {
      case "line" => ("\n", "\n")
      case "paragraph" => ("\n[ \t]*\n+", "\n\n")
    }
    val units = split(col(getInputCol), splitPat)
    val kept = array_distinct(units)
    val o = getOutputCol
    Array(inputs.head
      .withColumn(s"${o}_text", array_join(kept, sep))
      .withColumn(s"${o}_kept", size(kept))
      .withColumn(s"${o}_removed", size(units) - size(kept)))
  }
}

object IntraDocDeduplicator extends StageLoader[IntraDocDeduplicator] {
  def load(spark: SparkSession, path: String): IntraDocDeduplicator =
    ReadWrite.applyParams(new IntraDocDeduplicator, path)
}
