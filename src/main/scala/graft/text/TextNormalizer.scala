package graft.text

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.api.{StageLoader, Transformer}
import graft.param._
import graft.util.ReadWrite

/**
 * Canonical text normalization ahead of fingerprinting/dedup — the
 * step every published dedup recipe (CCNet, RefinedWeb, Lee et al.)
 * applies before hashing, here as one reusable operator instead of
 * per-operator ad-hoc `lower(trim(...))` chains:
 *
 *  1. strip ASCII control characters;
 *  2. fold Latin-1 accents to their base letters (fixed `translate`
 *     map — the deterministic, oracle-replayable subset of Unicode
 *     NFKD+strip);
 *  3. lowercase (`lowercase`, default true);
 *  4. collapse whitespace runs to single spaces and trim.
 *
 * Appends `<outputCol>`. Pure in-row Column expressions — zero
 * shuffle, zero UDF, whole-stage codegen; scan-bound at any scale.
 *
 * No reference counterpart — beyond-reference LLM-data-pipeline tier.
 */
class TextNormalizer extends Transformer[TextNormalizer]
    with HasInputCol[TextNormalizer] with HasOutputCol[TextNormalizer] {

  final val lowercase: Param[Boolean] =
    param[Boolean]("lowercase", "Lowercase after accent folding.", true)
  final val stripAccents: Param[Boolean] =
    param[Boolean]("stripAccents", "Fold Latin-1 accented letters to base letters.", true)
  def setLowercase(v: Boolean): TextNormalizer = set(lowercase, v)
  def setStripAccents(v: Boolean): TextNormalizer = set(stripAccents, v)
  def getLowercase: Boolean = get(lowercase)
  def getStripAccents: Boolean = get(stripAccents)

  override def transform(inputs: DataFrame*): Array[DataFrame] = {
    require(inputs.size == 1)
    val df = inputs.head
    var out = regexp_replace(col(getInputCol), "[\\x00-\\x1F\\x7F]", " ")
    if (getStripAccents)
      out = translate(out, TextNormalizer.AccentFrom, TextNormalizer.AccentTo)
    if (getLowercase) out = lower(out)
    out = trim(regexp_replace(out, "\\s+", " "))
    Array(df.withColumn(getOutputCol, out))
  }
}

object TextNormalizer extends StageLoader[TextNormalizer] {
  /** Latin-1 accent fold map (both strings are position-aligned). */
  val AccentFrom: String =
    "àáâãäåèéêëìíîïòóôõöùúûüçñýÿÀÁÂÃÄÅÈÉÊËÌÍÎÏÒÓÔÕÖÙÚÛÜÇÑÝ"
  val AccentTo: String =
    "aaaaaaeeeeiiiiooooouuuucnyyAAAAAAEEEEIIIIOOOOOUUUUCNY"

  def load(spark: SparkSession, path: String): TextNormalizer =
    ReadWrite.applyParams(new TextNormalizer, path)
}
