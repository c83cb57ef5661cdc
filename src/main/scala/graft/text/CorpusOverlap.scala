package graft.text

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.api.{AlgoOperator, StageLoader}
import graft.param._
import graft.util.ReadWrite

/**
 * Cross-source corpus overlap matrix: for every pair of sources, how
 * many distinct document fingerprints they share and the Jaccard of
 * their fingerprint sets — the dedup-planning primitive behind "how
 * much of source A is already in source B?" (the question every
 * multi-source pretraining mix starts with; e.g. CommonCrawl snapshots
 * overlap 30–60% pairwise, which is why snapshot-level dedup matters).
 *
 * Fingerprints are the engine's standard content hash
 * (whitespace-normalized lowercase md5 — byte-identical to
 * [[ExactDeduplicator]] / [[graft.streaming.StreamingDeduplicator]]),
 * so "shared" means exact-duplicate content, and the numbers agree
 * with what exact dedup would remove.
 *
 * Output: one row per unordered source pair (sourceA < sourceB) —
 * (source_a, source_b, n_a, n_b, shared, jaccard) where n_* are
 * DISTINCT fingerprint counts per source and
 * jaccard = shared / (n_a + n_b − shared).
 *
 * Scale shape (100 TB design): one distinct over (fingerprint,
 * source) — map-side partial aggregation — then an equi-join of that
 * slim relation with itself on the fingerprint. A fingerprint present
 * in s sources contributes C(s,2) pairs, bounded by sources² — never
 * by corpus size; per-source totals are one more tiny aggregation.
 * No driver materialization beyond the sources² matrix.
 *
 * No reference counterpart — beyond-reference LLM-data-pipeline tier.
 */
class CorpusOverlap extends AlgoOperator[CorpusOverlap]
    with HasInputCol[CorpusOverlap] {

  final val sourceCol: Param[String] =
    param[String]("sourceCol", "Column naming each document's source/corpus.", "source")
  def getSourceCol: String = get(sourceCol)
  def setSourceCol(v: String): CorpusOverlap = set(sourceCol, v)

  override def transform(inputs: DataFrame*): Array[DataFrame] = {
    require(inputs.size == 1)
    val df = inputs.head
    val fp = md5(to_binary(regexp_replace(lower(trim(col(getInputCol))), "\\s+", " "),
      lit("utf-8")))

    val slim = df
      .select(fp.as("__fp"), col(getSourceCol).cast("string").as("__src"))
      .where(col("__src").isNotNull)
      .distinct()

    val perSource = slim.groupBy("__src").agg(count(lit(1)).as("__n"))

    val shared = slim.as("a")
      .join(slim.as("b"),
        col("a.__fp") === col("b.__fp") && col("a.__src") < col("b.__src"))
      .groupBy(col("a.__src").as("source_a"), col("b.__src").as("source_b"))
      .agg(count(lit(1)).as("shared"))

    // every source pair appears, even with zero overlap (the zero rows
    // are the useful all-clear in a dedup plan)
    val pairs = perSource.select(col("__src").as("source_a"), col("__n").as("n_a"))
      .join(perSource.select(col("__src").as("source_b"), col("__n").as("n_b")),
        col("source_a") < col("source_b"))
    Array(pairs
      .join(shared, Seq("source_a", "source_b"), "left")
      .na.fill(0L, Seq("shared"))
      .withColumn("jaccard",
        col("shared").cast("double") / (col("n_a") + col("n_b") - col("shared"))))
  }
}

object CorpusOverlap extends StageLoader[CorpusOverlap] {
  def load(spark: SparkSession, path: String): CorpusOverlap =
    ReadWrite.applyParams(new CorpusOverlap, path)
}
