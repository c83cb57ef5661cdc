package graft.text

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.api.{StageLoader, Transformer}
import graft.param._
import graft.util.ReadWrite

/**
 * Per-target anchor-text rollup — "what the web calls this page",
 * promoted from the `q_anchor_text` query recipe to a first-class
 * operator: given [[LinkGraphExtractor]] rows (one per anchor, with
 * the resolved target key and the anchor's inner text), emit each
 * target's top-k anchor texts with exact counts and a deterministic
 * rank. The rolled-up texts are the strongest external relevance /
 * title signal a crawl corpus carries (the classic use is ranking
 * and query expansion; the LLM-data use is page labeling and
 * boilerplate/spam triage — a domain whose top anchors are "click
 * here" and "cheap pills" reads differently from one anchored by its
 * topic). No reference counterpart — beyond-reference crawl tier.
 *
 * Output: one row per (target, text) that survives, with
 * `<o>_text` (trimmed, lowercased when `lowercase`), `<o>_count`
 * (exact), `<o>_rank` (1 = most frequent; ties broken by text
 * ascending so the report is deterministic and SQL-replayable); the
 * target column keeps its input name. Null targets and empty texts
 * drop — an image-only anchor carries no text signal.
 *
 * Scale shape (100 TB crawl): one map-side-combinable
 * groupBy(target, text) reduces the O(anchors) stream to O(distinct
 * pairs); `minCount` then prunes the Zipf tail BEFORE any per-target
 * ranking (anchor text is heavily Zipfian — minCount 2 typically
 * drops most of the distinct mass). The ranking itself is a
 * row_number window over target. A window sort pulls each target's
 * surviving distinct-text set into one task — fine after pruning for
 * real domains, but a spam target can carry millions of distinct
 * texts, so `saltBuckets` > 0 inserts a salted PRE-ranking: texts
 * hash into that many buckets, each bucket keeps its local top-k
 * (bounding any single sort to ~1/saltBuckets of the set), and only
 * ≤ saltBuckets·k survivors per target reach the final window. The
 * global top-k always survives its bucket's local top-k, so the
 * result is IDENTICAL — the pre-pass trades one extra exchange for a
 * bounded per-task sort (the Swing purchaser-cap / stop-shingle
 * treatment, applied to ranking instead of pairing).
 */
class AnchorTextRollup extends Transformer[AnchorTextRollup]
    with HasOutputCol[AnchorTextRollup] {

  final val targetCol: Param[String] = param[String](
    "targetCol",
    "Grouping key of the rollup — typically the resolved registrable domain (lk_domain), host, or a canonical URL key.",
    "lk_domain")
  def getTargetCol: String = get(targetCol)
  def setTargetCol(v: String): AnchorTextRollup = set(targetCol, v)

  final val textCol: Param[String] = param[String](
    "textCol", "Anchor-text column (LinkGraphExtractor's <o>_text).", "lk_text")
  def getTextCol: String = get(textCol)
  def setTextCol(v: String): AnchorTextRollup = set(textCol, v)

  final val topK: Param[Int] = param[Int](
    "topK", "Anchor texts kept per target.", 10, ParamValidators.gt(0))
  def getTopK: Int = get(topK)
  def setTopK(v: Int): AnchorTextRollup = set(topK, v)

  final val minCount: Param[Int] = param[Int](
    "minCount",
    "Drop (target, text) pairs below this count before ranking — the Zipf-tail prune that keeps the window sort small.",
    1, ParamValidators.gtEq(1))
  def getMinCount: Int = get(minCount)
  def setMinCount(v: Int): AnchorTextRollup = set(minCount, v)

  final val lowercase: Param[Boolean] = param[Boolean](
    "lowercase",
    "Lowercase anchor texts before counting so 'Home'/'home' roll up together.",
    true)
  def getLowercase: Boolean = get(lowercase)
  def setLowercase(v: Boolean): AnchorTextRollup = set(lowercase, v)

  final val saltBuckets: Param[Int] = param[Int](
    "saltBuckets",
    "When > 0, pre-rank texts inside this many hash buckets per target and keep each bucket's local top-k before the final ranking — bounds any single sort task on spam-grade targets; 0 = single window (same result).",
    0, ParamValidators.gtEq(0))
  def getSaltBuckets: Int = get(saltBuckets)
  def setSaltBuckets(v: Int): AnchorTextRollup = set(saltBuckets, v)

  override def transform(inputs: DataFrame*): Array[DataFrame] = {
    require(inputs.size == 1)
    val tc = getTargetCol
    val o = getOutputCol
    val txtRaw = trim(col(getTextCol))
    val txt: Column = if (getLowercase) lower(txtRaw) else txtRaw

    val counts = inputs.head
      .where(col(tc).isNotNull && txt.isNotNull && txt =!= "")
      .groupBy(col(tc), txt.as(s"${o}_text"))
      .agg(count(lit(1)).as(s"${o}_count"))
      .where(col(s"${o}_count") >= getMinCount)

    val order = Seq(col(s"${o}_count").desc, col(s"${o}_text").asc)
    val pruned =
      if (getSaltBuckets > 0) {
        // the salted local top-k: every global top-k row ranks <= k in
        // its own bucket too, so the final window sees the same winners
        val localW = Window
          .partitionBy(col(tc), pmod(xxhash64(col(s"${o}_text")), lit(getSaltBuckets)))
          .orderBy(order: _*)
        counts.withColumn("__atr_lr", row_number().over(localW))
          .where(col("__atr_lr") <= getTopK)
          .drop("__atr_lr")
      } else counts

    val w = Window.partitionBy(col(tc)).orderBy(order: _*)
    Array(pruned
      .withColumn(s"${o}_rank", row_number().over(w))
      .where(col(s"${o}_rank") <= getTopK))
  }
}

object AnchorTextRollup extends StageLoader[AnchorTextRollup] {
  def load(spark: SparkSession, path: String): AnchorTextRollup =
    ReadWrite.applyParams(new AnchorTextRollup, path)
}
