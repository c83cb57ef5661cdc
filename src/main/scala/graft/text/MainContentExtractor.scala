package graft.text

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.api.{StageLoader, Transformer}
import graft.param._
import graft.util.ReadWrite

/**
 * Main-content extraction — boilerplate/nav separation, the step
 * between [[HtmlExtractor]] (ALL visible text) and the quality
 * filters: a training pipeline wants the article body, not the nav
 * bar, the footer link farm or the "related stories" rail. The
 * block-classification shape follows the jusText family (Pomikálek,
 * "Removing boilerplate and duplicate content from web corpora",
 * 2011) and trafilatura's precision-first defaults: split the
 * document into BLOCK-level segments, score each block's text length
 * and link density, keep long low-link blocks, and let undecided
 * short blocks inherit their context. No reference counterpart —
 * beyond-reference LLM-data tier.
 *
 * Per-block rules (context-free):
 *  - tag-free text empty → the block is ignored entirely (it is not
 *    even a neighbor for the context pass);
 *  - link density (anchor-text chars / text chars) > `maxLinkDensity`
 *    → BAD (nav bars, footers, tag clouds);
 *  - text shorter than `minTextLen` → BAD (crumbs: "»", dates,
 *    button labels);
 *  - text at least `goodTextLen` → GOOD;
 *  - otherwise SHORT (undecided).
 * Context pass (one window over the document's non-empty blocks):
 * a SHORT block is kept iff its nearest non-SHORT neighbors on BOTH
 * sides exist and are GOOD — short connective text *between*
 * paragraphs survives; headings above the first paragraph, teasers
 * at the document edge and short footers below the last paragraph do
 * not. This is the conservative end of the jusText family: for
 * training data, dropping an occasional headline costs less than
 * keeping boilerplate (precision over recall — trafilatura's
 * favor_precision stance).
 *
 * Output (one column set appended to the input row):
 *  - `<o>_text`: kept blocks in document order, joined with '\n'
 *    (empty string when nothing survives);
 *  - `<o>_kept` / `<o>_blocks`: kept vs total non-empty block counts
 *    (a kept/blocks ratio near 0 is itself a quality signal — link
 *    farms keep nothing).
 *
 * Shape: scan → posexplode(split on block tags) → in-row regexp
 * stats → two window passes per document → one groupBy(id) rollup →
 * one join back on `idCol`. All RE2-expressible and
 * window-deterministic (block position orders every window), so the
 * DuckDB oracle replays planted constructions closed-form. The html
 * payload never rides the block fan-out — blocks carry only
 * (id, pos, text, class). Windows partition per document, so a
 * document's size (not the corpus) bounds any task.
 */
class MainContentExtractor extends Transformer[MainContentExtractor]
    with HasInputCol[MainContentExtractor] with HasOutputCol[MainContentExtractor] {

  final val idCol: Param[String] = param[String](
    "idCol", "Unique row key (block rollups join back on it).", "id")
  def getIdCol: String = get(idCol)
  def setIdCol(v: String): MainContentExtractor = set(idCol, v)

  final val minTextLen: Param[Int] = param[Int](
    "minTextLen", "Blocks with less tag-free text than this are boilerplate crumbs.", 10)
  def getMinTextLen: Int = get(minTextLen)
  def setMinTextLen(v: Int): MainContentExtractor = set(minTextLen, v)

  final val goodTextLen: Param[Int] = param[Int](
    "goodTextLen", "Blocks with at least this much tag-free text are content.", 60)
  def getGoodTextLen: Int = get(goodTextLen)
  def setGoodTextLen(v: Int): MainContentExtractor = set(goodTextLen, v)

  final val maxLinkDensity: Param[Double] = param[Double](
    "maxLinkDensity", "Blocks whose anchor-text share exceeds this are boilerplate.", 0.33)
  def getMaxLinkDensity: Double = get(maxLinkDensity)
  def setMaxLinkDensity(v: Double): MainContentExtractor = set(maxLinkDensity, v)

  /** Block-level elements whose tags delimit segments — the jusText
    * segmentation set (a/b/i/span etc. stay INLINE so anchor text
    * keeps its block context for the link-density score). */
  private val BlockTags =
    "p|div|h[1-6]|li|ul|ol|dl|dt|dd|td|th|tr|table|thead|tbody|" +
    "section|article|main|header|footer|nav|aside|blockquote|pre|" +
    "figure|figcaption|form|fieldset|hr|br"

  private def entityDecode(c: Column): Column = Seq(
    "&lt;" -> "<", "&gt;" -> ">", "&quot;" -> "\"",
    "&#39;" -> "'", "&nbsp;" -> " ", "&amp;" -> "&")
    .foldLeft(c) { case (acc, (from, to)) => replace(acc, lit(from), lit(to)) }

  override def transform(inputs: DataFrame*): Array[DataFrame] = {
    require(inputs.size == 1)
    require(getMinTextLen <= getGoodTextLen,
      s"minTextLen (${getMinTextLen}) must be <= goodTextLen (${getGoodTextLen})")
    val o = getOutputCol
    val id = getIdCol

    // script/style/comment strip BEFORE block split: their bodies are
    // not visible text and must not fabricate blocks
    val noScript = regexp_replace(coalesce(col(getInputCol), lit("")),
      "(?is)<script[^>]*>.*?</script>", " ")
    val noStyle = regexp_replace(noScript, "(?is)<style[^>]*>.*?</style>", " ")
    val cleaned = regexp_replace(noStyle, "(?s)<!--.*?-->", " ")

    val blocks = inputs.head
      .select(col(id).as("__id"), cleaned.as("__html"))
      .select(col("__id"), posexplode(split(col("__html"),
        s"(?i)</?(?:$BlockTags)\\b[^>]*>")).as(Seq("__pos", "__blk")))

    // per-block stats: tag-free text (entity-decoded, whitespace
    // collapsed) and the anchor-text share of it
    val txt = trim(regexp_replace(entityDecode(
      regexp_replace(col("__blk"), "<[^>]*>", " ")), "\\s+", " "))
    val anchorTxt = trim(regexp_replace(entityDecode(regexp_replace(
      array_join(regexp_extract_all(col("__blk"),
        lit("(?is)<a\\b[^>]*>(.*?)</a>"), lit(1)), " "),
      "<[^>]*>", " ")), "\\s+", " "))
    // empty segments become a CLASS instead of a filter: a where()
    // here would be pushed below the projection and re-evaluate the
    // whole regex chain per row (the CollapseProject lesson); as a
    // class they ride the window as tiny rows and are skipped by the
    // ignoreNulls neighbor scan exactly like SHORT blocks
    val scored = blocks
      .withColumn("__txt", txt)
      .withColumn("__len", length(col("__txt")))
      .withColumn("__ld", when(col("__len") > 0,
        least(length(anchorTxt).cast("double") / col("__len"), lit(1.0))))
      .withColumn("__cls",
        when(col("__len") === 0, "empty")
          .when(col("__ld") > getMaxLinkDensity, "bad")
          .when(col("__len") < getMinTextLen, "bad")
          .when(col("__len") >= getGoodTextLen, "good")
          .otherwise("short"))

    // context pass: nearest BAD/GOOD class on each side (empties and
    // shorts are transparent); SHORT kept only between two GOODs
    val byDoc = Window.partitionBy(col("__id")).orderBy(col("__pos"))
    val decided = when(col("__cls") === "bad" || col("__cls") === "good",
      col("__cls"))
    val ctx = scored
      .withColumn("__prev", last(decided, ignoreNulls = true)
        .over(byDoc.rowsBetween(Window.unboundedPreceding, -1)))
      .withColumn("__next", first(decided, ignoreNulls = true)
        .over(byDoc.rowsBetween(1, Window.unboundedFollowing)))
      .withColumn("__keep", col("__cls") === "good" ||
        (col("__cls") === "short" &&
          col("__prev") === "good" && col("__next") === "good"))

    val rolled = ctx.groupBy("__id").agg(
      sum(when(col("__keep"), 1).otherwise(0)).as(s"${o}_kept"),
      sum(when(col("__cls") =!= "empty", 1).otherwise(0)).as(s"${o}_blocks"),
      array_join(org.apache.spark.sql.functions.transform(
        array_sort(collect_list(when(col("__keep"),
          struct(col("__pos"), col("__txt"))))),
        (x: org.apache.spark.sql.Column) => x.getField("__txt")),
        "\n").as(s"${o}_text"))

    val out = inputs.head
      .join(rolled, col(id) === col("__id"), "left")
      .drop("__id")
      .withColumn(s"${o}_text", coalesce(col(s"${o}_text"), lit("")))
      .withColumn(s"${o}_kept", coalesce(col(s"${o}_kept"), lit(0L)))
      .withColumn(s"${o}_blocks", coalesce(col(s"${o}_blocks"), lit(0L)))
    Array(out)
  }
}

object MainContentExtractor extends StageLoader[MainContentExtractor] {
  def load(spark: SparkSession, path: String): MainContentExtractor =
    ReadWrite.applyParams(new MainContentExtractor, path)
}
