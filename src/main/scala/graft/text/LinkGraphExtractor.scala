package graft.text

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.api.{StageLoader, Transformer}
import graft.param._
import graft.util.ReadWrite

/**
 * Outlink extraction for web-crawl corpora — the producer side of the
 * graph tier: [[HtmlExtractor]] counts anchors, this operator EMITS
 * them, resolved against the page URL, so a crawl corpus can build
 * the link graph that [[graft.graph.PageRank]] /
 * [[graft.graph.LabelPropagation]] / ConnectedComponents consume
 * (Common Crawl's host-ranking shape; no reference counterpart —
 * beyond-reference LLM-data-pipeline tier).
 *
 * One output ROW per extracted anchor href (explode — never an array
 * column), with:
 *
 *  - `<o>_href`: the href exactly as written in the anchor tag;
 *  - `<o>_text`: the anchor's inner text (trimmed, up to the first
 *    nested markup — empty for image/markup-only anchors): the
 *    "what the web calls this page" relevance/quality signal,
 *    aggregated per target by `q_anchor_text`'s shape;
 *  - `<o>_url`: the href resolved to an absolute URL against the page
 *    URL (RFC 3986-lite, see below);
 *  - `<o>_host` / `<o>_domain`: the resolved URL's lowercased host and
 *    last-two-label registrable domain — the SAME expressions as
 *    [[UrlParser]], so page-side and link-side host keys agree.
 *
 * Resolution rules (in precedence order; `scheme`/`auth`/`dir` come
 * from the page URL — `auth` is the page authority LOWERCASED with
 * only userinfo stripped, so a non-default port survives resolution
 * and root/relative links on `https://ex.co:8443/` stay on that
 * origin):
 *  1. `scheme://...`      -> as written (absolute);
 *  2. `//host/...`        -> page scheme + ":" + href (protocol-relative);
 *  3. `/path`             -> scheme://auth + href (root-relative);
 *  4. `mailto:`/`tel:`... -> DROPPED (non-hierarchical scheme);
 *  5. "" or `#frag`       -> DROPPED (self-reference);
 *  6. anything else       -> scheme://auth + page-dir + href (relative).
 *
 * Scope (documented trades, same stance as HtmlExtractor/UrlParser):
 * a REGEX extractor, not an HTML5 parser — hrefs in single or double
 * quotes only (unquoted values skipped; an opening tag truncated
 * before its `>` is skipped too), no `<base href>` handling,
 * fragments kept verbatim in the resolved URL. Rule 6 concatenates
 * `dir + href` verbatim, so `../sibling` hrefs emit literal `..`
 * spellings — [[UrlCanonicalizer]] (dot-segment normalization on by
 * default) is the composition that resolves them into dedup keys.
 * All patterns are RE2-compatible (no
 * backreferences) so the DuckDB oracle replays them exactly.
 * Within one page, double-quoted anchors emit before single-quoted
 * ones (two extraction passes), not strict document order.
 *
 * Scale shape (100 TB crawl): pure in-row Column regexp math + one
 * explode — zero shuffle, zero UDF; outlink fan-out (~50/page) is the
 * only row growth, and the downstream host-edge aggregation
 * ([[LinkGraphExtractor.hostEdges]] + groupBy) is the first shuffle,
 * already reduced to O(distinct host pairs) by map-side combine.
 */
class LinkGraphExtractor extends Transformer[LinkGraphExtractor]
    with HasInputCol[LinkGraphExtractor] with HasOutputCol[LinkGraphExtractor] {

  final val urlCol: Param[String] =
    param[String]("urlCol", "Column holding the page's own absolute URL (resolution base).", "url")
  def getUrlCol: String = get(urlCol)
  def setUrlCol(v: String): LinkGraphExtractor = set(urlCol, v)

  final val keepUnresolved: Param[Boolean] =
    param[Boolean]("keepUnresolved",
      "Keep rows for dropped hrefs (mailto:/fragment-only) with a null resolved URL instead of filtering them.", false)
  def getKeepUnresolved: Boolean = get(keepUnresolved)
  def setKeepUnresolved(v: Boolean): LinkGraphExtractor = set(keepUnresolved, v)

  override def transform(inputs: DataFrame*): Array[DataFrame] = {
    require(inputs.size == 1)
    val html = col(getInputCol)
    val u = col(getUrlCol)
    val o = getOutputCol

    // page-URL decomposition: the exact UrlParser expressions, except
    // the resolution base keeps the page's PORT (only userinfo is
    // stripped) — links on https://ex.co:8443/ must resolve to that
    // origin, not the default-port one
    val scheme = lower(regexp_extract(u, "^([A-Za-z][A-Za-z0-9+.-]*)://", 1))
    val auth = lower(regexp_replace(
      regexp_extract(u, "^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)", 1),
      "^.*@", ""))
    val path = regexp_extract(u, "^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^?#]*)", 1)
    // directory of the page path: strip the last segment; empty -> "/"
    val dir = when(regexp_replace(path, "[^/]*$", "") === "", lit("/"))
      .otherwise(regexp_replace(path, "[^/]*$", ""))

    // hrefs + anchor TEXT from anchor tags, double-quoted pass then
    // single-quoted pass (two RE2-safe patterns — alternation with
    // multiple capture groups would need backreference-style
    // cleverness). Both columns come from the SAME pattern (group 1 =
    // href, group 2 = inner text up to the first markup), so the
    // per-anchor arrays stay aligned by construction; `[^>]*>`
    // requires the opening tag to close, which drops an `<a href`
    // truncated at end-of-payload (and `[^<]*` yields empty text for
    // anchors whose content opens with nested markup) — the regex
    // extractor's documented stance, not an HTML5 parser's.
    val pd = "(?i)<a\\s[^>]*href\\s*=\\s*\"([^\"]*)\"[^>]*>([^<]*)"
    val ps = "(?i)<a\\s[^>]*href\\s*=\\s*'([^']*)'[^>]*>([^<]*)"
    val hrefs = concat(
      regexp_extract_all(html, lit(pd), lit(1)),
      regexp_extract_all(html, lit(ps), lit(1)))
    val texts = concat(
      regexp_extract_all(html, lit(pd), lit(2)),
      regexp_extract_all(html, lit(ps), lit(2)))

    val withHref = inputs.head
      .withColumn("__lk", explode(arrays_zip(hrefs, texts)))
      .withColumn(s"${o}_href", col("__lk.0"))
      .withColumn(s"${o}_text", trim(col("__lk.1")))
      .drop("__lk")
    val h = col(s"${o}_href")

    val resolved =
      when(h.rlike("^[A-Za-z][A-Za-z0-9+.-]*://"), h)
        .when(h.rlike("^//"), concat(scheme, lit(":"), h))
        .when(h.rlike("^/"), concat(scheme, lit("://"), auth, h))
        .when(h.rlike("^[A-Za-z][A-Za-z0-9+.-]*:"), lit(null).cast("string"))
        .when(h === "" || h.rlike("^#"), lit(null).cast("string"))
        .otherwise(concat(scheme, lit("://"), auth, dir, h))

    val out = withHref.withColumn(s"${o}_url", resolved)
    val r = col(s"${o}_url")
    val dstHost = lower(regexp_replace(regexp_replace(
      regexp_extract(r, "^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)", 1),
      "^.*@", ""), ":[0-9]*$", ""))
    val full = out
      .withColumn(s"${o}_host", when(r.isNull, lit(null).cast("string")).otherwise(dstHost))
      .withColumn(s"${o}_domain",
        when(r.isNull, lit(null).cast("string"))
          .otherwise(regexp_extract(col(s"${o}_host"), "([^.]+\\.[^.]+)$", 1)))
    Array(if (getKeepUnresolved) full else full.where(r.isNotNull))
  }
}

object LinkGraphExtractor extends StageLoader[LinkGraphExtractor] {
  def load(spark: SparkSession, path: String): LinkGraphExtractor =
    ReadWrite.applyParams(new LinkGraphExtractor, path)

  /**
   * The host-level edge list a crawl link graph feeds to
   * PageRank/LPA/CC: one row per anchor, `(src_host, dst_host)`,
   * parallel edges KEPT (PageRank.run and LabelPropagation.run both
   * treat multiplicity as weight; `.distinct()` or
   * `groupBy.count()` at the call site if unweighted edges are
   * wanted). src_host uses the same UrlParser expressions as the
   * link side, so self-links resolve to genuine self-edges.
   */
  def hostEdges(pages: DataFrame, urlCol: String = "url",
      htmlCol: String = "html"): DataFrame = {
    val u = col(urlCol)
    val srcHost = lower(regexp_replace(regexp_replace(
      regexp_extract(u, "^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)", 1),
      "^.*@", ""), ":[0-9]*$", ""))
    new LinkGraphExtractor().setInputCol(htmlCol).setUrlCol(urlCol).setOutputCol("lk")
      .transform(pages).head
      .select(srcHost.as("src_host"), col("lk_host").as("dst_host"))
  }
}
