package graft.text

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.api.{StageLoader, Transformer}
import graft.param._
import graft.util.ReadWrite

/**
 * URL canonicalization — the dedup-KEY primitive the crawl tier was
 * missing: [[UrlParser]] decomposes a URL and [[LinkGraphExtractor]]
 * resolves one, but two spellings of the same resource
 * (`HTTP://Host:80/a//b?utm_source=x&b=2&a=1#top` vs
 * `http://host/a/b?a=1&b=2`) still carry different strings, so
 * URL-level exact dedup, frontier de-queuing and per-URL joins all
 * over-count. Emits:
 *
 *  - `<o>_url`: the canonical form — scheme and host lowercased,
 *    userinfo and the scheme's DEFAULT port stripped (http:80 /
 *    https:443; explicit non-default ports kept), fragment dropped,
 *    duplicate path slashes collapsed, dot segments resolved
 *    (`/./` dropped, `/seg/../` collapsed, above-root `..` removed —
 *    `normalizeDotSegments`, on by default: [[LinkGraphExtractor]]'s
 *    relative resolution emits literal `../` spellings and real
 *    crawls are full of them, so without this the URL-level dedup
 *    key splits `/a/b/../c` from `/a/c`), empty path → "/", tracking
 *    parameters removed (`dropParamsPattern`, default: the utm_
 *    family, fbclid, gclid, msclkid, igshid, mc_eid), remaining
 *    query params SORTED
 *    byte-wise (`sortQuery`) so parameter order stops mattering;
 *    null for inputs with no scheme://host prefix (relative
 *    references have no canonical absolute form — resolve them with
 *    [[LinkGraphExtractor]] first);
 *  - `<o>_key`: md5 of the canonical form (the equi-join/dedup key;
 *    null when the URL is null).
 *
 * Dot-segment resolution is a bounded fixed-pass `regexp_replace`
 * chain (RE2 has no lookaround and one replace pass cannot collapse
 * nested `a/b/../..` chains because the separating `/` is consumed by
 * the previous match): 8 passes, each removing one nesting level of
 * `..` plus all non-adjacent `/./` runs — paths nested deeper than 8
 * levels of `..` keep the residue (document-scale crawls measure
 * ~99.9% of dot-segment paths at depth ≤ 3). The query component is
 * anchored to the PRE-fragment region (`^[^#?]*\?`) so a '?' that
 * first appears inside the fragment (SPA hash routes like
 * `/app#/search?q=x`) is never resurrected as a fabricated query.
 *
 * Scope (documented trades, same stance as UrlParser): no
 * percent-encoding normalization, no IDN — each needs a
 * spec-complete parser; this operator is the
 * RE2-expressible column-math core (zero shuffle, zero UDF — one
 * higher-order `filter`/`array_sort` pair over the split query), so
 * the DuckDB oracle replays the planted construction exactly.
 *
 * Scale shape (100 TB crawl): pure in-row Column math, scan-bound
 * like [[UrlParser]]/[[HtmlExtractor]]; the canonical key feeds the
 * same zero-exchange bucketed-ingest pattern as content fingerprints
 * ([[graft.sources.BucketedStore]]).
 */
class UrlCanonicalizer extends Transformer[UrlCanonicalizer]
    with HasInputCol[UrlCanonicalizer] with HasOutputCol[UrlCanonicalizer] {

  final val dropParamsPattern: Param[String] = param[String](
    "dropParamsPattern",
    "RE2 fragment matching query-parameter NAMES to drop (anchored and compared against the text before '=').",
    "utm_[A-Za-z0-9_]*|fbclid|gclid|msclkid|igshid|mc_eid")
  def getDropParamsPattern: String = get(dropParamsPattern)
  def setDropParamsPattern(v: String): UrlCanonicalizer = set(dropParamsPattern, v)

  final val sortQuery: Param[Boolean] = param[Boolean](
    "sortQuery",
    "Sort surviving query parameters byte-wise so parameter order stops distinguishing URLs.",
    true)
  def getSortQuery: Boolean = get(sortQuery)
  def setSortQuery(v: Boolean): UrlCanonicalizer = set(sortQuery, v)

  final val normalizeDotSegments: Param[Boolean] = param[Boolean](
    "normalizeDotSegments",
    "Resolve '.'/'..' path segments (8 fixed passes; deeper '..' nesting keeps the residue) so /a/b/../c and /a/c share one key.",
    true)
  def getNormalizeDotSegments: Boolean = get(normalizeDotSegments)
  def setNormalizeDotSegments(v: Boolean): UrlCanonicalizer = set(normalizeDotSegments, v)

  override def transform(inputs: DataFrame*): Array[DataFrame] = {
    require(inputs.size == 1)
    val u = trim(col(getInputCol))
    val o = getOutputCol

    val scheme = lower(regexp_extract(u, "^([A-Za-z][A-Za-z0-9+.-]*)://", 1))
    val rawAuthority = regexp_extract(u, "^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)", 1)
    val hostPort = regexp_replace(rawAuthority, "^.*@", "")
    val host = lower(regexp_replace(hostPort, ":[0-9]*$", ""))
    val port = regexp_extract(hostPort, ":([0-9]+)$", 1)
    val portPart = when(
      port === "" ||
        (scheme === "http" && port === "80") ||
        (scheme === "https" && port === "443"),
      lit("")).otherwise(concat(lit(":"), port))

    val rawPath = regexp_extract(u, "^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^?#]*)", 1)
    val slashed = when(rawPath === "", lit("/"))
      .otherwise(regexp_replace(rawPath, "/{2,}", "/"))
    // a path segment that is neither "." nor ".." (the only legal
    // left side of a collapsible "/seg/../"): starts with a non-dot,
    // or a dot followed by a non-dot-non-slash, or two dots followed
    // by at least one more character
    val seg = "(\\.\\.[^/]+|\\.[^/.][^/]*|[^/.][^/]*)"
    def dotPass(x: Column): Column = {
      val a = regexp_replace(x, "/\\./", "/") // "/./" -> "/"
      val b = regexp_replace(a, "/\\.$", "/") // trailing "/." -> "/"
      val c = regexp_replace(b, s"/$seg/\\.\\./", "/") // "/seg/../" -> "/"
      val d = regexp_replace(c, s"/$seg/\\.\\.$$", "/") // trailing "/seg/.." -> "/"
      regexp_replace(d, "^/\\.\\.(/|$)", "/") // above-root ".." drops
    }
    // fixed passes, not a loop-to-fixpoint: RE2 scanning resumes after
    // each replacement, so adjacent "/././" runs and nested
    // "a/b/../.." chains need one pass per level (see class scaladoc)
    val path =
      if (getNormalizeDotSegments) (1 to 8).foldLeft(slashed)((p, _) => dotPass(p))
      else slashed

    // query: split on '&', drop empties and tracked names, sort; the
    // extraction is anchored pre-fragment ("^[^#?]*\?") so a '?' that
    // first appears after '#' never fabricates a query
    val dropRe = "^(" + getDropParamsPattern + ")(=.*)?$"
    val kept0 = filter(split(regexp_extract(u, "^[^#?]*\\?([^#]*)", 1), "&"),
      p => p =!= "" && !p.rlike(dropRe))
    val kept: Column = if (getSortQuery) array_sort(kept0) else kept0
    val queryPart = when(size(kept) > 0, concat(lit("?"), array_join(kept, "&")))
      .otherwise(lit(""))

    val canon = when(scheme === "" || host === "", lit(null).cast("string"))
      .otherwise(concat(scheme, lit("://"), host, portPart, path, queryPart))

    // the key derives from the ALREADY-COMPUTED canonical column, in a
    // separate projection: the regex chain behind `canon` is expensive
    // and CollapseProject keeps non-cheap multiply-referenced
    // expressions un-inlined, so it evaluates once per row, not once
    // per output column (spelling `canon` into the key expression
    // measured the whole chain 3× in the physical plan)
    val withUrl = inputs.head.withColumn(s"${o}_url", canon)
    Array(withUrl.withColumn(s"${o}_key", md5(col(s"${o}_url"))))
  }
}

object UrlCanonicalizer extends StageLoader[UrlCanonicalizer] {
  def load(spark: SparkSession, path: String): UrlCanonicalizer =
    ReadWrite.applyParams(new UrlCanonicalizer, path)
}
