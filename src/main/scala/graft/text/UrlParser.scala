package graft.text

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.api.{StageLoader, Transformer}
import graft.param._
import graft.util.ReadWrite

/**
 * URL decomposition + domain-level filtering for crawl curation —
 * per-domain mixing weights, URL-level dedup keys, and blocklist
 * filtering all start from these columns. Emits for input URL u:
 *
 *  - `<o>_scheme` (lowercased), `<o>_host` (lowercased, userinfo and
 *    port stripped), `<o>_domain` (the last two dot-labels of the
 *    host — a naive registrable-domain heuristic: co.uk-style public
 *    suffixes need a suffix list, deliberately out of scope),
 *    `<o>_path`, `<o>_query` (empty string when absent);
 *  - `<o>_blocked`: true when `<o>_domain` is in `blockedDomains`
 *    (exact match, case-insensitive) — the filter decision stays a
 *    column so callers can count/inspect before dropping.
 *
 * Pure in-row regexp Column math (RE2-compatible patterns — no
 * backreferences/lookahead), zero shuffle, zero UDF; the blocklist is
 * a literal array membership test (use BloomDecontaminator for
 * million-entry lists).
 */
class UrlParser extends Transformer[UrlParser]
    with HasInputCol[UrlParser] with HasOutputCol[UrlParser] {

  final val blockedDomains: Param[Array[String]] = param[Array[String]](
    "blockedDomains", "Domains (last-two-label form) to flag as blocked",
    Array.empty[String])
  def getBlockedDomains: Array[String] = get(blockedDomains)
  def setBlockedDomains(v: String*): UrlParser = set(blockedDomains, v.toArray)

  override def transform(inputs: DataFrame*): Array[DataFrame] = {
    require(inputs.size == 1)
    val u = col(getInputCol)
    val o = getOutputCol

    val scheme = lower(regexp_extract(u, "^([A-Za-z][A-Za-z0-9+.-]*)://", 1))
    val rawAuthority = regexp_extract(u, "^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)", 1)
    // strip userinfo (everything through the last '@') and the port
    val host = lower(regexp_replace(
      regexp_replace(rawAuthority, "^.*@", ""), ":[0-9]*$", ""))
    val domain = regexp_extract(host, "([^.]+\\.[^.]+)$", 1)
    val path = regexp_extract(u, "^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^?#]*)", 1)
    val query = regexp_extract(u, "\\?([^#]*)", 1)

    val blockLit = array(getBlockedDomains.map(d => lit(d.toLowerCase)): _*)
    val blocked =
      if (getBlockedDomains.isEmpty) lit(false)
      else array_contains(blockLit, domain)

    Array(inputs.head
      .withColumn(s"${o}_scheme", scheme)
      .withColumn(s"${o}_host", host)
      .withColumn(s"${o}_domain", domain)
      .withColumn(s"${o}_path", path)
      .withColumn(s"${o}_query", query)
      .withColumn(s"${o}_blocked", blocked))
  }
}

object UrlParser extends StageLoader[UrlParser] {
  def load(spark: SparkSession, path: String): UrlParser =
    ReadWrite.applyParams(new UrlParser, path)
}
