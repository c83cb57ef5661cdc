package graft.text

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.api.{StageLoader, Transformer}
import graft.param._
import graft.util.ReadWrite

/**
 * Sitemap extraction — the third crawl-control surface next to
 * [[RobotsTxtParser]] (what may be fetched) and
 * [[LinkGraphExtractor]] (what pages link to): sitemaps.org XML
 * documents become one row per entry, feeding the frontier the URLs
 * a site ASKS to have crawled, with freshness metadata. Handles both
 * urlset files (`<url>` entries) and sitemap INDEX files
 * (`<sitemap>` entries pointing at child sitemaps — the recursion is
 * the caller's fetch loop, not this operator's). No reference
 * counterpart — beyond-reference crawl tier.
 *
 * Output, one row per entry (entry order preserved within a kind;
 * `<url>` rows emit before `<sitemap>` rows for the same document):
 *  - `<o>_kind`: "url" (urlset entry) | "sitemap" (index entry);
 *  - `<o>_loc`: the entry's location, whitespace-trimmed (rows whose
 *    block carries no non-empty `<loc>` are DROPPED — a location-less
 *    entry identifies nothing);
 *  - `<o>_lastmod`: the `<lastmod>` value as written (W3C datetime,
 *    left as a string — parse downstream with to_timestamp when the
 *    precision matters), null when absent;
 *  - `<o>_changefreq`: null when absent;
 *  - `<o>_priority`: cast to double, null when absent/unparseable.
 *
 * Scope (documented trades, same stance as the other regex
 * extractors): a REGEX extractor, not an XML parser — no namespace
 * resolution, no CDATA, no entity decode beyond what the URL tier
 * tolerates; tags matched case-sensitively lowercase as the protocol
 * specifies. All patterns RE2-compatible (non-greedy block capture
 * under `(?s)`), so the DuckDB oracle replays planted constructions
 * exactly. Scan-shaped: in-row regexp math + one explode, zero
 * shuffle, zero UDF.
 */
class SitemapExtractor extends Transformer[SitemapExtractor]
    with HasInputCol[SitemapExtractor] with HasOutputCol[SitemapExtractor] {

  override def transform(inputs: DataFrame*): Array[DataFrame] = {
    require(inputs.size == 1)
    val x = coalesce(col(getInputCol), lit(""))
    val o = getOutputCol

    // functions.transform must be qualified: the class's own
    // transform(DataFrame*) member shadows the imported higher-order
    // function inside this scope
    def hof(arr: org.apache.spark.sql.Column,
        f: org.apache.spark.sql.Column => org.apache.spark.sql.Column) =
      org.apache.spark.sql.functions.transform(arr, f)
    val urlBlocks = regexp_extract_all(x, lit("(?s)<url>(.*?)</url>"), lit(1))
    val mapBlocks = regexp_extract_all(x, lit("(?s)<sitemap>(.*?)</sitemap>"), lit(1))
    val tagged = concat(
      hof(urlBlocks, b => struct(lit("url").as("kind"), b.as("block"))),
      hof(mapBlocks, b => struct(lit("sitemap").as("kind"), b.as("block"))))

    def tag(name: String) = {
      val v = trim(regexp_extract(col("__sm.block"), s"(?s)<$name>(.*?)</$name>", 1))
      when(v === "", lit(null).cast("string")).otherwise(v)
    }
    val out = inputs.head
      .withColumn("__sm", explode(tagged))
      .withColumn(s"${o}_kind", col("__sm.kind"))
      .withColumn(s"${o}_loc", tag("loc"))
      .withColumn(s"${o}_lastmod", tag("lastmod"))
      .withColumn(s"${o}_changefreq", tag("changefreq"))
      .withColumn(s"${o}_priority", tag("priority").try_cast("double"))
      .drop("__sm")
      .where(col(s"${o}_loc").isNotNull)
    Array(out)
  }
}

object SitemapExtractor extends StageLoader[SitemapExtractor] {
  def load(spark: SparkSession, path: String): SitemapExtractor =
    ReadWrite.applyParams(new SitemapExtractor, path)
}
