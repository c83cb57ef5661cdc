package graft.text

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SitemapExtractorSpec extends SparkSpec {

  private val urlset =
    """<?xml version="1.0" encoding="UTF-8"?>
      |<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">
      |  <url>
      |    <loc> https://ex.com/a </loc>
      |    <lastmod>2026-01-15</lastmod>
      |    <changefreq>daily</changefreq>
      |    <priority>0.8</priority>
      |  </url>
      |  <url><loc>https://ex.com/b</loc></url>
      |  <url><lastmod>2026-02-02</lastmod></url>
      |</urlset>""".stripMargin

  private val index =
    """<sitemapindex>
      |  <sitemap><loc>https://ex.com/sitemap1.xml</loc><lastmod>2026-03-01</lastmod></sitemap>
      |  <sitemap><loc>https://ex.com/sitemap2.xml</loc></sitemap>
      |</sitemapindex>""".stripMargin

  private def extract(xml: String) = {
    import spark.implicits._
    new SitemapExtractor().setInputCol("xml").setOutputCol("sm")
      .transform(Seq(xml).toDF("xml")).head
      .select("sm_kind", "sm_loc", "sm_lastmod", "sm_changefreq", "sm_priority")
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2),
        r.getString(3), Option(r.get(4)).map(_.asInstanceOf[Double])))
      .toSeq
  }

  test("urlset entries: loc trimmed, optional fields null, loc-less entry dropped") {
    assert(extract(urlset) == Seq(
      ("url", "https://ex.com/a", "2026-01-15", "daily", Some(0.8)),
      ("url", "https://ex.com/b", null, null, None)))
  }

  test("sitemap index entries carry kind = sitemap") {
    assert(extract(index) == Seq(
      ("sitemap", "https://ex.com/sitemap1.xml", "2026-03-01", null, None),
      ("sitemap", "https://ex.com/sitemap2.xml", null, null, None)))
  }

  test("mixed document emits url rows before sitemap rows; null/garbage input emits nothing") {
    val mixed = "<sitemap><loc>https://s.xml</loc></sitemap><url><loc>https://p</loc></url>"
    assert(extract(mixed).map(t => (t._1, t._2)) ==
      Seq(("url", "https://p"), ("sitemap", "https://s.xml")))
    assert(extract("").isEmpty)
    assert(extract("<html>not a sitemap</html>").isEmpty)
    import spark.implicits._
    val nullRow = new SitemapExtractor().setInputCol("xml").setOutputCol("sm")
      .transform(Seq(null.asInstanceOf[String]).toDF("xml")).head
    assert(nullRow.count() == 0)
  }

  test("unparseable priority casts to null, not an error") {
    val bad = "<url><loc>https://p</loc><priority>soon</priority></url>"
    assert(extract(bad) == Seq(("url", "https://p", null, null, None)))
  }

  test("param save/load round-trip") {
    val dir = java.nio.file.Files.createTempDirectory("sitemap").toString
    new SitemapExtractor().setInputCol("x").setOutputCol("o").save(dir)
    val loaded = SitemapExtractor.load(spark, dir)
    assert(loaded.getInputCol == "x" && loaded.getOutputCol == "o")
  }
}
