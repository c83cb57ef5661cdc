package graft.text

import graft.SparkSpec
import org.apache.spark.sql.functions._

class UrlCanonicalizerSpec extends SparkSpec {

  private def canon(urls: String*): Seq[String] = {
    import spark.implicits._
    val df = urls.toDF("url")
    new UrlCanonicalizer().setInputCol("url").setOutputCol("c")
      .transform(df).head
      .collect().map(_.getAs[String]("c_url")).toSeq
  }

  test("case, userinfo, default port, fragment, duplicate slashes, tracking params, param order") {
    val got = canon(
      "HTTPS://User:pw@WWW.News.Example.COM:443//a//b/c?utm_source=tw&b=2&a=1#frag")
    assert(got == Seq("https://www.news.example.com/a/b/c?a=1&b=2"))
  }

  test("two spellings of the same resource share one canonical form and key") {
    import spark.implicits._
    val df = Seq(
      "HTTP://Host:80/a//b?utm_source=x&b=2&a=1#top",
      "http://host/a/b?a=1&b=2").toDF("url")
    val out = new UrlCanonicalizer().setInputCol("url").setOutputCol("c")
      .transform(df).head.select("c_url", "c_key").distinct().collect()
    assert(out.length == 1)
    assert(out.head.getString(0) == "http://host/a/b?a=1&b=2")
    assert(out.head.getString(1) != null)
  }

  test("kept: non-default ports, empty path becomes /, non-tracked params, scheme variety") {
    assert(canon("https://h.org") == Seq("https://h.org/"))
    assert(canon("http://h.org:8080/x") == Seq("http://h.org:8080/x"))
    // https:80 is NOT that scheme's default — kept
    assert(canon("https://h.org:80/") == Seq("https://h.org:80/"))
    assert(canon("ftp://files.net:2121/pub?z=1&y=2&utm_campaign=c") ==
      Seq("ftp://files.net:2121/pub?y=2&z=1"))
  }

  test("query edge cases: all params dropped, empty fragments of query, sortQuery off") {
    assert(canon("https://h.org/p?fbclid=abc") == Seq("https://h.org/p"))
    assert(canon("https://h.org/p?&&a=1&") == Seq("https://h.org/p?a=1"))
    // a param named utm_x without '=' drops; 'utmost=1' must NOT (anchored name match)
    assert(canon("https://h.org/p?utm_x&utmost=1") == Seq("https://h.org/p?utmost=1"))
    import spark.implicits._
    val unsorted = new UrlCanonicalizer().setInputCol("url").setOutputCol("c")
      .setSortQuery(false)
      .transform(Seq("https://h.org/p?b=2&a=1").toDF("url")).head
      .collect().head.getAs[String]("c_url")
    assert(unsorted == "https://h.org/p?b=2&a=1")
  }

  test("dot segments: './' and '../' resolve; above-root '..' drops; deep nesting collapses") {
    assert(canon("https://h.org/a/b/../c") == Seq("https://h.org/a/c"))
    assert(canon("https://h.org/./x/./y") == Seq("https://h.org/x/y"))
    assert(canon("https://h.org/../../p") == Seq("https://h.org/p"))
    assert(canon("https://h.org/a/b/c/../../../d") == Seq("https://h.org/d"))
    assert(canon("https://h.org/a/..") == Seq("https://h.org/"))
    assert(canon("https://h.org/a/.") == Seq("https://h.org/a/"))
    assert(canon("https://h.org/a/././b/../c/..") == Seq("https://h.org/a/"))
    // dot-PREFIXED segments are ordinary segments, not dot segments
    assert(canon("https://h.org/..foo/.bar/x") == Seq("https://h.org/..foo/.bar/x"))
    assert(canon("https://h.org/..foo/../x") == Seq("https://h.org/x"))
    // the two spellings the dedup key exists to merge
    assert(canon("https://h.org/a/b/../c", "https://h.org/a/c").distinct.size == 1)
  }

  test("normalizeDotSegments=false keeps the literal spelling") {
    import spark.implicits._
    val got = new UrlCanonicalizer().setInputCol("url").setOutputCol("c")
      .setNormalizeDotSegments(false)
      .transform(Seq("https://h.org/a/b/../c").toDF("url")).head
      .collect().head.getAs[String]("c_url")
    assert(got == "https://h.org/a/b/../c")
  }

  test("a '?' first appearing inside the fragment never fabricates a query") {
    // SPA hash route: fragment-only variants must collapse to the bare path
    assert(canon("https://ex.com/app#/search?q=x") == Seq("https://ex.com/app"))
    assert(canon("https://ex.com/app#/search?q=x", "https://ex.com/app")
      .distinct.size == 1)
    // a real query before the fragment still survives
    assert(canon("https://ex.com/app?a=1#/search?q=x") == Seq("https://ex.com/app?a=1"))
  }

  test("relative references and garbage canonicalize to null (resolve first)") {
    import spark.implicits._
    val df = Seq("/a/b", "no scheme here", "mailto:x@y.z", "").toDF("url")
    val out = new UrlCanonicalizer().setInputCol("url").setOutputCol("c")
      .transform(df).head
    assert(out.where(col("c_url").isNull).count() == 4)
    assert(out.where(col("c_key").isNotNull).count() == 0)
  }

  test("param save/load round-trip") {
    val dir = java.nio.file.Files.createTempDirectory("urlcanon").toString
    new UrlCanonicalizer().setInputCol("u").setOutputCol("o")
      .setDropParamsPattern("sid").setSortQuery(false)
      .setNormalizeDotSegments(false).save(dir)
    val loaded = UrlCanonicalizer.load(spark, dir)
    assert(loaded.getInputCol == "u" && loaded.getOutputCol == "o" &&
      loaded.getDropParamsPattern == "sid" && !loaded.getSortQuery &&
      !loaded.getNormalizeDotSegments)
  }
}
