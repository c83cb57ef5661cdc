package graft.text

import graft.SparkSpec

class HtmlExtractorSpec extends SparkSpec {

  private def stage = new HtmlExtractor().setInputCol("html").setOutputCol("h")

  private def extract(html: String): (String, String, Int) = {
    import spark.implicits._
    val r = stage.transform(Seq(html).toDF("html")).head
      .select("h_title", "h_text", "h_links").head()
    (r.getString(0), r.getString(1), r.getInt(2))
  }

  test("title, visible text, and link count from a full page") {
    val (title, text, links) = extract(
      """<html><head><title>My Page</title>
        |<style>body { color: red; }</style>
        |<script>var x = "<p>not text</p>";</script></head>
        |<body><h1>Hello</h1><p>world &amp; friends</p>
        |<!-- a comment with <b>tags</b> -->
        |<a href="/x">one</a> <A HREF="/y">two</A></body></html>""".stripMargin)
    assert(title == "My Page")
    assert(text == "My Page Hello world & friends one two")
    assert(links == 2)
  }

  test("entity decoding: &amp; decodes last, so &amp;lt; stays literal") {
    val (_, text, _) = extract("<p>a &lt; b &gt; c &quot;d&quot; &#39;e&#39;&nbsp;f &amp;lt;</p>")
    assert(text == "a < b > c \"d\" 'e' f &lt;")
  }

  test("script spanning lines and case-insensitive tags are stripped") {
    val (_, text, links) = extract(
      "<SCRIPT>\nfunction f() {\n return 1 < 2;\n}\n</SCRIPT><P>kept</P>")
    assert(text == "kept")
    assert(links == 0)
  }

  test("plain text passes through; empty title when absent") {
    val (title, text, _) = extract("just words, no markup")
    assert(title == "" && text == "just words, no markup")
  }

  test("zero-shuffle plan (no Exchange)") {
    import spark.implicits._
    val plan = stage.transform(Seq("<p>x</p>").toDF("html")).head
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan)
  }

  test("param save/load round-trip") {
    val dir = tmpDir()
    stage.setInputCol("raw").setOutputCol("page").save(dir)
    val back = HtmlExtractor.load(spark, dir)
    assert(back.getInputCol == "raw" && back.getOutputCol == "page")
  }
}
