package graft.text

import graft.SparkSpec

class MainContentExtractorSpec extends SparkSpec {

  private def extract(html: String, minLen: Int = 10, goodLen: Int = 60,
      maxLd: Double = 0.33): (String, Long, Long) = {
    import spark.implicits._
    val out = new MainContentExtractor().setIdCol("id")
      .setInputCol("html").setOutputCol("mc")
      .setMinTextLen(minLen).setGoodTextLen(goodLen).setMaxLinkDensity(maxLd)
      .transform(Seq((1L, html)).toDF("id", "html")).head
      .select("mc_text", "mc_kept", "mc_blocks").head()
    (out.getString(0), out.getLong(1), out.getLong(2))
  }

  private val para1 = "This is the first real paragraph of the article body, " +
    "long enough to clear the good-text threshold comfortably."
  private val para2 = "And here is the second real paragraph, also clearly " +
    "long enough to be classified as content on its own merits."

  test("nav and footer link farms drop, long paragraphs survive") {
    val html = s"""<html><body>
      |<div class="nav"><a href="/">Home</a> <a href="/a">About</a> <a href="/c">Contact</a></div>
      |<p>$para1</p>
      |<p>$para2</p>
      |<div class="footer"><a href="/tos">Terms</a> · <a href="/p">Privacy</a></div>
      |</body></html>""".stripMargin
    val (text, kept, blocks) = extract(html)
    assert(text == s"$para1\n$para2")
    assert(kept == 2 && blocks == 4)
  }

  test("short block between two good paragraphs is kept; edge shorts drop") {
    val html = s"<h1>Title of page</h1><p>$para1</p>" +
      s"<p>Short connective note.</p><p>$para2</p><div>© 2026 Example Corp</div>"
    val (text, kept, _) = extract(html)
    // heading (before any good) and copyright (after the last good)
    // drop; the connective short between goods survives
    assert(text == s"$para1\nShort connective note.\n$para2")
    assert(kept == 3)
  }

  test("crumbs below minTextLen never rescue, even between goods") {
    val html = s"<p>$para1</p><p>»</p><p>$para2</p>"
    val (text, kept, _) = extract(html)
    assert(text == s"$para1\n$para2")
    assert(kept == 2)
  }

  test("link density uses anchor-text share, not anchor count") {
    // one link whose text dominates a short block -> bad; the same
    // link inside a long paragraph -> good (density diluted)
    val linky = "<p><a href='/x'>click here now</a> ok</p>"
    assert(extract(linky)._2 == 0)
    val diluted = s"<p>$para1 <a href='/x'>source</a></p>"
    val (text, kept, _) = extract(diluted)
    assert(kept == 1 && text == s"$para1 source")
  }

  test("script/style/comment bodies fabricate no blocks; entities decode") {
    val html = "<script>var x = 'not content at all, however long it is';</script>" +
      "<style>.a { color: red; }</style><!-- hidden comment text -->" +
      s"<p>Tom &amp; Jerry &lt;3 the article body, which runs long enough " +
      "to be good content here.</p>"
    val (text, kept, blocks) = extract(html)
    assert(kept == 1 && blocks == 1)
    assert(text.startsWith("Tom & Jerry <3 the article body"))
  }

  test("empty, null and all-boilerplate docs keep their row with empty text") {
    import spark.implicits._
    val df = Seq(
      (1L, "<div><a href='/a'>only</a> <a href='/b'>links</a></div>"),
      (2L, ""),
      (3L, null.asInstanceOf[String])).toDF("id", "html")
    val out = new MainContentExtractor().setIdCol("id")
      .setInputCol("html").setOutputCol("mc").transform(df).head
    assert(out.count() == 3)
    val rows = out.select("id", "mc_text", "mc_kept").collect()
      .map(r => r.getLong(0) -> (r.getString(1), r.getLong(2))).toMap
    assert(rows(1L) == ("", 0L) && rows(2L) == ("", 0L) && rows(3L) == ("", 0L))
  }

  test("blocks stay in document order through the rollup") {
    val parts = (0 until 5).map(i =>
      s"Paragraph number $i of the ordered body, padded until it is " +
      "definitely long enough to pass the good threshold.")
    val html = parts.map(p => s"<p>$p</p>").mkString
    val (text, kept, _) = extract(html)
    assert(kept == 5)
    assert(text == parts.mkString("\n"))
  }

  test("guards and param save/load") {
    import spark.implicits._
    intercept[IllegalArgumentException] {
      new MainContentExtractor().setIdCol("id").setInputCol("h")
        .setOutputCol("o").setMinTextLen(100).setGoodTextLen(50)
        .transform(Seq((1L, "<p>x</p>")).toDF("id", "h"))
    }
    val d = java.nio.file.Files.createTempDirectory("mce").toString
    new MainContentExtractor().setIdCol("doc").setInputCol("h")
      .setOutputCol("o").setMinTextLen(5).setGoodTextLen(80)
      .setMaxLinkDensity(0.5).save(d)
    val m = MainContentExtractor.load(spark, d)
    assert(m.getIdCol == "doc" && m.getInputCol == "h" && m.getOutputCol == "o" &&
      m.getMinTextLen == 5 && m.getGoodTextLen == 80 && m.getMaxLinkDensity == 0.5)
  }
}
