package graft.text

import graft.SparkSpec
import org.apache.spark.sql.functions._

class WarcParserSpec extends SparkSpec {

  private val crlf = "\r\n"
  private val warc =
    "WARC/1.0" + crlf +
      "WARC-Type: warcinfo" + crlf +
      "WARC-Date: 2026-03-01T00:00:00Z" + crlf + crlf +
      "software: graft-crawler" + crlf + crlf +
      "WARC/1.0" + crlf +
      "WARC-Type: request" + crlf +
      "WARC-Target-URI: <https://ex.com/a>" + crlf + crlf +
      "GET /a HTTP/1.1" + crlf + "Host: ex.com" + crlf + crlf +
      crlf +
      "WARC/1.1" + crlf +
      "WARC-Type: response" + crlf +
      "WARC-Target-URI: https://ex.com/a" + crlf +
      "WARC-Date: 2026-03-01T00:00:01Z" + crlf + crlf +
      "HTTP/1.1 200 OK" + crlf + "Content-Type: text/html" + crlf + crlf +
      "<html><a href=\"/b\">b</a></html>" + crlf + crlf

  private def parse(x: String) = {
    import spark.implicits._
    new WarcParser().setInputCol("warc").setOutputCol("w")
      .transform(Seq(x).toDF("warc")).head
      .orderBy("w_pos")
      .select("w_pos", "w_type", "w_uri", "w_date", "w_payload", "w_body")
      .collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getString(3),
        r.getString(4), r.getString(5)))
      .toSeq
  }

  test("record walk: types, angle-bracket URI strip, dates, payloads, HTTP bodies") {
    val got = parse(warc)
    assert(got.map(_._1) == Seq(1, 2, 3)) // file order, 1-based
    assert(got(0)._2 == "warcinfo" && got(0)._3 == null &&
      got(0)._4 == "2026-03-01T00:00:00Z")
    assert(got(0)._5 == "software: graft-crawler")
    // non-HTTP payload: body == payload
    assert(got(0)._6 == got(0)._5)
    // request record: <...> wrapping stripped, body after HTTP headers
    assert(got(1)._2 == "request" && got(1)._3 == "https://ex.com/a")
    assert(got(1)._5.startsWith("GET /a HTTP/1.1") && got(1)._6 == "")
    // response record (WARC/1.1 marker): the HTML body extracted
    assert(got(2)._2 == "response" && got(2)._4 == "2026-03-01T00:00:01Z")
    assert(got(2)._6 == "<html><a href=\"/b\">b</a></html>")
  }

  test("composes downstream: response bodies feed LinkGraphExtractor") {
    import spark.implicits._
    val parsed = new WarcParser().setInputCol("warc").setOutputCol("w")
      .transform(Seq(warc).toDF("warc")).head
      .where(col("w_type") === "response")
      .select(col("w_uri").as("url"), col("w_body").as("html"))
    val links = new LinkGraphExtractor()
      .setInputCol("html").setUrlCol("url").setOutputCol("lk")
      .transform(parsed).head.collect()
    assert(links.length == 1 &&
      links.head.getAs[String]("lk_url") == "https://ex.com/b")
  }

  test("empty/null/markerless input emits no rows; header case-insensitive") {
    import spark.implicits._
    val df = Seq("", null.asInstanceOf[String], "no markers here").toDF("warc")
    assert(new WarcParser().setInputCol("warc").setOutputCol("w")
      .transform(df).head.count() == 0)
    val lower = "WARC/1.0" + crlf + "warc-type: Response" + crlf + crlf + "x"
    assert(parse(lower) == Seq((1, "response", null, null, "x", "x")))
  }

  test("HTTP status and media type: extracted, scoped to the header block") {
    import spark.implicits._
    val x =
      "WARC/1.0" + crlf + "WARC-Type: response" + crlf + crlf +
        "HTTP/1.1 301 Moved Permanently" + crlf +
        "Content-Type: TEXT/HTML; charset=UTF-8" + crlf + crlf +
        "<html>Content-Type: application/x-fake</html>" + crlf + crlf +
        "WARC/1.0" + crlf + "WARC-Type: response" + crlf + crlf +
        // headerless status line: body extraction works, no mime
        "HTTP/1.1 200" + crlf + crlf + "Content-Type: body text" + crlf + crlf +
        "WARC/1.0" + crlf + "WARC-Type: metadata" + crlf + crlf +
        "fetch: x" + crlf + crlf
    val got = new WarcParser().setInputCol("warc").setOutputCol("w")
      .transform(Seq(x).toDF("warc")).head
      .orderBy("w_pos")
      .select("w_status", "w_mime")
      .collect()
      .map(r => (if (r.isNullAt(0)) -1 else r.getInt(0), r.getString(1)))
      .toSeq
    // record 1: status + params-stripped lowercased mime; the body's
    // fake Content-Type does NOT shadow (header block scope)
    // record 2: status parses, no Content-Type header -> null mime
    // (the payload's "Content-Type:" line is BODY, not header)
    // record 3: non-HTTP payload -> both null
    assert(got == Seq((301, "text/html"), (200, null), (-1, null)))
  }

  test("param save/load round-trip") {
    val dir = java.nio.file.Files.createTempDirectory("warc").toString
    new WarcParser().setInputCol("x").setOutputCol("o").save(dir)
    val loaded = WarcParser.load(spark, dir)
    assert(loaded.getInputCol == "x" && loaded.getOutputCol == "o")
  }
}
