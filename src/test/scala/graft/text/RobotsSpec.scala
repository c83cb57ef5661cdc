package graft.text

import graft.SparkSpec
import org.apache.spark.sql.functions._

class RobotsSpec extends SparkSpec {

  private val robots =
    """# site rules
      |User-agent: googlebot
      |User-agent: bingbot
      |Disallow: /
      |Allow: /public/
      |
      |User-agent: *
      |Disallow: /private/
      |Allow: /private/ok/
      |Disallow:
      |disallow: /tmp/
      |""".stripMargin

  private def rules(agent: String): Set[(String, String)] = {
    import spark.implicits._
    val df = Seq(("h.com", robots)).toDF("host", "txt")
    new RobotsTxtParser().setInputCol("txt").setOutputCol("r").setUserAgent(agent)
      .transform(df).head
      .collect().map(r => (r.getAs[String]("r_rule"), r.getAs[String]("r_prefix"))).toSet
  }

  test("sections, shared user-agent headers, comments, empty Disallow, case-insensitive directives") {
    // default agent '*': only the wildcard section applies; the empty
    // Disallow emits nothing; 'disallow:' parses case-insensitively
    assert(rules("*") == Set(
      ("disallow", "/private/"), ("allow", "/private/ok/"), ("disallow", "/tmp/")))
    // googlebot and bingbot share the two-header section; per RFC 9309
    // §2.2.1 the '*' group is a FALLBACK, so a named agent does NOT
    // also inherit the wildcard section
    assert(rules("GoogleBot") == Set(
      ("disallow", "/"), ("allow", "/public/")))
    assert(rules("bingbot") == rules("googlebot"))
    // an agent named nowhere falls back to the wildcard section
    assert(rules("duckbot") == rules("*"))
  }

  test("RFC 9309 §2.2.1: wildcard rules cannot flip a named agent's verdict") {
    import spark.implicits._
    // specific group allows everything; wildcard group blocks /x — a
    // union would wrongly block /x for googlebot
    val txt = "User-agent: googlebot\nAllow: /\n\nUser-agent: *\nDisallow: /x"
    val df = Seq(("h.com", txt)).toDF("host", "txt")
    val got = new RobotsTxtParser().setInputCol("txt").setOutputCol("r")
      .setUserAgent("googlebot").transform(df).head
      .collect().map(r => (r.getAs[String]("r_rule"), r.getAs[String]("r_prefix"))).toSet
    assert(got == Set(("allow", "/")))
    // two sections naming the same agent still merge (duplicate-token
    // combine rule): the fallback exclusion only drops '*' sections
    val txt2 = "User-agent: googlebot\nDisallow: /a\n\nUser-agent: googlebot\nDisallow: /b"
    val got2 = new RobotsTxtParser().setInputCol("txt").setOutputCol("r")
      .setUserAgent("googlebot").transform(Seq(("h.com", txt2)).toDF("host", "txt")).head
      .collect().map(r => (r.getAs[String]("r_rule"), r.getAs[String]("r_prefix"))).toSet
    assert(got2 == Set(("disallow", "/a"), ("disallow", "/b")))
  }

  test("hosts without applicable sections or with null/empty robots emit no rules") {
    import spark.implicits._
    val df = Seq(
      ("a.com", "User-agent: googlebot\nDisallow: /x/"),
      ("b.com", null.asInstanceOf[String]),
      ("c.com", "")).toDF("host", "txt")
    val out = new RobotsTxtParser().setInputCol("txt").setOutputCol("r")
      .transform(df).head
    assert(out.count() == 0)
  }

  test("RobotsUrlFilter: longest prefix wins, allow wins ties, no-rule hosts allowed") {
    import spark.implicits._
    val rulesDf = Seq(
      ("h.com", "disallow", "/private/"),
      ("h.com", "allow", "/private/ok/"),
      ("h.com", "disallow", "/tmp/"),
      // a tie at equal length: allow must win
      ("h.com", "disallow", "/same/"),
      ("h.com", "allow", "/same2"),
      ("h.com", "disallow", "/same2")).toDF("host", "r_rule", "r_prefix")
    val urls = Seq(
      ("u1", "h.com", "/private/doc.html"),
      ("u2", "h.com", "/private/ok/doc.html"),
      ("u3", "h.com", "/tmp/x"),
      ("u4", "h.com", "/public/x"),
      ("u5", "h.com", "/same2/x"),
      ("u6", "other.org", "/private/x")).toDF("url", "host", "path")
    val got = new RobotsUrlFilter().setIdCol("url").setOutputCol("v")
      .transform(urls, rulesDf).head
      .collect().map(r => r.getAs[String]("url") ->
        (r.getAs[Boolean]("v_allowed"), r.getAs[String]("v_prefix"))).toMap
    assert(got("u1") == (false, "/private/"))
    assert(got("u2") == (true, "/private/ok/")) // longest prefix overrides
    assert(got("u3") == (false, "/tmp/"))
    assert(got("u4") == (true, null)) // no rule matched
    assert(got("u5") == (true, "/same2")) // equal-length tie -> allow
    assert(got("u6") == (true, null)) // host without rules
  }

  test("RFC 9309 §2.2.3 wildcards: '*' spans path runs, trailing '$' anchors, literals escape") {
    import spark.implicits._
    val rulesDf = Seq(
      ("h.com", "disallow", "/*.pdf$"),     // any .pdf, anchored
      ("h.com", "allow", "/pub/*.pdf$"),    // longer rule wins for /pub
      ("h.com", "disallow", "/a/*/c"),      // mid-path wildcard
      ("h.com", "disallow", "/exact$"),     // anchor: /exact only, not /exactly
      ("h.com", "disallow", "/dot.seg/"),   // '.' must match literally, not any char
      ("h.com", "disallow", "/pa$th/")      // mid-pattern '$' is a literal octet
    ).toDF("host", "r_rule", "r_prefix")
    val urls = Seq(
      ("p1", "h.com", "/files/report.pdf"),   // blocked by /*.pdf$
      ("p2", "h.com", "/files/report.pdf.html"), // $ anchor -> allowed
      ("p3", "h.com", "/pub/report.pdf"),     // allow rule longer -> allowed
      ("m1", "h.com", "/a/b/c/d"),            // blocked by /a/*/c
      ("m2", "h.com", "/a/c"),                // '*' may match empty? RFC: any run incl. empty -> /a//c no; path lacks /c after /a/ -> allowed
      ("x1", "h.com", "/exact"),              // blocked
      ("x2", "h.com", "/exactly"),            // allowed ($ anchor)
      ("d1", "h.com", "/dotXseg/y"),          // allowed: '.' escaped
      ("d2", "h.com", "/dot.seg/y"),          // blocked
      ("s1", "h.com", "/pa$th/z")             // blocked: literal mid '$'
    ).toDF("url", "host", "path")
    val got = new RobotsUrlFilter().setIdCol("url").setOutputCol("v")
      .transform(urls, rulesDf).head
      .collect().map(r => r.getAs[String]("url") -> r.getAs[Boolean]("v_allowed")).toMap
    assert(got == Map(
      "p1" -> false, "p2" -> true, "p3" -> true,
      "m1" -> false, "m2" -> true,
      "x1" -> false, "x2" -> true,
      "d1" -> true, "d2" -> false,
      "s1" -> false))
  }

  test("parser feeds filter end-to-end; Disallow: / blocks everything for the named agent") {
    import spark.implicits._
    val docs = Seq(("h.com", robots)).toDF("host", "txt")
    val ruleTable = new RobotsTxtParser().setInputCol("txt").setOutputCol("r")
      .setUserAgent("googlebot").transform(docs).head
    val urls = Seq(
      ("a", "h.com", "/anything"),
      ("b", "h.com", "/public/page.html")).toDF("url", "host", "path")
    val got = new RobotsUrlFilter().setIdCol("url").setOutputCol("v")
      .transform(urls, ruleTable).head
      .collect().map(r => r.getAs[String]("url") -> r.getAs[Boolean]("v_allowed")).toMap
    assert(got == Map("a" -> false, "b" -> true))
  }

  test("RobotsDirectives: sitemap document-scoped, crawl-delay group-scoped") {
    import spark.implicits._
    val txt =
      """Sitemap: https://h.com/top.xml
        |User-agent: googlebot
        |Crawl-delay: 2.5
        |Sitemap: https://h.com/inner.xml
        |
        |User-agent: *
        |Crawl-delay: 10
        |Crawl-delay: fast
        |""".stripMargin
    def run(agent: String) = new RobotsDirectives()
      .setInputCol("txt").setOutputCol("rd").setUserAgent(agent)
      .transform(Seq(("h.com", txt)).toDF("host", "txt")).head
      .collect().map(r => (r.getAs[String]("rd_kind"), r.getAs[String]("rd_value"),
        Option(r.getAs[java.lang.Double]("rd_delay")).map(_.toDouble))).toSet
    // named agent: both sitemap lines (document scope), ONLY its
    // group's delay; the wildcard group's delays don't union in
    assert(run("googlebot") == Set(
      ("sitemap", "https://h.com/top.xml", None),
      ("sitemap", "https://h.com/inner.xml", None),
      ("crawl-delay", "2.5", Some(2.5))))
    // unnamed agent: wildcard group's delays, garbage casts to null
    assert(run("otherbot") == Set(
      ("sitemap", "https://h.com/top.xml", None),
      ("sitemap", "https://h.com/inner.xml", None),
      ("crawl-delay", "10", Some(10.0)),
      ("crawl-delay", "fast", None)))
  }

  test("a recognized directive ends a consecutive User-agent run (RFC grammar)") {
    import spark.implicits._
    val txt = "User-agent: a\nCrawl-delay: 5\nUser-agent: b\nDisallow: /x"
    val df = Seq(("h.com", txt)).toDF("host", "txt")
    // the Disallow belongs to b's group only — a's group closed at
    // the Crawl-delay line, so a and b are NOT one shared section
    val rulesA = new RobotsTxtParser().setInputCol("txt").setOutputCol("r")
      .setUserAgent("a").transform(df).head.count()
    val rulesB = new RobotsTxtParser().setInputCol("txt").setOutputCol("r")
      .setUserAgent("b").transform(df).head
      .collect().map(r => (r.getAs[String]("r_rule"), r.getAs[String]("r_prefix"))).toSet
    assert(rulesA == 0)
    assert(rulesB == Set(("disallow", "/x")))
    // and the delay belongs to a's group only
    val delayA = new RobotsDirectives().setInputCol("txt").setOutputCol("rd")
      .setUserAgent("a").transform(df).head
      .collect().map(_.getAs[String]("rd_value")).toSeq
    val delayB = new RobotsDirectives().setInputCol("txt").setOutputCol("rd")
      .setUserAgent("b").transform(df).head.count()
    assert(delayA == Seq("5") && delayB == 0)
  }

  test("RobotsDirectives: empty docs and delay outside any group emit nothing") {
    import spark.implicits._
    val df = Seq(
      ("a.com", "Crawl-delay: 7\nsome junk"), // delay before any group: drops
      ("b.com", null.asInstanceOf[String]),
      ("c.com", "")).toDF("host", "txt")
    assert(new RobotsDirectives().setInputCol("txt").setOutputCol("rd")
      .transform(df).head.count() == 0)
  }

  test("param save/load round-trips for both stages") {
    val d1 = java.nio.file.Files.createTempDirectory("robotsp").toString
    new RobotsTxtParser().setInputCol("t").setHostCol("h").setOutputCol("o")
      .setUserAgent("mybot").save(d1)
    val p = RobotsTxtParser.load(spark, d1)
    assert(p.getInputCol == "t" && p.getHostCol == "h" &&
      p.getOutputCol == "o" && p.getUserAgent == "mybot")
    val d2 = java.nio.file.Files.createTempDirectory("robotsf").toString
    new RobotsUrlFilter().setIdCol("i").setHostCol("h").setPathCol("p")
      .setRuleCol("rr").setPrefixCol("rp").setOutputCol("o").save(d2)
    val f = RobotsUrlFilter.load(spark, d2)
    assert(f.getIdCol == "i" && f.getHostCol == "h" && f.getPathCol == "p" &&
      f.getRuleCol == "rr" && f.getPrefixCol == "rp" && f.getOutputCol == "o")
    val d3 = java.nio.file.Files.createTempDirectory("robotsd").toString
    new RobotsDirectives().setInputCol("t").setHostCol("h").setOutputCol("o")
      .setUserAgent("mybot").save(d3)
    val dd = RobotsDirectives.load(spark, d3)
    assert(dd.getInputCol == "t" && dd.getHostCol == "h" &&
      dd.getOutputCol == "o" && dd.getUserAgent == "mybot")
  }
}
