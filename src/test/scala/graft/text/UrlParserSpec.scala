package graft.text

import graft.SparkSpec

class UrlParserSpec extends SparkSpec {

  private def stage = new UrlParser().setInputCol("url").setOutputCol("u")

  private def parse(url: String) = {
    import spark.implicits._
    val r = stage.transform(Seq(url).toDF("url")).head
      .select("u_scheme", "u_host", "u_domain", "u_path", "u_query", "u_blocked").head()
    (r.getString(0), r.getString(1), r.getString(2), r.getString(3),
      r.getString(4), r.getBoolean(5))
  }

  test("full URL with userinfo, port, path, query, fragment") {
    val (scheme, host, domain, path, query, _) =
      parse("HTTPS://user:pw@Sub.Example.COM:8443/a/b.html?x=1&y=2#frag")
    assert(scheme == "https")
    assert(host == "sub.example.com")
    assert(domain == "example.com")
    assert(path == "/a/b.html")
    assert(query == "x=1&y=2")
  }

  test("bare host; missing parts come back empty") {
    val (scheme, host, domain, path, query, _) = parse("http://example.org")
    assert(scheme == "http" && host == "example.org" && domain == "example.org")
    assert(path == "" && query == "")
  }

  test("single-label host has no two-label domain") {
    val (_, host, domain, _, _, _) = parse("http://localhost:8080/x")
    assert(host == "localhost" && domain == "")
  }

  test("blocklist flags by domain, case-insensitive") {
    import spark.implicits._
    val urls = Seq("https://www.spam.biz/a", "https://ok.example.com/b").toDF("url")
    val out = stage.setBlockedDomains("SPAM.biz").transform(urls).head
      .select("u_domain", "u_blocked").collect()
      .map(r => r.getString(0) -> r.getBoolean(1)).toMap
    assert(out("spam.biz") && !out("example.com"))
  }

  test("zero-shuffle plan; save/load round-trip") {
    import spark.implicits._
    val plan = stage.transform(Seq("http://a.b/c").toDF("url")).head
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan)
    val dir = tmpDir()
    stage.setBlockedDomains("x.com", "y.org").save(dir)
    val back = UrlParser.load(spark, dir)
    assert(back.getBlockedDomains.toSeq == Seq("x.com", "y.org"))
  }
}
