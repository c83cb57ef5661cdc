"""Round-16 stages: main-content extraction, RFC 9309 robots group
selection (§2.2.1) and wildcards (§2.2.3)."""


PARA = ("This paragraph is the actual article body and it runs clearly "
        "past the good-length threshold used by the extractor.")


def test_main_content_extractor(spark):
    from graftml import MainContentExtractor
    html = ('<div><a href="/a">Home</a> <a href="/b">About</a> '
            '<a href="/c">Contact</a></div>'
            '<h1>Headline</h1>'
            '<p>%s</p>'
            '<p>Short aside between.</p>'
            '<p>%s more words to stay good.</p>'
            '<div><a href="/t">Terms</a> <a href="/p">Privacy</a></div>'
            % (PARA, PARA))
    df = spark.createDataFrame([(1, html), (2, ""), (3, None)], ["id", "html"])
    out = (MainContentExtractor(spark=spark)
           .setIdCol("id").setInputCol("html").setOutputCol("mc")
           .transform(df)[0])
    rows = {r["id"]: (r["mc_text"], r["mc_kept"], r["mc_blocks"])
            for r in out.collect()}
    text, kept, blocks = rows[1]
    # nav, headline and footer drop; the short aside survives between
    # the two good paragraphs
    assert kept == 3 and blocks == 6
    assert text.split("\n")[1] == "Short aside between."
    assert rows[2] == ("", 0, 0) and rows[3] == ("", 0, 0)


def test_frontier_builder_incremental(spark):
    from graftml import FrontierBuilder
    crawled = spark.createDataFrame([("https://ex.com/old",)], ["url"])
    model = (FrontierBuilder(spark=spark)
             .setUrlCol("url").setOutputCol("f").fit(crawled))
    sitemap = spark.createDataFrame(
        [("https://ex.com/a",), ("https://ex.com/old",)], ["url"])
    links = spark.createDataFrame(
        [("HTTPS://EX.COM:443/a?utm_source=feed",), ("https://ex.com/b",)],
        ["url"])
    out = model.transform(sitemap, links)[0]
    got = {r["f_url"]: (r["f_refs"], r["f_sources"]) for r in out.collect()}
    # /old is crawled; the messy /a spelling collapses onto the sitemap loc
    assert got == {"https://ex.com/a": (2, "0,1"), "https://ex.com/b": (1, "1")}
    # batch-over-batch: after marking /a and /b crawled, only /c is new
    grown = model.addCrawled(out.select(out["f_url"].alias("url")))
    batch2 = spark.createDataFrame(
        [("https://ex.com/a",), ("https://ex.com/c",)], ["url"])
    got2 = {r["f_url"] for r in grown.transform(batch2)[0].collect()}
    assert got2 == {"https://ex.com/c"}


def test_robots_group_selection(spark):
    from graftml import RobotsTxtParser
    # RFC 9309 §2.2.1: the '*' group is a fallback, not a union — the
    # named agent must NOT inherit the wildcard Disallow
    txt = "User-agent: googlebot\nAllow: /\n\nUser-agent: *\nDisallow: /x"
    df = spark.createDataFrame([("h.com", txt)], ["host", "robots"])
    rules = (RobotsTxtParser(spark=spark)
             .setInputCol("robots").setOutputCol("r").setUserAgent("googlebot")
             .transform(df)[0].collect())
    assert {(r["r_rule"], r["r_prefix"]) for r in rules} == {("allow", "/")}


def test_robots_directives(spark):
    from graftml import RobotsDirectives
    txt = ("Sitemap: https://h.com/s.xml\n"
           "User-agent: graftbot\nCrawl-delay: 2.5\n"
           "User-agent: *\nCrawl-delay: 99")
    df = spark.createDataFrame([("h.com", txt)], ["host", "robots"])
    out = (RobotsDirectives(spark=spark)
           .setInputCol("robots").setOutputCol("rd").setUserAgent("graftbot")
           .transform(df)[0].collect())
    got = {(r["rd_kind"], r["rd_value"], r["rd_delay"]) for r in out}
    # sitemap is document-scoped; the named group's delay wins and the
    # wildcard group's 99 does not leak
    assert got == {("sitemap", "https://h.com/s.xml", None),
                   ("crawl-delay", "2.5", 2.5)}


def test_crawl_scheduler(spark):
    from graftml import CrawlScheduler
    frontier = spark.createDataFrame(
        [("https://h1/a", "h1", 5.0), ("https://h1/b", "h1", 9.0),
         ("https://h1/c", "h1", 7.0), ("https://h2/x", "h2", 3.0)],
        ["url", "host", "priority"])
    delays = spark.createDataFrame([("h1", 50.0)], ["host", "delay"])
    out = (CrawlScheduler(spark=spark)
           .setOutputCol("cs").setBudgetPerHost(2).setHorizonSec(90.0)
           .transform(frontier, delays)[0].collect())
    got = {r["url"]: r["cs_rank"] for r in out}
    # h1's 50 s delay under a 90 s horizon tightens its budget to 1;
    # h2 has no delay row and keeps the flat budget
    assert got == {"https://h1/b": 1, "https://h2/x": 1}


def test_warc_http_gate(spark):
    from graftml import WarcParser
    warc = ("WARC/1.0\r\nWARC-Type: response\r\n\r\n"
            "HTTP/1.1 301 Moved Permanently\r\n"
            "Content-Type: TEXT/HTML; charset=utf-8\r\n\r\n"
            "<html></html>\r\n\r\n")
    df = spark.createDataFrame([(warc,)], ["warc"])
    out = (WarcParser(spark=spark)
           .setInputCol("warc").setOutputCol("w").transform(df)[0].collect())
    assert len(out) == 1
    assert out[0]["w_status"] == 301 and out[0]["w_mime"] == "text/html"


def test_robots_wildcards(spark):
    from graftml import RobotsTxtParser, RobotsUrlFilter
    txt = "User-agent: *\nDisallow: /*.pdf$\nAllow: /pub/*.pdf$"
    robots = spark.createDataFrame([("h.com", txt)], ["host", "robots"])
    rules = (RobotsTxtParser(spark=spark)
             .setInputCol("robots").setOutputCol("r").transform(robots)[0])
    urls = spark.createDataFrame(
        [("u1", "h.com", "/files/a.pdf"),
         ("u2", "h.com", "/files/a.pdf.html"),
         ("u3", "h.com", "/pub/a.pdf")],
        ["url", "host", "path"])
    out = (RobotsUrlFilter(spark=spark)
           .setIdCol("url").setOutputCol("v").transform(urls, rules)[0])
    verdicts = {r["url"]: r["v_allowed"] for r in out.collect()}
    # the $ anchors (u2 passes), the longer /pub allow overrides (u3)
    assert verdicts == {"u1": False, "u2": True, "u3": True}
