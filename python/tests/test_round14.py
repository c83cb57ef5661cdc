"""Round-14 stages: crawl outlink extraction (LinkGraphExtractor) and
the host-graph PageRank composition built from it."""


def test_link_graph_extractor_resolution(spark):
    from graftml import LinkGraphExtractor
    pages = spark.createDataFrame(
        [(1, "https://u@www.ex.co:8443/a/b/page.html?q=1",
          '<a href="https://other.org/x">a</a>'
          "<a href='//cdn.net/l.js'>c</a>"
          '<a href="/root.html">r</a>'
          '<a href="img/p.html">i</a>'
          '<a href="mailto:a@b.c">m</a>'
          '<a href="#f">f</a>')],
        ["id", "url", "html"])
    rows = (LinkGraphExtractor(spark=spark)
            .setInputCol("html").setUrlCol("url").setOutputCol("lk")
            .transform(pages)[0].collect())
    got = {(r["lk_href"], r["lk_url"], r["lk_host"], r["lk_domain"]) for r in rows}
    assert got == {
        ("https://other.org/x", "https://other.org/x", "other.org", "other.org"),
        ("//cdn.net/l.js", "https://cdn.net/l.js", "cdn.net", "cdn.net"),
        # userinfo stripped, the page's non-default PORT kept in the
        # resolution base (round-15 fix); lk_host strips the port
        ("/root.html", "https://www.ex.co:8443/root.html", "www.ex.co", "ex.co"),
        ("img/p.html", "https://www.ex.co:8443/a/b/img/p.html", "www.ex.co", "ex.co"),
    }


def test_host_edges_feed_pagerank(spark):
    from graftml.functions import host_edges, page_rank
    pages = spark.createDataFrame(
        [("https://s1.com/", '<a href="https://hub.org/">h</a>'),
         ("https://s2.com/", '<a href="https://hub.org/">h</a>'),
         ("https://hub.org/", '<a href="https://s1.com/">s</a>')],
        ["url", "html"])
    edges = host_edges(pages)
    assert set(edges.columns) == {"src_host", "dst_host"}
    out = {r["id"]: r["pagerank"]
           for r in page_rank(edges, src="src_host", dst="dst_host",
                              num_iter=30).collect()}
    assert out["hub.org"] > out["s1.com"] > out["s2.com"]
    assert abs(sum(out.values()) - 1.0) < 1e-9


def _shot_vid(spark, group, keys, frames_per_shot=3, brightness=0):
    b = spark._jvm.graft.multimodal.VideoShotHasher.syntheticShotVideo(
        group, keys, frames_per_shot, brightness, "png")
    return bytes(b)


def test_video_shot_containment(spark):
    from graftml import VideoShotHasher
    rows = [
        (0, _shot_vid(spark, 1, [0, 1, 2, 3])),              # base
        (1, _shot_vid(spark, 1, [3, 1, 2])),                 # trimmed + reordered
        (2, _shot_vid(spark, 1, [2, 3, 8, 9], brightness=40)),  # half overlap, re-graded
        (3, _shot_vid(spark, 2, [0, 1, 2, 3])),              # different clip
    ]
    df = spark.createDataFrame(rows, ["id", "video"])
    hasher = (VideoShotHasher(spark=spark)
              .setInputCol("video").setOutputCol("shots").setMinOverlap(0.45))
    hashed = hasher.transform(df)[0]
    sizes = {r["id"]: len(r["shots"]) for r in hashed.collect()}
    assert sizes == {0: 4, 1: 3, 2: 4, 3: 4}
    pairs = {(r["id_a"], r["id_b"]): (r["shared"], round(r["overlap"], 3))
             for r in hasher.containmentJoin(hashed, "id").collect()}
    # trim scores containment 1.0; partial overlaps score their fraction;
    # the unrelated clip (and its identically-keyed shots under another
    # group) never pairs
    assert pairs == {(0, 1): (3, 1.0), (0, 2): (2, 0.5), (1, 2): (2, 0.667)}


def test_url_canonicalizer_collapses_spellings(spark):
    from graftml import UrlCanonicalizer
    df = spark.createDataFrame(
        [("HTTP://Host:80/a//b?utm_source=x&b=2&a=1#top",),
         ("http://host/a/b?a=1&b=2",),
         ("ftp://files.net:2121/pub?z=1&y=2",),
         ("not-a-url",)],
        ["url"])
    out = (UrlCanonicalizer(spark=spark)
           .setInputCol("url").setOutputCol("cn")
           .transform(df)[0].collect())
    urls = [r["cn_url"] for r in out]
    assert urls[0] == urls[1] == "http://host/a/b?a=1&b=2"
    assert urls[2] == "ftp://files.net:2121/pub?y=2&z=1"
    assert urls[3] is None and out[3]["cn_key"] is None
    assert out[0]["cn_key"] == out[1]["cn_key"] is not None


def test_hits_hubs_and_authorities(spark):
    from graftml.functions import hits
    edges = spark.createDataFrame(
        [("d1", "n"), ("d1", "m"), ("d2", "n"), ("d2", "m"), ("d3", "n")],
        ["src", "dst"])
    out = {r["id"]: (r["hub"], r["authority"])
           for r in hits(edges, num_iter=8).collect()}
    assert abs(sum(h for h, _ in out.values()) - 1.0) < 1e-12
    assert abs(sum(a for _, a in out.values()) - 1.0) < 1e-12
    # n has one more in-link than m; d1 == d2 outrank d3 as hubs
    assert out["n"][1] > out["m"][1]
    assert abs(out["d1"][0] - out["d2"][0]) < 1e-15
    assert out["d1"][0] > out["d3"][0]
    # pure hubs have zero authority and vice versa
    assert out["d1"][1] == 0.0 and out["n"][0] == 0.0


def test_anchor_text_alignment(spark):
    from graftml import LinkGraphExtractor
    pages = spark.createDataFrame(
        [(1, "https://h.org/",
          '<a href="/a">first</a><a href="/b"><img src="x"/></a>')],
        ["id", "url", "html"])
    rows = (LinkGraphExtractor(spark=spark)
            .setInputCol("html").setUrlCol("url").setOutputCol("lk")
            .transform(pages)[0].collect())
    got = {r["lk_href"]: r["lk_text"] for r in rows}
    assert got == {"/a": "first", "/b": ""}
