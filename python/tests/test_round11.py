"""Round-11 features through the Python surface: the page_rank graph
helper."""

import math


def test_page_rank_star(spark):
    from graftml.functions import page_rank
    # 1..5 -> 0; 0 is dangling
    edges = spark.createDataFrame([(i, 0) for i in range(1, 6)], ["src", "dst"])
    ranks = {r["id"]: r["pagerank"]
             for r in page_rank(edges, num_iter=30).collect()}
    assert math.isclose(sum(ranks.values()), 1.0, abs_tol=1e-9)
    assert ranks[0] > 3 * ranks[1]
    assert len({round(ranks[i], 12) for i in range(1, 6)}) == 1


def test_page_rank_weighted_and_tol(spark):
    from graftml.functions import page_rank
    edges = spark.createDataFrame(
        [(1, 2, 9.0), (1, 3, 1.0), (2, 1, 1.0), (3, 1, 1.0)],
        ["src", "dst", "w"])
    ranks = {r["id"]: r["pagerank"]
             for r in page_rank(edges, num_iter=200, tol=1e-10,
                                weight_col="w").collect()}
    assert ranks[2] > 2 * ranks[3]
    assert math.isclose(sum(ranks.values()), 1.0, abs_tol=1e-9)


def test_resampler(spark):
    from graftml import Resampler
    df = spark.createDataFrame(
        [("a", 0, 1.0), ("a", 25, 5.0)], ["k", "t", "v"])
    rows = (Resampler(spark=spark).setKeyCol("k").setTimeCol("t")
            .setValueCols(["v"]).setStepMs(10)
            .transform(df)[0].orderBy("t").collect())
    got = [(r["t"], r["is_observed"], r["v"]) for r in rows]
    assert got == [(0, True, 1.0), (10, False, 1.0), (20, True, 5.0)]


def test_collocation_scorer(spark):
    from graftml import CollocationScorer
    docs = spark.createDataFrame(
        [("new york is big",), ("i love new york",), ("new york here",)],
        ["text"])
    rows = (CollocationScorer(spark=spark).setInputCol("text")
            .setMinCount(1).transform(docs)[0].collect())
    top = max(rows, key=lambda r: r["llr"])
    assert (top["w1"], top["w2"]) == ("new", "york")
    assert top["n12"] == 3


def test_skew_report(spark):
    from graftml import SkewReport
    df = spark.createDataFrame(
        [("hot",)] * 6 + [("warm",), (None,)], ["k"])
    rows = (SkewReport(spark=spark).setKeyCols(["k"]).setTopK(2)
            .transform(df)[0].orderBy("rank").collect())
    assert rows[0]["key"] == "hot" and rows[0]["n"] == 6
    assert abs(rows[0]["share"] - 6.0 / 8) < 1e-12
