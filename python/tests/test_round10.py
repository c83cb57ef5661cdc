"""Round-10 features through the Python surface: the
connected_components helper and hashed (bounded-vocabulary) NgramLm /
ImportanceScorer."""


def test_connected_components_helper(spark):
    from graftml.functions import connected_components
    edges = spark.createDataFrame(
        [(2, 1), (2, 3), (10, 11), (7, 3)], ["src", "dst"])
    out = {(r["id"], r["component"])
           for r in connected_components(edges).collect()}
    assert out == {(1, 1), (2, 1), (3, 1), (7, 1), (10, 10), (11, 10)}


def test_connected_components_distributed_star(spark):
    from graftml.functions import connected_components
    # driver_edge_limit=0 forces the distributed star contraction
    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(100, 120)], ["src", "dst"])
    out = {(r["id"], r["component"])
           for r in connected_components(edges, driver_edge_limit=0).collect()}
    assert out == {(i, 100) for i in range(100, 121)}


def test_ngram_lm_hash_buckets(spark):
    from graftml import NgramLm
    docs = spark.createDataFrame(
        [(0, "the cat sat on the mat"), (1, "the cat ate the fish")],
        ["id", "text"])
    model = (NgramLm(spark=spark)
             .setInputCol("text").setOutputCol("ppl")
             .setHashBuckets(1 << 30)
             .fit(docs))
    exact = (NgramLm(spark=spark)
             .setInputCol("text").setOutputCol("ppl")
             .fit(docs))
    got = {r["id"]: r["ppl"] for r in
           model.setIdCol("id").transform(docs)[0].collect()}
    want = {r["id"]: r["ppl"] for r in
            exact.setIdCol("id").transform(docs)[0].collect()}
    assert got.keys() == want.keys()
    for k in want:
        assert abs(got[k] - want[k]) < 1e-9
