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


def test_read_jsonl(spark, tmp_path):
    from pyspark.sql.types import StructType, StructField, LongType, StringType
    from graftml.functions import read_jsonl
    p = tmp_path / "shard.jsonl"
    p.write_text('{"doc_id": 1, "text": "ok", "source": "web"}\n'
                 'broken line\n')
    schema = StructType([StructField("doc_id", LongType()),
                         StructField("text", StringType()),
                         StructField("source", StringType())])
    records, corrupt = read_jsonl(spark, str(tmp_path), schema)
    assert [(r["doc_id"], r["text"]) for r in records.collect()] == [(1, "ok")]
    assert corrupt.count() == 1


def test_c4_filter_rules(spark):
    from graftml import C4Filter
    page = ("The quick brown fox jumps over the lazy dog.\n"
            "short line\n"
            "Enable javascript to view this page properly.\n"
            "A second good sentence with enough words here.\n"
            "And a third sentence closes out this page.")
    docs = spark.createDataFrame([(1, page), (2, "lorem ipsum { bad page.")],
                                 ["doc_id", "text"])
    out = {r["doc_id"]: (r["n_lines_kept"], r["c4_keep"])
           for r in C4Filter(spark=spark).setInputCol("text")
           .transform(docs)[0].collect()}
    assert out[1] == (3, True)
    assert out[2][1] is False


def test_text_normalizer(spark):
    from graftml import TextNormalizer
    docs = spark.createDataFrame([(1, "  Héllo\tWörld  ")], ["id", "text"])
    out = (TextNormalizer(spark=spark).setInputCol("text").setOutputCol("n")
           .transform(docs)[0].collect())
    assert out[0]["n"] == "hello world"


def test_range_joiner(spark):
    from graftml import RangeJoiner
    left = spark.createDataFrame(
        [(1, 100, 200, 5), (2, 5000, 6000, 5)],
        ["sid", "start", "end", "k"])
    right = spark.createDataFrame(
        [("c1", 150, 300, 5), ("c2", 400, 500, 5)],
        ["name", "r_start", "r_end", "k"])
    out = (RangeJoiner(spark=spark).setOnCols(["k"])
           .setLeftStartCol("start").setLeftEndCol("end")
           .setRightStartCol("r_start").setRightEndCol("r_end")
           .setValueCols(["name"]).setBinWidthMs(100)
           .transform(left, right)[0].collect())
    assert {(r["sid"], r["name"]) for r in out} == {(1, "c1")}


def test_bloom_decontaminator(spark):
    from graftml import BloomDecontaminator
    train = spark.createDataFrame(
        [(1, ["a b", "c d"]), (2, ["x y"])], ["doc_id", "grams"])
    ev = spark.createDataFrame([(9, ["c d"])], ["doc_id", "grams"])
    out = {r["doc_id"]: r["contaminated"]
           for r in BloomDecontaminator(spark=spark)
           .setIdCol("doc_id").setInputCol("grams")
           .transform(train, ev)[0].collect()}
    assert out == {1: True, 2: False}


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
