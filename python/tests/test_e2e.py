"""Deeper end-to-end coverage of the Python surface: persistence
round-trips (stage, model, multi-stage pipeline) and the dedup /
text-curation tier driven entirely from Python — the operations a
pyflink user of the reference's Python API would expect to keep
(mirrors flink-ml-python/pyflink/ml/tests save/load patterns)."""

import tempfile

from pyspark.ml.linalg import Vectors


def _tmp():
    return tempfile.mkdtemp(prefix="graftml-test-")


# ------------------------------------------------------------ persistence

def test_stage_save_load_roundtrip_params(spark):
    from graftml import Tokenizer
    t = Tokenizer(spark=spark).setInputCol("body").setOutputCol("toks")
    path = _tmp()
    t.save(path)
    back = Tokenizer.load(path, spark=spark)
    assert back.getInputCol() == "body"
    assert back.getOutputCol() == "toks"


def test_model_save_load_roundtrip_transform(spark):
    from graftml import StandardScaler, StandardScalerModel
    df = spark.createDataFrame(
        [(Vectors.dense([1.0]),), (Vectors.dense([2.0]),), (Vectors.dense([3.0]),)],
        ["features"])
    model = (StandardScaler(spark=spark)
             .setInputCol("features").setOutputCol("scaled")
             .setWithMean(True).setWithStd(True).fit(df))
    path = _tmp()
    model.save(path)
    back = StandardScalerModel.load(path, spark=spark)
    want = sorted(r["scaled"][0] for r in model.transform(df)[0].collect())
    got = sorted(r["scaled"][0] for r in back.transform(df)[0].collect())
    assert all(abs(a - b) < 1e-12 for a, b in zip(want, got))


def test_pipeline_model_save_load_roundtrip_three_stages(spark):
    from graftml import Pipeline, PipelineModel, RegexTokenizer, CountVectorizer, IDF
    df = spark.createDataFrame(
        [(0, "a b a c"), (1, "b c d"), (2, "a d d")], ["id", "text"])
    pipeline = Pipeline(
        [RegexTokenizer(spark=spark).setInputCol("text").setOutputCol("tokens")
             .setPattern("\\s+"),
         CountVectorizer(spark=spark).setInputCol("tokens").setOutputCol("tf"),
         IDF(spark=spark).setInputCol("tf").setOutputCol("tfidf")],
        spark=spark)
    model = pipeline.fit(df)
    path = _tmp()
    model.save(path)
    back = PipelineModel.load(path, spark=spark)
    want = {r["id"]: list(r["tfidf"]) for r in model.transform(df)[0].collect()}
    got = {r["id"]: list(r["tfidf"]) for r in back.transform(df)[0].collect()}
    assert want.keys() == got.keys()
    for k in want:
        assert all(abs(a - b) < 1e-12 for a, b in zip(want[k], got[k]))


def test_pipeline_estimator_save_load_keeps_stage_params(spark):
    from graftml import Pipeline, Tokenizer, StandardScaler
    pipeline = Pipeline(
        [Tokenizer(spark=spark).setInputCol("text").setOutputCol("toks"),
         StandardScaler(spark=spark).setInputCol("v").setOutputCol("s")],
        spark=spark)
    path = _tmp()
    pipeline.save(path)
    back = Pipeline.load(path, spark=spark)
    jstages = back._jobj.stages()
    assert jstages.size() == 2
    assert jstages.apply(0).getClass().getName() == "graft.feature.Tokenizer"


# ------------------------------------------------------- dedup tier, e2e

def test_minhash_dedup_full_text_chain(spark):
    """The q_dedup shape from Python: tokenize → shingle → hash →
    MinHashDeduplicator, near-duplicate text flagged to its canonical."""
    from graftml import RegexTokenizer, NGram, HashingTF, MinHashDeduplicator
    base = "the quick brown fox jumps over the lazy dog again and again today"
    near = base.replace("today", "tonight")
    other = "completely different words in this unrelated document about spark"
    df = spark.createDataFrame(
        [(0, base), (1, other), (2, near)], ["doc_id", "text"])
    toks = (RegexTokenizer(spark=spark)
            .setInputCol("text").setOutputCol("tokens").setPattern("\\s+")
            .transform(df))[0]
    grams = (NGram(spark=spark).setInputCol("tokens").setOutputCol("sh").setN(2)
             .transform(toks))[0]
    tf = (HashingTF(spark=spark).setInputCol("sh").setOutputCol("tf")
          .setNumFeatures(1 << 16).setBinary(True).transform(grams))[0]
    out = (MinHashDeduplicator(spark=spark)
           .setIdCol("doc_id").setInputCol("tf")
           .setSeed(2022).setNumHashTables(8).setThreshold(0.5)
           .transform(tf.select("doc_id", "tf")))[0]
    got = {r["doc_id"]: r["is_duplicate"] for r in out.collect()}
    assert got[0] is False and got[1] is False and got[2] is True


def test_simhash_fingerprint_and_join(spark):
    from graftml import SimHasher
    a = ["tok%d" % i for i in range(40)]
    b = a + ["extra"]                     # hamming-near neighbour
    c = ["other%d" % i for i in range(40)]
    df = spark.createDataFrame([(0, a), (1, b), (2, c)], ["id", "tokens"])
    hasher = SimHasher(spark=spark).setInputCol("tokens").setOutputCol("fp")
    hashed = hasher.transform(df)[0]
    fps = {r["id"]: r["fp"] for r in hashed.collect()}
    assert fps[0] != fps[2]
    # near pair well under 16 bits, unrelated docs ~32 bits apart
    pairs = hasher._jobj.similarityJoin(hashed._jdf, "id", 16, 32)
    from pyspark.sql import DataFrame as PyDF
    rows = PyDF(pairs, spark).collect()
    assert {(r["id_a"], r["id_b"]) for r in rows} == {(0, 1)}


def test_cosine_deduplicator_flags_near_vector(spark):
    from graftml import CosineDeduplicator
    v = [1.0, 2.0, 3.0, 4.0, 5.0, 6.0, 7.0, 8.0]
    near = [x * 1.001 + 0.0005 for x in v]          # cosine ~ 1.0
    far = [8.0, -7.0, 6.0, -5.0, 4.0, -3.0, 2.0, -1.0]
    df = spark.createDataFrame(
        [(0, Vectors.dense(v)), (1, Vectors.dense(far)), (2, Vectors.dense(near))],
        ["vec_id", "vec"])
    out = (CosineDeduplicator(spark=spark)
           .setIdCol("vec_id").setInputCol("vec")
           .setSeed(2022).setNumHashTables(8).setNumPlanes(8)
           .setMinSimilarity(0.99)
           .transform(df))[0]
    got = {r["vec_id"]: r["is_duplicate"] for r in out.collect()}
    assert got[0] is False and got[1] is False and got[2] is True


def test_decontaminator_flags_benchmark_overlaps(spark):
    """Token-shingle decontamination: a train doc sharing n-grams with
    the eval set is flagged `contaminated` with its match count."""
    from graftml import RegexTokenizer, NGram, Decontaminator

    def shingled(df):
        toks = (RegexTokenizer(spark=spark)
                .setInputCol("text").setOutputCol("tokens").setPattern("\\s+")
                .transform(df))[0]
        return (NGram(spark=spark).setInputCol("tokens").setOutputCol("sh").setN(3)
                .transform(toks))[0].selectExpr("doc_id", "sh")

    train = shingled(spark.createDataFrame(
        [(0, "alpha beta gamma delta epsilon zeta eta theta"),
         (1, "totally clean training document with no overlap anywhere here")],
        ["doc_id", "text"]))
    bench = shingled(spark.createDataFrame(
        [(100, "alpha beta gamma delta epsilon zeta eta theta")], ["doc_id", "text"]))
    out = (Decontaminator(spark=spark)
           .setIdCol("doc_id").setInputCol("sh")
           .transform(train, bench))[0]
    flags = {r["doc_id"]: r["contaminated"] for r in out.collect()}
    assert flags[0] is True and flags[1] is False


def test_ngram_jaccard_join_finds_near_pair(spark):
    from graftml import RegexTokenizer, NGram, NgramJaccardJoin
    base = "one two three four five six seven eight nine ten"
    near = "one two three four five six seven eight nine eleven"
    df = spark.createDataFrame(
        [(0, base), (1, near), (2, "nothing in common at all whatsoever right")],
        ["doc_id", "text"])
    toks = (RegexTokenizer(spark=spark)
            .setInputCol("text").setOutputCol("tokens").setPattern("\\s+")
            .transform(df))[0]
    grams = (NGram(spark=spark).setInputCol("tokens").setOutputCol("sh").setN(2)
             .transform(toks))[0]
    pairs = (NgramJaccardJoin(spark=spark)
             .setIdCol("doc_id").setInputCol("sh").setThreshold(0.5)
             .transform(grams.select("doc_id", "sh")))[0]
    got = {(r["id_a"], r["id_b"]) for r in pairs.collect()}
    assert (0, 1) in got and len(got) == 1


# ------------------------------------------------------ text tier extras

def test_bpe_train_and_encode(spark):
    from graftml import BpeTrainer
    df = spark.createDataFrame(
        [("low lower lowest",), ("low low lower",)], ["text"])
    model = (BpeTrainer(spark=spark)
             .setInputCol("text").setOutputCol("bpe")
             .setNumMerges(5).setMinPairCount(2).fit(df))
    merges = model.get_model_data()[0]
    assert merges.count() > 0
    out = model.transform(df)[0]
    assert "bpe" in out.columns and out.count() == 2


def test_swing_packed_topk_from_python(spark):
    """Reference SwingTest fixture through the Python wrapper."""
    from graftml import Swing
    rows = [(0, 10), (0, 11), (0, 12), (1, 13), (1, 12), (2, 10), (2, 11),
            (2, 12), (3, 13), (3, 12), (4, 12), (4, 10), (4, 11), (4, 12), (4, 13)]
    df = spark.createDataFrame(
        [(int(u), int(i)) for u, i in rows], ["user", "item"]) \
        .selectExpr("cast(user as long) user", "cast(item as long) item")
    out = (Swing(spark=spark).setMinUserBehavior(2).setMaxUserBehavior(3)
           .transform(df))[0]
    packed = {r["item"]: r["output"] for r in out.collect()}
    assert packed[13] == "12,0.09134833828228624"
    assert packed[10].startswith("11,0.058845768947156235")


def test_asof_joiner_two_input_transform(spark):
    from graftml import AsOfJoiner
    left = spark.createDataFrame(
        [(1, 100), (1, 205)], ["k", "ts"]).selectExpr(
        "cast(k as long) k", "cast(ts as long) ts")
    right = spark.createDataFrame(
        [(1, 90, "v0"), (1, 200, "v1")], ["k", "ts", "val"]).selectExpr(
        "cast(k as long) k", "cast(ts as long) ts", "val")
    out = (AsOfJoiner(spark=spark)
           .setOnCols(["k"]).setLeftTimeCol("ts").setRightTimeCol("ts")
           .setValueCols(["val"])
           .transform(left, right))[0]
    got = {r["ts"]: r["val"] for r in out.collect()}
    assert got[100] == "v0" and got[205] == "v1"


def test_minhash_indexer_incremental_dedup(spark):
    from graftml import MinHashIndexer, MinHashIndexModel
    from pyspark.ml.linalg import Vectors

    def vec(*idx):
        return Vectors.sparse(100, sorted(idx), [1.0] * len(idx))

    corpus = spark.createDataFrame(
        [(0, vec(1, 2, 3, 4, 5, 6, 7, 8, 9, 10)),
         (2, vec(50, 51, 52, 53, 54, 55, 56, 57, 58, 59))],
        ["id", "features"])
    batch = spark.createDataFrame(
        [(11, vec(1, 2, 3, 4, 5, 6, 7, 8, 9, 42)),   # near-dup of 0
         (15, vec(80, 81, 82, 83, 84, 85, 86, 87, 88, 89))],  # unique
        ["id", "features"])
    model = (MinHashIndexer(spark=spark)
             .setInputCol("features").setOutputCol("hashes")
             .setNumHashTables(10).setThreshold(0.3).setSeed(7)
             .fit(corpus))
    rows = {r["id"]: r for r in model.transform(batch)[0].collect()}
    assert rows[11]["is_duplicate"] and rows[11]["matched_id"] == 0
    assert not rows[15]["is_duplicate"] and rows[15]["matched_id"] is None


def test_span_deduplicator_removes_shared_passage(spark):
    from graftml import SpanDeduplicator
    passage = " ".join(f"p{i}" for i in range(10))
    df = spark.createDataFrame(
        [(1, "a0 a1 a2 " + passage),
         (2, passage + " b0 b1"),
         (3, "c0 c1 c2 c3 c4 c5 c6 c7 c8 c9 c10 c11")],
        ["doc_id", "text"])
    out = (SpanDeduplicator(spark=spark)
           .setN(8).setIdCol("doc_id").setInputCol("text").setOutputCol("clean")
           .transform(df))[0]
    rows = {r["doc_id"]: r for r in out.collect()}
    # 10-token passage, n=8 -> 3 overlapping windows, one merged span of 10
    assert rows[1]["dup_windows"] == 3 and rows[1]["dup_spans"] == 1
    assert rows[1]["dup_tokens"] == 10 and rows[1]["clean"] == "a0 a1 a2"
    assert rows[2]["clean"] == "b0 b1"
    assert rows[3]["dup_windows"] == 0 and rows[3]["clean"].startswith("c0")


def test_frequent_ngrams_exact_and_sketch_agree(spark):
    from graftml import FrequentNgrams
    from pyspark.sql import functions as F
    docs = ["the quick brown fox", "the quick brown dog",
            "a quick brown fox ran", "the slow brown fox"] * 3
    df = spark.createDataFrame([(d,) for d in docs], ["text"]) \
        .select(F.split("text", " ").alias("toks"))
    base = FrequentNgrams(spark=spark).setN(2).setMinCount(6).setInputCol("toks")
    exact = {(r["gram"], r["cnt"])
             for r in base.setStrategy("exact").transform(df)[0].collect()}
    sketch = {(r["gram"], r["cnt"])
              for r in base.setStrategy("sketch").transform(df)[0].collect()}
    assert exact == sketch
    assert ("quick brown", 9) in exact


def test_streaming_deduplicator_batch_parity_from_python(spark):
    from graftml import StreamingDeduplicator
    df = spark.createDataFrame(
        [(1, "same text", 10), (2, "unique one", 20), (3, "Same   TEXT", 30)],
        ["id", "text", "ts"])
    out = (StreamingDeduplicator(spark=spark)
           .setInputCol("text").setIdCol("id")
           .transform(df)[0])
    rows = {r["id"]: r for r in out.collect()}
    assert not rows[1]["is_duplicate"] and rows[1]["occurrence"] == 1
    assert rows[3]["is_duplicate"] and rows[3]["canonical_id"] == 1
    assert rows[3]["occurrence"] == 2
    assert not rows[2]["is_duplicate"]


def test_drift_detector_two_input_transform(spark):
    from graftml import DriftDetector
    ref = spark.createDataFrame([(float(i),) for i in range(10)], ["x"])
    cur = spark.createDataFrame([(float(i + 5),) for i in range(10)], ["x"])
    rows = (DriftDetector(spark=spark)
            .setFeatureCols(["x"]).setNumBins(5)
            .transform(ref, cur)[0].collect())
    assert len(rows) == 1
    r = rows[0]
    assert r["feature"] == "x" and r["psi"] > 0.5 and abs(r["ks"] - 0.5) < 1e-9


def test_pca_fit_transform_from_python(spark):
    from graftml import PCA, PCAModel
    from pyspark.ml.linalg import Vectors
    import random
    random.seed(3)
    rows = []
    for _ in range(100):
        a = random.gauss(0, 3)
        rows.append((Vectors.dense([a, a * 0.5 + random.gauss(0, 0.01),
                                    random.gauss(0, 0.1)]),))
    df = spark.createDataFrame(rows, ["features"])
    model = (PCA(spark=spark).setInputCol("features").setOutputCol("proj")
             .setK(2).fit(df))
    out = model.transform(df)[0].collect()
    assert len(out) == 100 and len(out[0]["proj"]) == 2
    ev = model.get_model_data()[0].collect()[0]["eigenvalues"]
    assert ev[0] > ev[1] > 0


def test_ivf_indexer_fit_probe_from_python(spark):
    from graftml import IvfIndexer
    from pyspark.ml.linalg import Vectors
    import random
    random.seed(8)
    corpus = spark.createDataFrame(
        [(i, Vectors.dense([(4.0 if d == (i % 2) * 2 else 0.0) + random.gauss(0, 0.1)
                            for d in range(4)])) for i in range(100)],
        ["id", "vec"])
    probe = spark.createDataFrame(
        [(900, Vectors.dense([4.0, 0.0, 0.0, 0.0]))], ["id", "vec"])
    model = (IvfIndexer(spark=spark).setIdCol("id").setVecCol("vec")
             .setNumLists(2).setTrainIters(5).setSeed(3).fit(corpus))
    rows = model.setK(3).setNprobe(1).transform(probe)[0].collect()
    assert len(rows) == 3
    assert all(r["neighbor_id"] % 2 == 0 for r in rows)  # probe's cluster


def test_interval_joiner_two_input_from_python(spark):
    from graftml import IntervalJoiner
    clicks = spark.createDataFrame(
        [(1, 7, 1000), (2, 7, 5000)], ["click_id", "user", "ts"])
    windows = spark.createDataFrame(
        [(7, 900, 2000, "w")], ["user", "start", "end", "tag"])
    rows = (IntervalJoiner(spark=spark)
            .setOnCols(["user"]).setLeftTimeCol("ts")
            .setRightStartCol("start").setRightEndCol("end")
            .setValueCols(["tag"]).setBinWidthMs(500)
            .transform(clicks, windows)[0].collect())
    assert [r["click_id"] for r in rows] == [1]
    assert rows[0]["tag"] == "w"


def test_epoch_mixer_upsamples_from_python(spark):
    from graftml import EpochMixer
    df = spark.createDataFrame(
        [(i, "rare" if i % 10 == 0 else "web") for i in range(100)],
        ["id", "source"])
    out = (EpochMixer(spark=spark).setIdCol("id").setStratumCol("source")
           .setSeed(1).setStrataKeys(["rare"]).setStrataWeights([2.0])
           .setDefaultWeight(1.0)
           .transform(df)[0])
    counts = {r["source"]: r["count"] for r in out.groupBy("source").count().collect()}
    assert counts == {"rare": 20, "web": 90}


def test_multiclass_evaluator_from_python(spark):
    from graftml import MulticlassEvaluator
    df = spark.createDataFrame(
        [(0, 0), (0, 1), (1, 1), (1, 1)], ["label", "prediction"])
    rows = {r["clazz"]: r for r in
            MulticlassEvaluator(spark=spark).transform(df)[0].collect()}
    assert rows[0.0]["tp"] == 1 and rows[0.0]["predicted"] == 1
    assert abs(rows[1.0]["precision"] - 2.0 / 3) < 1e-9
    assert rows[1.0]["recall"] == 1.0


def test_regression_evaluator_from_python(spark):
    from graftml import RegressionEvaluator
    df = spark.createDataFrame(
        [(3.0, 2.5), (-0.5, 0.0), (2.0, 2.0), (7.0, 8.0)],
        ["label", "prediction"])
    r = RegressionEvaluator(spark=spark).transform(df)[0].collect()[0]
    assert abs(r["mae"] - 0.5) < 1e-9
    assert abs(r["r2"] - 0.9486081370449679) < 1e-9
