"""Online-stage and analysis-tier depth from Python: the streaming
estimators' windowed fits, foreachBatch-style model updates, versioned
delay-gated scoring, plus the evaluator/text/ANN tiers — the surfaces a
pyflink user of the reference's online stages would reach for."""

from pyspark.ml.linalg import Vectors


def _vec_df(spark, rows, cols):
    return spark.createDataFrame(rows, cols)


def _jobject(spark, qualname):
    """Scala `object` instance (py4j: the $-suffixed class's MODULE$)."""
    pkg, name = qualname.rsplit(".", 1)
    obj = spark._jvm
    for part in pkg.split("."):
        obj = getattr(obj, part)
    return getattr(obj, name + "$").__getattr__("MODULE$")


def test_online_standard_scaler_count_windows_emit_versions(spark):
    from graftml import OnlineStandardScaler
    df = _vec_df(spark, [
        (0, Vectors.dense([1.0]),), (1, Vectors.dense([3.0]),),
        (2, Vectors.dense([5.0]),), (3, Vectors.dense([7.0]),)],
        ["ts", "vec"])
    w = spark._jvm.graft.streaming.CountTumblingWindows(2)
    model = (OnlineStandardScaler(spark=spark)
             .setInputCol("vec").setWindows(w).fit(df))
    rows = {r["version"]: r for r in model.get_model_data()[0].collect()}
    # two count-2 windows -> two cumulative versions
    assert set(rows) == {0, 1}
    assert rows[0]["count"] == 2 and rows[1]["count"] == 4
    assert abs(rows[0]["mean"][0] - 2.0) < 1e-9
    assert abs(rows[1]["mean"][0] - 4.0) < 1e-9


def test_online_logistic_regression_fit_and_predict(spark):
    from graftml import OnlineLogisticRegression
    init = _jobject(spark, "graft.streaming.OnlineLogisticRegressionModel") \
        .zeroInit(spark._jsparkSession, 2)
    from pyspark.sql import DataFrame as PyDF
    init_df = PyDF(init, spark)
    train = _vec_df(spark, [
        (Vectors.dense([0.0, 1.0]), 0.0), (Vectors.dense([0.5, 1.0]), 0.0),
        (Vectors.dense([4.0, 1.0]), 1.0), (Vectors.dense([5.0, 1.0]), 1.0)],
        ["features", "label"])
    est = (OnlineLogisticRegression(spark=spark)
           .setFeaturesCol("features").setLabelCol("label")
           .setGlobalBatchSize(2).setAlpha(0.5).setBeta(1.0))
    est.setInitialModelData(init_df)
    model = est.fit(train)
    # two batches -> versions 0 (init), 1, 2
    versions = sorted(r["version"] for r in model.get_model_data()[0].collect())
    assert versions == [0, 1, 2]
    scored = model.transform(train)[0].collect()
    # two FTRL steps won't fully separate, but the positive-class
    # probability must already rank by the discriminative feature
    probs = {tuple(r["features"]): r["rawPrediction"][1] for r in scored}
    assert probs[(5.0, 1.0)] > probs[(0.0, 1.0)]
    assert all(r["prediction"] in (0.0, 1.0) for r in scored)


def test_online_lr_versioned_delay_gated_scoring(spark):
    from graftml import OnlineLogisticRegression
    from pyspark.sql import DataFrame as PyDF
    init_df = PyDF(
        _jobject(spark, "graft.streaming.OnlineLogisticRegressionModel")
        .zeroInit(spark._jsparkSession, 1), spark)
    train = _vec_df(spark, [
        (1000, Vectors.dense([1.0]), 1.0), (1000, Vectors.dense([1.0]), 1.0),
        (2000, Vectors.dense([-1.0]), 0.0), (2000, Vectors.dense([-1.0]), 0.0)],
        ["ts", "features", "label"])
    est = (OnlineLogisticRegression(spark=spark)
           .setFeaturesCol("features").setLabelCol("label").setTimeCol("ts")
           .setGlobalBatchSize(2))
    est.setInitialModelData(init_df)
    model = est.fit(train)
    probes = _vec_df(spark, [
        (0, Vectors.dense([1.0])), (1500, Vectors.dense([1.0])),
        (99999, Vectors.dense([1.0]))], ["ts", "features"])
    scored = (model.setMaxAllowedModelDelayMs(0).setTimeCol("ts")
              .setModelVersionCol("ver").transform(probes))[0].collect()
    by_ts = {r["ts"]: r for r in scored}
    # earliest qualifying version per row; far-future probe is buffered
    assert by_ts[0]["ver"] == 1
    assert by_ts[1500]["ver"] == 2
    assert by_ts[99999]["ver"] == -1 and by_ts[99999]["prediction"] is None


def test_online_kmeans_update_from_foreachbatch_surface(spark):
    from graftml import OnlineKMeansModel
    from pyspark.sql import DataFrame as PyDF
    init_df = PyDF(
        _jobject(spark, "graft.streaming.OnlineKMeansModel")
        .randomInit(spark._jsparkSession, 2, 2, 1.0, 7), spark)
    model = OnlineKMeansModel(spark=spark)
    model.set_model_data(init_df)
    batch = _vec_df(spark, [
        (Vectors.dense([0.0, 0.1]),), (Vectors.dense([0.1, 0.0]),),
        (Vectors.dense([9.0, 9.1]),), (Vectors.dense([9.1, 9.0]),)],
        ["features"])
    updated = model.update(batch, "features")
    cents = sorted(
        (r["centroid"][0] for r in updated.get_model_data()[0].collect()))
    # one centroid pulled toward each cluster
    assert cents[0] < 5.0 < cents[1]


def test_binary_classification_evaluator_metrics(spark):
    from graftml import BinaryClassificationEvaluator
    df = spark.createDataFrame(
        [(1.0, 0.9), (1.0, 0.8), (0.0, 0.7), (1.0, 0.6), (0.0, 0.3), (0.0, 0.1)],
        ["label", "score"])
    out = (BinaryClassificationEvaluator(spark=spark)
           .setMetricsNames(["areaUnderROC", "ks"])
           .setRawPredictionCol("score")
           .transform(df))[0].collect()[0]
    # hand AUC: pairs (pos,neg) ranked correctly 8 of 9
    assert abs(out["areaUnderROC"] - 8.0 / 9.0) < 1e-9
    assert 0.0 < out["ks"] <= 1.0


def test_text_quality_langid_tokencount_chain(spark):
    from graftml import TextQualityScorer, LanguageDetector, TokenCounter
    df = spark.createDataFrame(
        [(0, "the quick brown fox jumps over the lazy dog near the river bank"),
         (1, "el rapido zorro marron salta sobre el perro perezoso en la calle")],
        ["doc_id", "text"])
    q = TextQualityScorer(spark=spark).setInputCol("text").transform(df)[0]
    lang = LanguageDetector(spark=spark).setInputCol("text").transform(q)[0]
    out = TokenCounter(spark=spark).setInputCol("text").transform(lang)[0].collect()
    rows = {r["doc_id"]: r for r in out}
    assert rows[0]["detected_lang"] == "en" and rows[1]["detected_lang"] == "es"
    assert rows[0]["n_tokens"] == 13
    assert rows[0]["quality_score"] > 0.5


def test_chunk_splitter_and_sequence_packer(spark):
    from graftml import ChunkSplitter, SequencePacker
    df = spark.createDataFrame(
        [(0, "a", " ".join("tok%d" % i for i in range(10))),
         (1, "a", " ".join("tok%d" % i for i in range(4)))],
        ["doc_id", "source", "text"])
    chunks = (ChunkSplitter(spark=spark)
              .setInputCol("text").setOutputCol("chunk_text")
              .setChunkSize(4).setStride(4).transform(df))[0].collect()
    per_doc = {}
    for r in chunks:
        per_doc.setdefault(r["doc_id"], []).append(r)
    assert len(per_doc[0]) == 3  # 10 tokens at size 4 stride 4 -> 4+4+2
    assert len(per_doc[1]) == 1
    packed = (SequencePacker(spark=spark)
              .setInputCol("text").setIdCol("doc_id").setGroupCol("source")
              .setTokenBudget(14).transform(df))[0].collect()
    bins = {r["doc_id"]: r["bin_index"] for r in packed}
    # 10 + 4 tokens fit one 14-token bin
    assert bins[0] == bins[1]


def test_ann_brute_force_topk(spark):
    from graftml import BruteForceCosineKnn
    data = spark.createDataFrame(
        [(0, Vectors.dense([1.0, 0.0])), (1, Vectors.dense([0.9, 0.1])),
         (2, Vectors.dense([0.0, 1.0])), (3, Vectors.dense([-1.0, 0.0]))],
        ["id", "vec"])
    queries = spark.createDataFrame(
        [(100, Vectors.dense([1.0, 0.05]))], ["id", "vec"])
    out = (BruteForceCosineKnn(spark=spark).setK(2)
           .transform(data, queries))[0].collect()
    got = sorted((r["neighbor_id"] for r in out))
    assert got == [0, 1]


def test_streaming_deduplicator_on_a_pyspark_stream(spark):
    """The streaming tier is reachable from Python: a file-source stream
    through the JVM StreamingDeduplicator, duplicates recognized across
    micro-batches."""
    import tempfile
    src = tempfile.mkdtemp(prefix="graftml-sdd-")
    batch1 = spark.createDataFrame([(1, "same doc", 10), (2, "other doc", 20)],
                                   ["id", "text", "ts"])
    batch2 = spark.createDataFrame([(3, "SAME  DOC", 30)], ["id", "text", "ts"])
    batch1.coalesce(1).write.mode("append").parquet(src)
    batch2.coalesce(1).write.mode("append").parquet(src)

    from graftml import StreamingDeduplicator
    stream = (spark.readStream.schema(batch1.schema)
              .option("maxFilesPerTrigger", 1).parquet(src))
    out = (StreamingDeduplicator(spark=spark)
           .setInputCol("text").setIdCol("id")
           .transform(stream)[0])
    q = (out.writeStream.format("memory").queryName("py_sdd")
         .outputMode("append").start())
    q.processAllAvailable()
    q.stop()
    rows = {r["id"]: r for r in spark.table("py_sdd").collect()}
    assert len(rows) == 3
    assert rows[3]["is_duplicate"] and rows[3]["canonical_id"] == 1
    assert not rows[2]["is_duplicate"]
