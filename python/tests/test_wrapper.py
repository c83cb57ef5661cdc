"""End-to-end tests of the Python surface: every stage fits and/or
transforms through py4j against a local SparkSession, with results
asserted in Python. Mirrors the reference's pyflink ml tests
(flink-ml-python/pyflink/ml/tests)."""

from pyspark.ml.linalg import Vectors


def test_tokenizer_transform(spark):
    from graftml import Tokenizer
    df = spark.createDataFrame([(0, "Hello World"), (1, "spark ML")], ["id", "text"])
    out = (Tokenizer(spark=spark)
           .setInputCol("text").setOutputCol("tokens")
           .transform(df))[0]
    rows = {r["id"]: r["tokens"] for r in out.collect()}
    assert rows[0] == ["hello", "world"]
    assert rows[1] == ["spark", "ml"]


def test_snake_case_params_alias_scala_names(spark):
    from graftml import Tokenizer
    t = Tokenizer(spark=spark).set_input_col("text").set_output_col("toks")
    assert t.get_input_col() == "text"
    assert t.getOutputCol() == "toks"


def test_standard_scaler_fit_transform(spark):
    from graftml import StandardScaler, StandardScalerModel
    df = spark.createDataFrame(
        [(Vectors.dense([1.0]),), (Vectors.dense([2.0]),), (Vectors.dense([3.0]),)],
        ["features"])
    model = (StandardScaler(spark=spark)
             .setInputCol("features").setOutputCol("scaled")
             .setWithMean(True).setWithStd(True)
             .fit(df))
    assert isinstance(model, StandardScalerModel)
    got = sorted(r["scaled"][0] for r in model.transform(df)[0].collect())
    assert abs(got[1] - 0.0) < 1e-9            # mean-centered
    assert abs(got[2] - 1.0) < 1e-9            # unit std (sample)


def test_kmeans_fit_predict(spark):
    from graftml import KMeans
    pts = [(Vectors.dense([x, 0.0]),) for x in (0.0, 0.2, 10.0, 10.2)]
    df = spark.createDataFrame(pts, ["features"])
    model = (KMeans(spark=spark)
             .setK(2).setSeed(7).setMaxIterK(5)
             .setFeaturesCol("features")
             .fit(df))
    pred = [r["prediction"] for r in model.transform(df)[0].collect()]
    assert pred[0] == pred[1] and pred[2] == pred[3] and pred[0] != pred[2]


def test_logistic_regression_fit_predict(spark):
    from graftml import LogisticRegression
    # no intercept term, so classes sit on either side of the origin
    rows = [(Vectors.dense([-1.0]), 0.0), (Vectors.dense([-0.9]), 0.0),
            (Vectors.dense([0.9]), 1.0), (Vectors.dense([1.0]), 1.0)]
    df = spark.createDataFrame(rows, ["features", "label"])
    model = (LogisticRegression(spark=spark)
             .setFeaturesCol("features").setLabelCol("label")
             .setMaxIter(50).setLearningRate(0.5).setGlobalBatchSize(4)
             .setReg(0.0).setElasticNet(0.0)
             .fit(df))
    preds = {r["features"][0]: r["prediction"]
             for r in model.transform(df)[0].collect()}
    assert preds[-1.0] == 0.0 and preds[1.0] == 1.0


def test_minhash_deduplicator_flags_planted_duplicate(spark):
    from graftml import MinHashDeduplicator
    # shingle-set vectors: doc 2 is an exact duplicate of doc 0
    shared = Vectors.sparse(64, [1, 5, 9, 21, 33], [1.0] * 5)
    other = Vectors.sparse(64, [2, 7, 40, 51, 60], [1.0] * 5)
    df = spark.createDataFrame(
        [(0, shared), (1, other), (2, shared)], ["doc_id", "tf"])
    out = (MinHashDeduplicator(spark=spark)
           .setIdCol("doc_id").setInputCol("tf")
           .setSeed(2022).setNumHashTables(4).setThreshold(0.5)
           .transform(df))[0]
    got = {r["doc_id"]: (r["canonical_id"], r["is_duplicate"]) for r in out.collect()}
    assert got[0] == (0, False)
    assert got[1] == (1, False)
    assert got[2] == (0, True)


def test_pipeline_chains_estimators(spark):
    from graftml import Pipeline, PipelineModel, StandardScaler, KMeans
    pts = [(Vectors.dense([x]),) for x in (0.0, 0.5, 99.5, 100.0)]
    df = spark.createDataFrame(pts, ["features"])
    pipeline = Pipeline(
        [StandardScaler(spark=spark).setInputCol("features").setOutputCol("scaled"),
         KMeans(spark=spark).setFeaturesCol("scaled").setK(2).setSeed(3).setMaxIterK(5)],
        spark=spark)
    model = pipeline.fit(df)
    assert isinstance(model, PipelineModel)
    out = model.transform(df)[0]
    pred = [r["prediction"] for r in out.collect()]
    assert pred[0] == pred[1] and pred[2] == pred[3] and pred[0] != pred[2]


def test_model_data_is_a_dataframe(spark):
    from graftml import KMeans
    pts = [(Vectors.dense([x]),) for x in (0.0, 1.0, 10.0, 11.0)]
    df = spark.createDataFrame(pts, ["features"])
    model = (KMeans(spark=spark).setK(2).setSeed(1).setMaxIterK(3)
             .setFeaturesCol("features").fit(df))
    centroids = model.get_model_data()[0]
    assert centroids.count() == 2
    assert "centroid" in centroids.columns


def test_every_registered_stage_constructs_and_roundtrips_a_param(spark):
    """Param parity is structural: each wrapper holds a real JVM stage,
    so constructing every registered class and round-tripping a string
    param through the snake_case alias proves the whole surface is
    wired, not just the individually-tested stages."""
    import graftml
    from graftml.wrapper import _REGISTRY
    for qualname, cls in sorted(_REGISTRY.items()):
        stage = cls(spark=spark) if "Pipeline" not in qualname else cls([], spark=spark)
        jcls = stage._jobj.getClass().getName()
        assert jcls == qualname, (jcls, qualname)


def test_count_vectorizer_fit_transform(spark):
    from graftml import RegexTokenizer, CountVectorizer
    df = spark.createDataFrame(
        [(0, "a b a"), (1, "b c")], ["id", "text"])
    toks = (RegexTokenizer(spark=spark)
            .set_input_col("text").set_output_col("tokens").set_pattern("\\s+")
            .transform(df))[0]
    model = (CountVectorizer(spark=spark)
             .setInputCol("tokens").setOutputCol("tf")
             .fit(toks))
    vocab_size = {r["id"]: len(r["tf"]) for r in model.transform(toks)[0].collect()}
    assert vocab_size[0] == 3 and vocab_size[1] == 3  # 3-term vocabulary


def test_string_indexer_orders_by_frequency(spark):
    from graftml import StringIndexer
    df = spark.createDataFrame(
        [("b",), ("b",), ("a",), ("b",), ("a",), ("c",)], ["s"])
    model = (StringIndexer(spark=spark)
             .setInputCols(["s"]).setOutputCols(["idx"])  # varargs → list
             .setStringOrderType("frequencyDesc")
             .fit(df))
    got = {r["s"]: r["idx"] for r in model.transform(df)[0].collect()}
    assert got["b"] == 0.0 and got["a"] == 1.0 and got["c"] == 2.0


def test_exact_dedup_and_quality_chain(spark):
    from graftml import ExactDeduplicator, TextQualityScorer
    df = spark.createDataFrame(
        [(0, "the quick brown fox"), (1, "the quick brown fox"), (2, "other text here")],
        ["doc_id", "text"])
    deduped = (ExactDeduplicator(spark=spark)
               .setIdCol("doc_id").setInputCol("text")
               .transform(df))[0]
    flags = {r["doc_id"]: r["is_exact_duplicate"] for r in deduped.collect()}
    assert flags == {0: False, 1: True, 2: False}
    scored = (TextQualityScorer(spark=spark).setInputCol("text")
              .transform(deduped.where("NOT is_exact_duplicate")))[0]
    assert scored.count() == 2 and "quality_score" in scored.columns
