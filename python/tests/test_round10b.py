"""Second round-10 batch through the Python surface: silhouette
evaluation, categorical encoders, lag/rolling featurization, and HTML
extraction."""


def test_clustering_evaluator(spark):
    from graftml import ClusteringEvaluator
    pts = spark.createDataFrame(
        [(0, [0.0, 0.0]), (0, [0.2, 0.0]), (1, [9.0, 9.0]), (1, [9.2, 9.0])],
        ["cluster", "f"])
    rows = (ClusteringEvaluator(spark=spark)
            .setFeaturesCol("f").setPredictionCol("cluster")
            .transform(pts)[0].collect())
    sils = {r["cluster"]: r["mean_silhouette"] for r in rows}
    assert set(sils) == {0, 1}
    assert all(s > 0.99 for s in sils.values())


def test_target_and_frequency_encoders(spark):
    from graftml import TargetEncoder, FrequencyEncoder
    train = spark.createDataFrame(
        [("a", 1.0), ("a", 3.0), ("b", 10.0)], ["cat", "y"])
    te = (TargetEncoder(spark=spark).setInputCol("cat").setOutputCol("enc")
          .setLabelCol("y").setSmoothing(0.0).fit(train))
    test = spark.createDataFrame([("a",), ("zzz",)], ["cat"])
    enc = {r["cat"]: r["enc"] for r in te.transform(test)[0].collect()}
    assert abs(enc["a"] - 2.0) < 1e-12
    assert abs(enc["zzz"] - 14.0 / 3) < 1e-12  # prior

    fe = (FrequencyEncoder(spark=spark).setInputCol("cat").setOutputCol("enc")
          .fit(train))
    freq = {r["cat"]: r["enc"] for r in fe.transform(test)[0].collect()}
    assert abs(freq["a"] - 2.0 / 3) < 1e-12 and freq["zzz"] == 0.0


def test_lag_featurizer(spark):
    from graftml import LagFeaturizer
    ev = spark.createDataFrame(
        [("u", 1, 10.0), ("u", 2, 20.0), ("u", 3, 30.0)], ["k", "t", "v"])
    out = (LagFeaturizer(spark=spark).setInputCol("v")
           .setPartitionCols(["k"]).setOrderCols(["t"])
           .setNumLags(1).setRollingWindow(2)
           .transform(ev)[0].orderBy("t").collect())
    assert out[0]["v_lag1"] is None
    assert out[2]["v_lag1"] == 20.0
    assert out[2]["v_roll_mean"] == 15.0
    assert out[2]["t_delta"] == 1


def test_html_extractor(spark):
    from graftml import HtmlExtractor
    page = spark.createDataFrame(
        [(1, '<html><head><title>T</title></head>'
             '<body><p>hi &amp; bye</p><a href="/x">go</a></body></html>')],
        ["id", "html"])
    r = (HtmlExtractor(spark=spark).setInputCol("html").setOutputCol("h")
         .transform(page)[0].collect()[0])
    assert r["h_title"] == "T"
    assert r["h_text"] == "T hi & bye go"
    assert r["h_links"] == 1


def test_url_parser(spark):
    from graftml import UrlParser
    urls = spark.createDataFrame(
        [(1, "HTTPS://u@Www.Example.COM:8080/p/q?x=1#f"),
         (2, "http://bad.spam.biz/")], ["id", "url"])
    rows = (UrlParser(spark=spark).setInputCol("url").setOutputCol("u")
            .setBlockedDomains(["spam.biz"])
            .transform(urls)[0].orderBy("id").collect())
    assert rows[0]["u_host"] == "www.example.com"
    assert rows[0]["u_domain"] == "example.com"
    assert rows[0]["u_path"] == "/p/q" and rows[0]["u_query"] == "x=1"
    assert not rows[0]["u_blocked"] and rows[1]["u_blocked"]


def test_streaming_anomaly_detector_batch(spark):
    from graftml import StreamingAnomalyDetector
    ev = spark.createDataFrame(
        [("a", t, float(t % 3)) for t in range(1, 21)] + [("a", 21, 500.0)],
        ["k", "t", "v"])
    out = (StreamingAnomalyDetector(spark=spark)
           .setKeyCol("k").setOrderCol("t").setInputCol("v").setMinCount(5)
           .transform(ev)[0].orderBy("order").collect())
    assert out[-1]["anomaly"] and out[-1]["n_before"] == 20
    assert not any(r["anomaly"] for r in out[:-1])


def test_data_validator(spark):
    from graftml import DataValidator
    df = spark.createDataFrame([(1, 5.0), (2, None), (2, 7.0)], ["id", "v"])
    rows = (DataValidator(spark=spark)
            .addNotNull("v").addUnique("id")
            .transform(df)[0].collect())
    out = {r["check"]: (r["violations"], r["pass"]) for r in rows}
    assert out["1_not_null"] == (1, False)
    assert out["2_unique"] == (2, False)


def test_intradoc_deduplicator(spark):
    from graftml import IntraDocDeduplicator
    docs = spark.createDataFrame([(1, "a\nb\na\nc\nb")], ["id", "text"])
    r = (IntraDocDeduplicator(spark=spark).setInputCol("text").setOutputCol("d")
         .transform(docs)[0].collect()[0])
    assert r["d_text"] == "a\nb\nc" and r["d_kept"] == 3 and r["d_removed"] == 2


def test_column_profiler(spark):
    from graftml import ColumnProfiler
    df = spark.createDataFrame([(1, "aa"), (2, "bbb"), (2, None)], ["n", "s"])
    rows = (ColumnProfiler(spark=spark).setInputCols(["n", "s"])
            .setExactDistinct(True).transform(df)[0].collect())
    out = {r["column"]: r for r in rows}
    assert out["n"]["distinct_cnt"] == 2 and out["n"]["vmax"] == 2.0
    assert out["s"]["nulls"] == 1 and out["s"]["min_len"] == 2


def test_fuzzy_joiner(spark):
    from graftml import FuzzyJoiner
    l = spark.createDataFrame([(1, "kitten")], ["id", "s"])
    r = spark.createDataFrame([(10, "mitten"), (11, "dog")], ["id", "s"])
    out = (FuzzyJoiner(spark=spark).setIdCol("id").setInputCol("s")
           .setMaxDistance(1).transform(l, r)[0].collect())
    assert [(x["left_id"], x["right_id"], x["distance"]) for x in out] == [(1, 10, 1)]


def test_scd2_builder(spark):
    from graftml import Scd2Builder
    log = spark.createDataFrame(
        [("u", 1, "a"), ("u", 2, "a"), ("u", 3, "b")], ["k", "ts", "v"])
    out = (Scd2Builder(spark=spark).setKeyCols(["k"]).setOrderCol("ts")
           .transform(log)[0].orderBy("valid_from").collect())
    assert [(r["v"], r["valid_from"], r["valid_to"], r["is_current"]) for r in out] \
        == [("a", 1, 3, False), ("b", 3, None, True)]


def test_weighted_sampler(spark):
    from graftml import WeightedSampler
    df = spark.createDataFrame(
        [(i, 9.0 if i % 2 == 0 else 1.0) for i in range(2000)], ["id", "w"])
    out = (WeightedSampler(spark=spark)
           .setIdCol("id").setWeightCol("w").setSampleSize(200).setSeed(7)
           .transform(df)[0].collect())
    ids = [r["id"] for r in out]
    assert len(ids) == 200 and len(set(ids)) == 200
    high = sum(1 for i in ids if i % 2 == 0)
    assert high > 150  # 9:1 weights must dominate the sample


def test_correlation_matrix(spark):
    from graftml import CorrelationMatrix
    df = spark.createDataFrame(
        [(1.0, 2.0, -1.0), (2.0, 4.0, -2.0), (3.0, 6.0, -3.0)], ["a", "b", "c"])
    rows = (CorrelationMatrix(spark=spark).setInputCols(["a", "b", "c"])
            .transform(df)[0].collect())
    out = {(r["col_a"], r["col_b"]): r["corr"] for r in rows}
    assert abs(out[("a", "b")] - 1.0) < 1e-12
    assert abs(out[("a", "c")] + 1.0) < 1e-12


def test_isotonic_calibrator(spark):
    from graftml import IsotonicCalibrator
    df = spark.createDataFrame(
        [(1.0, 1.0), (2.0, 0.0), (3.0, 1.0)], ["p", "y"])
    m = (IsotonicCalibrator(spark=spark)
         .setPredictionCol("p").setLabelCol("y").fit(df))
    out = m.transform(spark.createDataFrame([(1.5,), (3.0,)], ["p"]))[0] \
        .orderBy("p").collect()
    assert abs(out[0]["calibrated"] - 0.5) < 1e-12
    assert abs(out[1]["calibrated"] - 1.0) < 1e-12


def test_entity_resolver(spark):
    from graftml import EntityResolver
    df = spark.createDataFrame(
        [(1, "jon"), (2, "john"), (3, "johnn"), (4, "mary")], ["id", "s"])
    out = (EntityResolver(spark=spark)
           .setIdCol("id").setInputCol("s").setMaxDistance(1)
           .transform(df)[0].orderBy("id").collect())
    assert [r["entity_id"] for r in out] == [1, 1, 1, 4]


def test_calibration_evaluator(spark):
    from graftml import CalibrationEvaluator
    df = spark.createDataFrame(
        [(0.2, 0.0), (0.4, 1.0), (0.8, 1.0), (0.8, 1.0), (1.0, 1.0)], ["p", "y"])
    rows = (CalibrationEvaluator(spark=spark)
            .setPredictionCol("p").setLabelCol("y").setNumBins(2)
            .transform(df)[0].collect())
    bins = {r["bin"]: r for r in rows}
    assert bins[0]["n"] == 2 and abs(bins[0]["mean_pred"] - 0.3) < 1e-12
    assert abs(bins[0]["gap"] - 0.2) < 1e-12
    assert bins[1]["n"] == 3 and abs(bins[1]["frac_pos"] - 1.0) < 1e-12
