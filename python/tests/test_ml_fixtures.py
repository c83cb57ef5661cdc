"""Per-package fixture tests for classification / clustering / stats
stages, driven from Python with the reference's expected values
(mirrors flink-ml-python/pyflink/ml/{classification,clustering,stats}/tests)."""

import pytest
from pyspark.ml.linalg import Vectors

BINOMIAL = [
    (Vectors.dense([1, 2, 3, 4]), 0.0, 1.0), (Vectors.dense([2, 2, 3, 4]), 0.0, 2.0),
    (Vectors.dense([3, 2, 3, 4]), 0.0, 3.0), (Vectors.dense([4, 2, 3, 4]), 0.0, 4.0),
    (Vectors.dense([5, 2, 3, 4]), 0.0, 5.0), (Vectors.dense([11, 2, 3, 4]), 1.0, 1.0),
    (Vectors.dense([12, 2, 3, 4]), 1.0, 2.0), (Vectors.dense([13, 2, 3, 4]), 1.0, 3.0),
    (Vectors.dense([14, 2, 3, 4]), 1.0, 4.0), (Vectors.dense([15, 2, 3, 4]), 1.0, 5.0)]


def _binomial_df(spark):
    return spark.createDataFrame(BINOMIAL, ["features", "label", "weight"])


def test_linear_svc_reference_coefficients(spark):
    from graftml import LinearSVC
    model = (LinearSVC(spark=spark).setWeightCol("weight")
             .fit(_binomial_df(spark)))
    coeff = list(model.get_model_data()[0].collect()[0]["coefficient"])
    expected = [0.470, -0.273, -0.410, -0.546]
    for c, e in zip(coeff, expected):
        assert c == pytest.approx(e, abs=0.1)


def test_logistic_regression_regularized_coefficients(spark):
    from graftml import LogisticRegression
    model = (LogisticRegression(spark=spark).setWeightCol("weight")
             .setReg(0.1).setElasticNet(0.5)
             .fit(_binomial_df(spark)))
    coeff = list(model.get_model_data()[0].collect()[0]["coefficient"])
    expected = [0.451, -0.203, -0.351, -0.498]
    for c, e in zip(coeff, expected):
        assert c == pytest.approx(e, abs=1e-3)


def test_logistic_regression_multinomial_rejected(spark):
    from graftml import LogisticRegression
    with pytest.raises(Exception) as e:
        (LogisticRegression(spark=spark).setMultiClass("multinomial")
         .fit(_binomial_df(spark)))
    assert "Multinomial classification is not supported yet" in str(e.value)


def test_kmeans_reference_centroids(spark):
    from graftml import KMeans
    df = spark.createDataFrame(
        [(Vectors.dense([0.0, 0.0]),), (Vectors.dense([0.0, 0.3]),),
         (Vectors.dense([0.3, 0.0]),), (Vectors.dense([9.0, 0.0]),),
         (Vectors.dense([9.0, 0.6]),), (Vectors.dense([9.6, 0.0]),)],
        ["features"])
    model = KMeans(spark=spark).setK(2).setMaxIter(10).setSeed(42).fit(df)
    cents = sorted([list(r["centroid"]) for r in model.get_model_data()[0].collect()])
    assert cents[0] == pytest.approx([0.1, 0.1], abs=1e-5)
    assert cents[1] == pytest.approx([9.2, 0.2], abs=1e-5)


def test_agglomerative_ward_merge_distances(spark):
    from graftml import AgglomerativeClustering
    df = spark.createDataFrame(
        [(Vectors.dense([1, 1]),), (Vectors.dense([1, 4]),), (Vectors.dense([1, 0]),),
         (Vectors.dense([4, 4]),), (Vectors.dense([4, 1.5]),), (Vectors.dense([4, 0]),)],
        ["features"])
    outs = (AgglomerativeClustering(spark=spark)
            .setLinkage("ward").setComputeFullTree(True).transform(df))
    dists = [r["distance"] for r in outs[1].collect()]
    expected = [1.0, 1.5, 3.0, 4.2573465, 5.5113519]
    for d, e in zip(dists, expected):
        assert d == pytest.approx(e, abs=1e-6)


def test_chisq_reference_pvalues(spark):
    from graftml import ChiSqTest
    rows = [
        (0.0, Vectors.dense([5, 1.0])), (2.0, Vectors.dense([6, 2.0])),
        (1.0, Vectors.dense([7, 2.0])), (1.0, Vectors.dense([5, 4.0])),
        (0.0, Vectors.dense([5, 1.0])), (2.0, Vectors.dense([6, 2.0])),
        (1.0, Vectors.dense([7, 2.0])), (1.0, Vectors.dense([5, 4.0])),
        (2.0, Vectors.dense([5, 1.0])), (0.0, Vectors.dense([5, 2.0])),
        (0.0, Vectors.dense([5, 2.0])), (1.0, Vectors.dense([9, 4.0])),
        (1.0, Vectors.dense([9, 3.0]))]
    df = spark.createDataFrame(rows, ["label", "features"])
    r = ChiSqTest(spark=spark).transform(df)[0].collect()[0]
    assert r["pValues"][0] == pytest.approx(0.03419350755, abs=1e-9)
    assert r["pValues"][1] == pytest.approx(0.24220177737, abs=1e-9)


def test_naive_bayes_predicts_labels(spark):
    from graftml import NaiveBayes
    train = spark.createDataFrame(
        [(Vectors.dense([0.0, 0.0]), 11.0), (Vectors.dense([0.0, 1.0]), 11.0),
         (Vectors.dense([1.0, 0.0]), 12.0), (Vectors.dense([1.0, 1.0]), 12.0)],
        ["features", "label"])
    model = NaiveBayes(spark=spark).setSmoothing(1.0).fit(train)
    out = model.transform(train)[0]
    got = {tuple(r["features"]): r["prediction"] for r in out.collect()}
    assert got[(0.0, 0.0)] == 11.0
    assert got[(1.0, 1.0)] == 12.0


def test_online_lr_model_version_col_default(spark):
    from graftml import OnlineLogisticRegressionModel
    m = OnlineLogisticRegressionModel(spark=spark)
    assert m.getModelVersionCol() == "modelVersion"
