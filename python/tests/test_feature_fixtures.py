"""Per-package fixture tests for the feature stages, driven from Python
with the reference's expected values (mirrors the per-package suites in
flink-ml-python/pyflink/ml/feature/tests)."""

import pytest
from pyspark.ml.linalg import Vectors


def test_binarizer_custom_threshold(spark):
    from graftml import Binarizer
    df = spark.createDataFrame([(1.0,), (2.0,), (3.0,)], ["v"])
    out = (Binarizer(spark=spark)
           .setInputCols(["v"]).setOutputCols(["b"]).setThresholds([1.5])
           .transform(df))[0]
    assert [r["b"] for r in out.orderBy("v").collect()] == [0.0, 1.0, 1.0]


def test_polynomial_expansion_degree2(spark):
    from graftml import PolynomialExpansion
    df = spark.createDataFrame([(Vectors.dense([2.0, 3.0]),)], ["vec"])
    out = (PolynomialExpansion(spark=spark)
           .setInputCol("vec").setOutputCol("poly").setDegree(2)
           .transform(df))[0]
    got = out.collect()[0]["poly"]
    assert list(got) == [2.0, 4.0, 3.0, 6.0, 9.0]


def test_elementwise_product(spark):
    from graftml import ElementwiseProduct
    df = spark.createDataFrame([(Vectors.dense([2.1, 3.1]),)], ["vec"])
    out = (ElementwiseProduct(spark=spark)
           .setInputCol("vec").setOutputCol("scaled")
           .setScalingVec(Vectors.dense([1.1, 1.1]))
           .transform(df))[0]
    got = out.collect()[0]["scaled"]
    assert got[0] == pytest.approx(2.31, abs=1e-5)
    assert got[1] == pytest.approx(3.41, abs=1e-5)


def test_ngram_short_input_yields_empty(spark):
    from graftml import NGram
    df = spark.createDataFrame(
        [(0, ["a"]), (1, ["a", "b", "c"])], ["id", "words"])
    out = (NGram(spark=spark).setN(2)
           .setInputCol("words").setOutputCol("ngrams")
           .transform(df))[0]
    rows = {r["id"]: r["ngrams"] for r in out.collect()}
    assert rows[0] == []
    assert rows[1] == ["a b", "b c"]


def test_maxabs_scaler(spark):
    from graftml import MaxAbsScaler
    train = spark.createDataFrame(
        [(Vectors.dense([1.0, 2.0]),), (Vectors.dense([2.0, -4.0]),)], ["input"])
    model = (MaxAbsScaler(spark=spark)
             .setInputCol("input").setOutputCol("output").fit(train))
    got = model.transform(train)[0].collect()
    vals = sorted([list(r["output"]) for r in got])
    assert vals == [[0.5, 0.5], [1.0, -1.0]]


def test_imputer_mean(spark):
    from graftml import Imputer
    df = spark.createDataFrame(
        [(1.0,), (float("nan"),), (3.0,)], ["x"])
    model = (Imputer(spark=spark)
             .setInputCols(["x"]).setOutputCols(["x_imp"]).fit(df))
    got = sorted(r["x_imp"] for r in model.transform(df)[0].collect())
    assert got == [1.0, 2.0, 3.0]


def test_index_to_string_unseen_index_error(spark):
    from graftml import IndexToStringModel
    model_data = spark.createDataFrame(
        [(0, ["a", "b", "c", "d"])], ["colIdx", "terms"])
    m = (IndexToStringModel(spark=spark)
         .setInputCols(["idx"]).setOutputCols(["str"])
         .set_model_data(model_data))
    ok = m.transform(spark.createDataFrame([(0,), (3,)], ["idx"]))[0]
    assert sorted(r["str"] for r in ok.collect()) == ["a", "d"]
    bad = m.transform(spark.createDataFrame([(4,)], ["idx"]))[0]
    with pytest.raises(Exception) as e:
        bad.collect()
    assert "The input contains unseen index: 4." in str(e.value)


def test_vector_slicer(spark):
    from graftml import VectorSlicer
    df = spark.createDataFrame(
        [(Vectors.dense([2.1, 3.1, 2.3, 3.4]),)], ["vec"])
    out = (VectorSlicer(spark=spark)
           .setInputCol("vec").setOutputCol("sliced").setIndices([0, 2])
           .transform(df))[0]
    assert list(out.collect()[0]["sliced"]) == [2.1, 2.3]


def test_stopwords_remover(spark):
    from graftml import StopWordsRemover
    df = spark.createDataFrame(
        [(["test", "the", "quick", "a", "fox"],)], ["raw"])
    out = (StopWordsRemover(spark=spark)
           .setInputCols(["raw"]).setOutputCols(["filtered"])
           .transform(df))[0]
    assert out.collect()[0]["filtered"] == ["test", "quick", "fox"]


def test_functions_module_round_trip_and_cosine(spark):
    from graftml import functions as F
    from pyspark.sql.functions import col
    F.register(spark)
    df = spark.createDataFrame([([1.0, 0.0], [0.0, 2.0]), ([1.0, 1.0], [1.0, 1.0])],
                               ["a", "b"])
    out = df.select(
        F.vector_to_array(F.array_to_vector(col("a")))[0].alias("rt"),
        F.cosine_similarity(col("a"), col("b")).alias("cos")).collect()
    assert [r["rt"] for r in out] == [1.0, 1.0]
    assert abs(out[0]["cos"]) < 1e-12
    assert abs(out[1]["cos"] - 1.0) < 1e-12
