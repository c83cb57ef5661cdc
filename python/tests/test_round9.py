"""Round-9 features through the Python surface: quantized IVF indexes
(int8 + PQ codecs) and versioned delay-gated OnlineKMeans inference."""

from pyspark.ml.linalg import Vectors


def _corpus(spark, n=80):
    import random
    rnd = random.Random(5)
    rows = []
    for i in range(n):
        c = i % 2
        base = [5.0 if j == c * 4 else 0.0 for j in range(8)]
        rows.append((i, Vectors.dense([b + rnd.gauss(0, 0.3) for b in base])))
    return spark.createDataFrame(rows, ["id", "vec"])


def test_ivf_quantized_probe(spark):
    from graftml import IvfIndexer
    corpus = _corpus(spark)
    model = (IvfIndexer(spark=spark)
             .setIdCol("id").setVecCol("vec")
             .setNumLists(2).setTrainIters(5).setSeed(7)
             .setQuantize(True)
             .fit(corpus))
    queries = spark.createDataFrame(
        [(1000, Vectors.dense([5.0, 0.1, 0.0, 0.1, 0.0, 0.0, 0.1, 0.0]))], ["id", "vec"])
    out = model.setK(3).setNprobe(1).transform(queries)[0].collect()
    assert len(out) == 3
    # cluster 0 neighbors only (even ids)
    assert all(r["neighbor_id"] % 2 == 0 for r in out)


def test_ivf_pq_probe(spark):
    from graftml import IvfIndexer
    corpus = _corpus(spark)
    model = (IvfIndexer(spark=spark)
             .setIdCol("id").setVecCol("vec")
             .setNumLists(2).setTrainIters(5).setSeed(7)
             .setQuantizer("pq").setPqSubspaces(4).setPqCodes(16)
             .fit(corpus))
    queries = spark.createDataFrame(
        [(1000, Vectors.dense([0.0, 0.1, 0.0, 0.1, 5.0, 0.0, 0.1, 0.0]))], ["id", "vec"])
    out = model.setK(3).setNprobe(1).transform(queries)[0].collect()
    assert len(out) == 3
    assert all(r["neighbor_id"] % 2 == 1 for r in out)


def test_online_kmeans_versioned_inference(spark):
    from graftml import OnlineKMeansModel
    init = spark.createDataFrame(
        [(0, Vectors.dense([0.0]), 1.0), (1, Vectors.dense([10.0]), 1.0)],
        ["centroidId", "centroid", "weight"])
    model = OnlineKMeansModel(spark=spark).setDecayFactor(0.5).set_model_data(init)

    def batch(xs):
        return spark.createDataFrame(
            [(Vectors.dense([x]),) for x in xs], ["features"])

    m1 = model.update(batch([1.0, 9.0]), "features", 1000)   # version 1 @ 1000
    m2 = m1.update(batch([2.0, 8.0]), "features", 2000)      # version 2 @ 2000
    probes = spark.createDataFrame(
        [(1, 500, Vectors.dense([1.0])),
         (2, 1500, Vectors.dense([9.0])),
         (3, 99999, Vectors.dense([1.0]))],
        ["id", "ts", "features"])
    out = (m2.setMaxAllowedModelDelayMs(0).setTimeCol("ts")
           .setModelVersionCol("ver").transform(probes)[0]
           .select("id", "ver", "prediction").collect())
    by_id = {r["id"]: (r["ver"], r["prediction"]) for r in out}
    assert by_id[1] == (1, 0)
    assert by_id[2] == (2, 1)
    assert by_id[3] == (-1, None)  # newer than every version -> null/-1
