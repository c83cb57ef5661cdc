"""Round-13 stages: video perceptual dedup, transitive Hamming
clustering, incremental perceptual index, PageRank output naming."""


def _ham(a, b):
    return bin((a ^ b) & ((1 << 64) - 1)).count("1")


def _vid(spark, group, num_frames=5, brightness=0, stretch=1, flip_mask=0,
         fmt="png"):
    b = spark._jvm.graft.multimodal.VideoDHasher.syntheticCellVideo(
        group, num_frames, brightness, stretch, flip_mask, fmt)
    return bytes(b)


def test_video_dhash_invariances_and_join(spark):
    from graftml import VideoDHasher
    rows = [
        (0, _vid(spark, 1)),
        (1, _vid(spark, 1, brightness=40)),   # re-grade: invariant
        (2, _vid(spark, 1, stretch=2)),       # frame-stretch: invariant
        (3, _vid(spark, 1, flip_mask=1)),     # 1-bit flip per frame
        (4, _vid(spark, 2)),                  # different clip: far
        (5, b"not a video"),
    ]
    df = spark.createDataFrame(rows, ["id", "video"])
    hasher = VideoDHasher(spark=spark).setInputCol("video").setOutputCol("sig")
    hashed = hasher.transform(df)[0]
    sig = {r["id"]: r["sig"] for r in hashed.collect()}
    assert sig[0] == sig[1] == sig[2]
    assert _ham(sig[0]["fp_first"], sig[3]["fp_first"]) == 1
    assert _ham(sig[0]["fp_mid"], sig[3]["fp_mid"]) == 1
    assert _ham(sig[0]["fp_last"], sig[3]["fp_last"]) == 1
    assert _ham(sig[0]["fp_first"], sig[4]["fp_first"]) > 8
    assert sig[5] is None
    # similarityJoin delegates through the wrapper's __getattr__
    pairs = sorted((r[0], r[1], r[2])
                   for r in hasher.similarityJoin(hashed, "id", 3, 4).collect())
    assert pairs == [(0, 1, 0), (0, 2, 0), (0, 3, 1), (1, 2, 0),
                     (1, 3, 1), (2, 3, 1)]


def test_hamming_cluster_components_closes_chains(spark):
    from graftml.functions import hamming_cluster, hamming_cluster_components
    rows = [(0, 0x00), (1, 0x07), (2, 0x3F), (3, 0x3F), (9, 0xAAAA5555)]
    df = spark.createDataFrame(rows, ["id", "fp"])
    # single-hop: the chain end points at its direct neighbor, not the root
    direct = {r["id"]: r["cluster_id"]
              for r in hamming_cluster(df, "id", "fp", 3).collect()}
    assert direct[1] == 0 and direct[2] == 1
    # transitive closure: one canonical id for the whole chain
    closed = {r["id"]: (r["cluster_id"], r["is_duplicate"], r["rep_hamming"])
              for r in hamming_cluster_components(df, "id", "fp", 3).collect()}
    assert closed[0] == (0, False, 0)
    assert closed[1] == (0, True, 3)
    assert closed[2] == (0, True, 6)   # rep distance measures the closure's reach
    assert closed[3] == (0, True, 6)
    assert closed[9] == (9, False, 0)


def test_hamming_indexer_incremental(spark):
    from graftml import HammingIndexer
    corpus = spark.createDataFrame([(0, 0x00), (2, 0xFF00FF00)], ["id", "fp"])
    indexer = (HammingIndexer(spark=spark)
               .setMaxHamming(3).setNumBands(4))
    model = indexer.fit(corpus)
    batch1 = spark.createDataFrame([(10, 0x0F0F0F0F)], ["id", "fp"])  # novel
    out1 = {r["id"]: r["is_duplicate"] for r in model.transform(batch1)[0].collect()}
    assert out1 == {10: False}
    grown = model.addToIndex(batch1)  # re-wraps as HammingIndexModel
    batch2 = spark.createDataFrame(
        [(20, 0x0F0F0F0E), (21, 0x01)], ["id", "fp"])  # 1 bit from 10, 1 bit from 0
    out2 = {r["id"]: r["matched_id"] for r in grown.transform(batch2)[0].collect()}
    assert out2 == {20: 10, 21: 0}


def test_page_rank_output_naming(spark):
    from graftml.functions import page_rank
    edges = spark.createDataFrame([(1, 2), (2, 1), (3, 1)], ["src", "dst"])
    out = page_rank(edges, num_iter=5, id_out="vertex", rank_out="score")
    assert out.columns == ["vertex", "score"]
    ranks = {r["vertex"]: r["score"] for r in out.collect()}
    assert abs(sum(ranks.values()) - 1.0) < 1e-9
    out.unpersist()


def test_hamming_cluster_multi_cross_modal_closure(spark):
    from graftml.functions import hamming_cluster_multi
    # image links 0-1, text links 1-2; 3 is a singleton; 4 has a null
    # image fingerprint but still dedups by text with 5
    rows = [
        (0, 0x7, 0x1),
        (1, 0x7, 0xFF00),
        (2, 0xF0F0, 0xFF01),
        (3, 0xFF000000, 0xF0F0F0F0),
        (4, None, 0xAAAA00000000),
        (5, 0x123400000000, 0xAAAA00000001),
    ]
    df = spark.createDataFrame(rows, ["id", "img_fp", "text_fp"])
    out = {r["id"]: (r["cluster_id"], r["is_duplicate"], r["via"])
           for r in hamming_cluster_multi(
               df, "id", {"image": "img_fp", "text": "text_fp"}, 3).collect()}
    assert out[0] == (0, False, "image")
    assert out[1] == (0, True, "image,text")   # cross-modal chain roots at 0
    assert out[2] == (0, True, "text")
    assert out[3] == (3, False, "")
    assert out[4] == (4, False, "text")
    assert out[5] == (4, True, "text")


def test_online_pca_versions_and_projection(spark):
    from pyspark.ml.linalg import Vectors
    from graftml import OnlinePCA
    rows = [(i, Vectors.dense([float(i), 2.0 * i + (i % 3), float(i % 5)]))
            for i in range(20)]
    df = spark.createDataFrame(rows, ["ts", "vec"])
    w = spark._jvm.graft.streaming.EventTimeTumblingWindows(10)
    model = (OnlinePCA(spark=spark)
             .setInputCol("vec").setK(3).setTimeCol("ts")
             .setWindows(w).fit(df))
    versions = {r["version"]: r["count"]
                for r in model.get_model_data()[0].collect()}
    assert versions == {0: 10, 1: 20}
    # full-rank projection preserves the centered squared norm
    out = (model.setOutputCol("proj").setMaxAllowedModelDelayMs(0)
           .transform(df)[0].collect())
    means = {r["version"]: list(r["mean"])
             for r in model.get_model_data()[0].collect()}
    for r in out:
        mu = means[r["version"]]
        centered = sum((a - m) ** 2 for a, m in zip(r["vec"], mu))
        proj_sq = sum(x * x for x in r["proj"])
        assert abs(proj_sq - centered) < 1e-8
    # as-of picking: ts=5 -> version 0, ts=15 -> version 1
    ver = {r["ts"]: r["version"] for r in out}
    assert ver[5] == 0 and ver[15] == 1


def test_personalized_page_rank_seed_bias(spark):
    from graftml.functions import page_rank, personalized_page_rank
    # two loosely-linked triangles; seed the first one
    edges = spark.createDataFrame(
        [(0, 1), (1, 2), (2, 0), (2, 10), (10, 11), (11, 12), (12, 10)],
        ["src", "dst"])
    seeds = spark.createDataFrame([(0,)], ["id"])
    out = personalized_page_rank(edges, seeds, num_iter=25)
    ranks = {r["id"]: r["pagerank"] for r in out.collect()}
    out.unpersist()
    assert abs(sum(ranks.values()) - 1.0) < 1e-9
    assert ranks[0] + ranks[1] + ranks[2] > ranks[10] + ranks[11] + ranks[12]
    # seeding everything recovers classic PageRank
    allseeds = spark.createDataFrame([(i,) for i in (0, 1, 2, 10, 11, 12)], ["id"])
    ppr = personalized_page_rank(edges, allseeds, num_iter=15)
    classic = page_rank(edges, num_iter=15)
    a = {r["id"]: r["pagerank"] for r in ppr.collect()}
    b = {r["id"]: r["pagerank"] for r in classic.collect()}
    ppr.unpersist()
    classic.unpersist()
    assert all(abs(a[k] - b[k]) < 1e-12 for k in a)


def test_label_propagation_cliques(spark):
    from graftml.functions import label_propagation
    # two 4-cliques -> each converges to its min id
    rows = [(b + i, b + j) for b in (0, 10)
            for i in range(4) for j in range(i + 1, 4)]
    edges = spark.createDataFrame(rows, ["src", "dst"])
    out = label_propagation(edges, num_iter=10, id_out="vertex",
                            label_out="community")
    got = {r["vertex"]: r["community"] for r in out.collect()}
    out.unpersist()
    assert all(got[v] == 0 for v in range(4))
    assert all(got[v] == 10 for v in range(10, 14))


def test_video_cluster_components_closes_chains(spark):
    from graftml import VideoDHasher
    rows = [
        (0, _vid(spark, 1)),
        (1, _vid(spark, 1, flip_mask=0x07)),   # every slot moves 3 bits
        (2, _vid(spark, 1, flip_mask=0x3F)),   # 6 from base: chain end
        (9, _vid(spark, 2)),
    ]
    df = spark.createDataFrame(rows, ["id", "video"])
    h = VideoDHasher(spark=spark).setInputCol("video").setOutputCol("sig")
    hashed = h.transform(df)[0]
    closed = {r["id"]: (r["cluster_id"], r["is_duplicate"])
              for r in h.clusterComponents(hashed, "id", 3, 4).collect()}
    assert closed[0] == (0, False)
    assert closed[1] == (0, True)
    assert closed[2] == (0, True)   # beyond maxHamming from the root, still closed
    assert closed[9] == (9, False)
