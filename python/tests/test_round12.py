"""Round-12 stages: perceptual image/audio dedup (dHash + banded Hamming join)."""


def _ham(a, b):
    # 64-bit popcount: JVM longs arrive SIGNED, and bin() of a negative
    # XOR shows the magnitude, not the two's-complement bit pattern —
    # mask to unsigned 64-bit first or bit-63 differences miscount
    return bin((a ^ b) & ((1 << 64) - 1)).count("1")


def _img(spark, group, brightness=0, flip=False, fmt="png", flip_mask=0):
    # 5th arg = flipMask (round 13); py4j resolves by exact arity
    b = spark._jvm.graft.multimodal.ImageDHasher.syntheticCellImage(
        group, brightness, flip, fmt, flip_mask)
    return bytes(b)


def test_image_dhash_invariances(spark):
    from graftml import ImageDHasher
    rows = [
        (0, _img(spark, 1)),
        (1, _img(spark, 1, brightness=40)),   # recolor: invariant
        (2, _img(spark, 1, fmt="bmp")),       # lossless re-encode: invariant
        (3, _img(spark, 1, flip=True)),       # one-cell flip: Hamming 1
        (4, _img(spark, 2)),                  # different group: far
        (5, b"not an image"),
    ]
    df = spark.createDataFrame(rows, ["id", "img"])
    hasher = ImageDHasher(spark=spark).setInputCol("img").setOutputCol("dhash")
    hashed = hasher.transform(df)[0]
    fp = {r["id"]: r["dhash"] for r in hashed.collect()}
    assert fp[0] == fp[1] == fp[2]
    assert _ham(fp[0], fp[3]) == 1
    assert _ham(fp[0], fp[4]) > 8
    assert fp[5] is None


def _wav(spark, group, gain=1, stretch=1, flip=False):
    b = spark._jvm.graft.multimodal.AudioDHasher.syntheticWindowWav(
        group, gain, stretch, flip)
    return bytes(b)


def test_audio_dhash_invariances(spark):
    from graftml import AudioDHasher
    rows = [
        (0, _wav(spark, 1)),
        (1, _wav(spark, 1, gain=2)),       # gain: invariant
        (2, _wav(spark, 1, stretch=2)),    # time-stretch: invariant
        (3, _wav(spark, 1, flip=True)),    # one-window flip: Hamming 1
        (4, _wav(spark, 2)),               # different group: far
        (5, b"not audio"),
    ]
    df = spark.createDataFrame(rows, ["id", "wav"])
    hasher = AudioDHasher(spark=spark).setInputCol("wav").setOutputCol("ahash")
    fp = {r["id"]: r["ahash"] for r in hasher.transform(df)[0].collect()}
    assert fp[0] == fp[1] == fp[2]
    assert _ham(fp[0], fp[3]) == 1
    assert _ham(fp[0], fp[4]) > 8
    assert fp[5] is None


def test_keyword_extractor(spark):
    from graftml import KeywordExtractor
    docs = spark.createDataFrame(
        [("spark runs fast",), ("spark runs jobs",), ("fast spark",)], ["text"])
    rows = (KeywordExtractor(spark=spark).setInputCol("text")
            .setNumIter(10).setTopK(2).transform(docs)[0].collect())
    assert len(rows) == 2
    # weighted degrees: runs=4 (spark x2, fast, jobs), spark=3 — the
    # hub words win over fast(2)/jobs(1)
    assert rows[0]["word"] == "runs"
    assert {r["word"] for r in rows} == {"runs", "spark"}
    assert rows[0]["rank"] >= rows[1]["rank"]


def test_hamming_cluster_function(spark):
    from graftml import ImageDHasher
    from graftml.functions import hamming_cluster, hamming_pairs
    rows = [(g * 4 + v,
             _img(spark, g, brightness=40 if v == 1 else 0,
                  flip=(v == 3), fmt="bmp" if v == 2 else "png"))
            for g in range(2) for v in range(4)]
    df = spark.createDataFrame(rows, ["id", "img"])
    hashed = (ImageDHasher(spark=spark).setInputCol("img")
              .setOutputCol("fp").transform(df)[0])
    assert hamming_pairs(hashed, "id", "fp", 3).count() == 12
    got = {r["id"]: (r["cluster_id"], r["is_duplicate"], r["rep_hamming"])
           for r in hamming_cluster(hashed, "id", "fp", 3).collect()}
    for i in range(8):
        assert got[i] == ((i // 4) * 4, i % 4 != 0, 1 if i % 4 == 3 else 0), got[i]


def test_image_dhash_similarity_join(spark):
    from graftml import ImageDHasher
    from pyspark.sql import DataFrame as PyDF
    rows = [(g * 4 + v,
             _img(spark, g, brightness=40 if v == 1 else 0,
                  flip=(v == 3), fmt="bmp" if v == 2 else "png"))
            for g in range(3) for v in range(4)]
    df = spark.createDataFrame(rows, ["id", "img"])
    hasher = ImageDHasher(spark=spark).setInputCol("img").setOutputCol("dhash")
    hashed = hasher.transform(df)[0]
    pairs = PyDF(hasher._jobj.similarityJoin(hashed._jdf, "id", 3, 4), spark)
    got = {(r["id_a"], r["id_b"]) for r in pairs.collect()}
    expected = {(g * 4 + a, g * 4 + b)
                for g in range(3) for a in range(4) for b in range(a + 1, 4)}
    assert got == expected
