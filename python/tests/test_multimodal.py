"""Multimodal mapInPandas plumbing: real schemas and arrow batch flow,
deterministic decode stub, real PNG header parse (mirrors the Scala
graft.multimodal tier)."""

import struct
import zlib


def _synthetic_png(width, height):
    """Minimal-but-valid PNG header bytes (signature + IHDR), enough
    for a header parse; mirrors graft.multimodal.ImageDecoder.syntheticPng."""
    sig = b"\x89PNG\r\n\x1a\n"
    ihdr_data = struct.pack(">IIBBBBB", width, height, 8, 2, 0, 0, 0)
    ihdr = struct.pack(">I", 13) + b"IHDR" + ihdr_data \
        + struct.pack(">I", zlib.crc32(b"IHDR" + ihdr_data))
    return sig + ihdr


def test_decode_images_parses_png_headers(spark):
    from graftml import multimodal as mm
    rows = [(1, _synthetic_png(12, 7)), (2, _synthetic_png(30, 4)),
            (3, b"not a png"), (4, None)]
    df = spark.createDataFrame(rows, ["id", "payload"])
    out = {r["id"]: r for r in mm.decode_images(df).collect()}
    assert (out[1]["img_width"], out[1]["img_height"], out[1]["img_format"]) == (12, 7, "png")
    assert (out[2]["img_width"], out[2]["img_height"]) == (30, 4)
    assert out[3]["img_format"] is None and out[3]["img_width"] is None
    assert out[4]["img_checksum"] == 0
    # stub checksum is deterministic
    assert out[1]["img_checksum"] == sum(_synthetic_png(12, 7)[:256]) * len(_synthetic_png(12, 7))


def test_sample_frames_keeps_every_nth_fixed_size_chunk(spark):
    from graftml import multimodal as mm
    payload = bytes(range(256))  # 8 frames of 32 bytes
    df = spark.createDataFrame([(1, payload)], ["id", "payload"])
    out = mm.sample_frames(df, frame_bytes=32, every_nth=2).collect()[0]
    frames = out["frames"]
    assert len(frames) == 4
    assert bytes(frames[0]) == payload[0:32]
    assert bytes(frames[1]) == payload[64:96]


def test_decode_is_distributed_partition_preserving(spark):
    from graftml import multimodal as mm
    df = spark.createDataFrame(
        [(i, _synthetic_png(8 + i, 4)) for i in range(40)], ["id", "payload"]
    ).repartition(4)
    out = mm.decode_images(df)
    assert out.rdd.getNumPartitions() == 4
    assert out.count() == 40
    assert out.where("img_width = 8").count() == 1
