"""Multimodal batch processing over ``mapInPandas`` — the Python side
of the multimodal tier (the Scala side is graft.multimodal.*).

Images/audio/video are opaque ``binary`` columns with typed metadata.
The Spark-side plumbing here is real and tested — output schemas,
arrow batch iteration, partition-preserving flow — while the pixel
decode itself is a deterministic stand-in (``_decode_stub``) behind a
single seam: production swaps ``_decode_stub`` for a PIL/ffmpeg call
without touching the dataflow. PNG header parsing (width/height) is
real, matching graft.multimodal.ImageDecoder's header decode.

All functions return DataFrames and run fully distributed; no
collect() anywhere.
"""

import struct

DECODE_SCHEMA = (
    "width int, height int, format string, num_pixels long, checksum long")


def _png_dims(payload):
    """Real PNG header parse (IHDR width/height), like the Scala
    ImageDecoder; returns (None, None) for non-PNG bytes."""
    if payload is None or len(payload) < 24 or payload[:8] != b"\x89PNG\r\n\x1a\n":
        return None, None
    w, h = struct.unpack(">II", payload[16:24])
    return w, h


def _decode_stub(payload):
    """Deterministic stand-in for pixel decoding: a cheap checksum over
    the bytes. Swap for PIL.Image.open in production."""
    return sum(payload[:256]) * len(payload) if payload else 0


def decode_images(df, payload_col="payload", output_prefix="img_"):
    """binary column -> typed image metadata columns, one arrow batch at
    a time through mapInPandas."""
    import pandas as pd

    schema = ", ".join(f"{f.name} {f.dataType.simpleString()}"
                       for f in df.schema.fields)
    out_schema = schema + ", " + ", ".join(
        f"{output_prefix}{c} {t}" for c, t in
        [("width", "int"), ("height", "int"), ("format", "string"),
         ("checksum", "long")])

    def batches(it):
        for pdf in it:
            widths, heights, fmts, sums = [], [], [], []
            for payload in pdf[payload_col]:
                payload = bytes(payload) if payload is not None else None
                w, h = _png_dims(payload)
                widths.append(w)
                heights.append(h)
                fmts.append("png" if w is not None else None)
                sums.append(_decode_stub(payload))
            pdf = pdf.copy()
            pdf[f"{output_prefix}width"] = pd.array(widths, dtype="Int32")
            pdf[f"{output_prefix}height"] = pd.array(heights, dtype="Int32")
            pdf[f"{output_prefix}format"] = fmts
            pdf[f"{output_prefix}checksum"] = sums
            yield pdf

    return df.mapInPandas(batches, schema=out_schema)


def sample_frames(df, payload_col="payload", frame_bytes=64, every_nth=2,
                  output_col="frames"):
    """Treat the binary payload as a frame sequence of fixed-size
    chunks; keep every Nth frame (the FrameSampler contract) as
    array<binary>."""
    schema = ", ".join(f"{f.name} {f.dataType.simpleString()}"
                       for f in df.schema.fields)
    out_schema = schema + f", {output_col} array<binary>"

    def batches(it):
        for pdf in it:
            frames_col = []
            for payload in pdf[payload_col]:
                payload = bytes(payload) if payload is not None else b""
                frames = [payload[i:i + frame_bytes]
                          for i in range(0, len(payload), frame_bytes)]
                frames_col.append(frames[::every_nth])
            pdf = pdf.copy()
            pdf[output_col] = frames_col
            yield pdf

    return df.mapInPandas(batches, schema=out_schema)
