"""ZOrderWriter through the Python surface."""


def test_zorder_value_and_write(spark, tmp_path):
    from graftml.functions import zorder_value, zorder_write
    df = spark.createDataFrame(
        [(float(x), float(y)) for x in range(16) for y in range(16)], ["x", "y"])
    z = zorder_value(df, ["x", "y"], bits=4, z_col="z")
    rows = z.collect()
    assert len(rows) == 256
    # corner points: (0,0) -> 0; (15,15) -> 255 at 4 bits
    by_xy = {(r["x"], r["y"]): r["z"] for r in rows}
    assert by_xy[(0.0, 0.0)] == 0
    assert by_xy[(15.0, 15.0)] == 255
    out = str(tmp_path / "zdir")
    zorder_write(df, ["x", "y"], out, num_files=4, bits=4, mode="overwrite")
    back = spark.read.parquet(out)
    assert back.count() == 256
    assert set(back.columns) == {"x", "y"}
