package graft.stats

import graft.SparkSpec

class ColumnProfilerSpec extends SparkSpec {

  private def data = {
    import spark.implicits._
    Seq(
      (1L, Some(10.0), "alpha"),
      (2L, Some(20.0), "beta"),
      (3L, None, "gamma-long"),
      (4L, Some(10.0), "beta"))
      .toDF("id", "qty", "name")
  }

  test("numeric, string, and shared metrics per column (exact distinct)") {
    val rows = new ColumnProfiler().setInputCols("id", "qty", "name")
      .setExactDistinct(true)
      .transform(data).head.collect()
      .map(r => r.getString(0) -> r).toMap
    val id = rows("id")
    assert(id.getLong(1) == 4 && id.getLong(2) == 0 && id.getLong(3) == 4)
    assert(id.getDouble(4) == 2.5) // mean
    assert(id.getDouble(6) == 1.0 && id.getDouble(7) == 4.0) // vmin/vmax
    assert(id.isNullAt(8) && id.isNullAt(9)) // no string lengths

    val qty = rows("qty")
    assert(qty.getLong(2) == 1 && qty.getLong(3) == 2) // one null, {10, 20}
    assert(math.abs(qty.getDouble(4) - 40.0 / 3) < 1e-12)

    val name = rows("name")
    assert(name.getLong(3) == 3)
    assert(name.isNullAt(4) && name.isNullAt(6)) // no numeric stats
    assert(name.getInt(8) == 4 && name.getInt(9) == 10) // beta / gamma-long
  }

  test("approximate distinct is exact on tiny cardinalities; single-pass plan") {
    val out = new ColumnProfiler().setInputCols("id", "name").transform(data).head
    val rows = out.collect().map(r => r.getString(0) -> r.getLong(3)).toMap
    assert(rows("id") == 4 && rows("name") == 3)
  }

  test("exact-distinct flag round-trips through save/load") {
    val dir = tmpDir()
    new ColumnProfiler().setInputCols("a", "b").setExactDistinct(true).save(dir)
    val back = ColumnProfiler.load(spark, dir)
    assert(back.getExactDistinct && back.getInputCols.toSeq == Seq("a", "b"))
  }
}
