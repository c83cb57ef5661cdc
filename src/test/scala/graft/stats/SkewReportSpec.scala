package graft.stats

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SkewReportSpec extends SparkSpec {

  test("heavy keys per column with exact counts, shares, deterministic ranks") {
    import spark.implicits._
    val df = (Seq.fill(6)(("hot", 1)) ++ Seq(("warm", 1), ("warm", 2), ("cold", 3)))
      .toDF("k", "v")
    val out = new SkewReport().setKeyCols("k", "v").setTopK(2)
      .transform(df).head.collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getDouble(3), r.getInt(4))).toMap
    assert(out(("k", "hot")) == ((6L, 6.0 / 9, 1)))
    assert(out(("k", "warm")) == ((2L, 2.0 / 9, 2)))
    assert(out(("v", "1")) == ((7L, 7.0 / 9, 1)))
    assert(out.size == 4) // topK 2 per column
  }

  test("nulls count under the <null> sentinel — often THE skew") {
    import spark.implicits._
    val df = (Seq.fill(5)(None: Option[String]) ++ Seq(Some("x"), Some("y")))
      .toDF("k")
    val top = new SkewReport().setKeyCols("k").setTopK(1)
      .transform(df).head.head()
    assert(top.getString(1) == "<null>" && top.getLong(2) == 5L && top.getInt(4) == 1)
  }

  test("count ties break ascending by key string; missing column refused") {
    import spark.implicits._
    val df = Seq("b", "a", "b", "a").toDF("k")
    val out = new SkewReport().setKeyCols("k").setTopK(2)
      .transform(df).head.orderBy("rank").collect()
    assert(out(0).getString(1) == "a" && out(1).getString(1) == "b")
    val e = intercept[IllegalArgumentException] {
      new SkewReport().setKeyCols("nope").transform(df)
    }
    assert(e.getMessage.contains("no such column"))
  }

  test("param save/load round-trip") {
    val dir = tmpDir()
    new SkewReport().setKeyCols("a", "b").setTopK(7).save(dir)
    val back = SkewReport.load(spark, dir)
    assert(back.getKeyCols.toSeq == Seq("a", "b") && back.getTopK == 7)
  }
}
