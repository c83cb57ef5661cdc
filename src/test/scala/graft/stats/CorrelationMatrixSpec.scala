package graft.stats

import graft.SparkSpec

class CorrelationMatrixSpec extends SparkSpec {

  private def cm = new CorrelationMatrix()

  test("hand-checked correlations: perfect, perfect-negative, and known") {
    import spark.implicits._
    val df = Seq(
      (1.0, 2.0, -1.0, 1.0),
      (2.0, 4.0, -2.0, 2.0),
      (3.0, 6.0, -3.0, 4.0))
      .toDF("a", "b", "c", "d")
    val out = cm.setInputCols("a", "b", "c", "d").transform(df).head
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getDouble(2)).toMap
    assert(out.size == 6)
    assert(math.abs(out(("a", "b")) - 1.0) < 1e-12)
    assert(math.abs(out(("a", "c")) + 1.0) < 1e-12)
    // corr(a, d): a=(1,2,3), d=(1,2,4) -> cov=1.5, sd_a=1, sd_d=sqrt(7/3)
    assert(math.abs(out(("a", "d")) - 1.5 / math.sqrt(7.0 / 3.0)) < 1e-12)
  }

  test("per-pair null exclusion matches pairwise-complete semantics") {
    import spark.implicits._
    val df = Seq(
      (Some(1.0), Some(1.0), Some(5.0)),
      (Some(2.0), Some(2.0), None),
      (Some(3.0), Some(4.0), Some(1.0)),
      (None, Some(9.0), Some(2.0)))
      .toDF("a", "b", "c")
    val out = cm.setInputCols("a", "b", "c").transform(df).head
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        (if (r.isNullAt(2)) None else Some(r.getDouble(2)))).toMap
    // (a,b) over rows 1-3 only: a=(1,2,3), b=(1,2,4) -> cov=1.5,
    // sd_a=1, sd_b=sqrt(7/3); (a,c) over rows 1 and 3 (two points -> -1)
    assert(math.abs(out(("a", "b")).get - 1.5 / math.sqrt(7.0 / 3.0)) < 1e-12)
    assert(math.abs(out(("a", "c")).get + 1.0) < 1e-12)
  }

  test("differential vs Spark SQL corr per pair") {
    import spark.implicits._
    val rnd = new scala.util.Random(17)
    val df = (0 until 500).map { _ =>
      val x = rnd.nextGaussian()
      (x, x + rnd.nextGaussian(), rnd.nextGaussian())
    }.toDF("x", "y", "z")
    val out = cm.setInputCols("x", "y", "z").transform(df).head
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getDouble(2)).toMap
    for ((a, b) <- Seq(("x", "y"), ("x", "z"), ("y", "z"))) {
      val want = df.selectExpr(s"corr($a, $b)").head().getDouble(0)
      assert(math.abs(out((a, b)) - want) < 1e-12, s"($a,$b)")
    }
  }

  test("zero-variance column yields null, and <2 columns is rejected") {
    import spark.implicits._
    val df = Seq((1.0, 5.0), (2.0, 5.0)).toDF("a", "konst")
    val out = cm.setInputCols("a", "konst").transform(df).head.collect()
    assert(out.length == 1 && out(0).isNullAt(2))
    val e = intercept[IllegalArgumentException] {
      cm.setInputCols("a").transform(df).head
    }
    assert(e.getMessage.contains("at least 2"))
  }

  test("param save/load round-trip") {
    val dir = tmpDir()
    cm.setInputCols("p", "q", "r").save(dir)
    val back = CorrelationMatrix.load(spark, dir)
    assert(back.getInputCols.toSeq == Seq("p", "q", "r"))
  }
}
