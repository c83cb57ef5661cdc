package graft.stats

import graft.SparkSpec

class DriftDetectorSpec extends SparkSpec {

  private def det = new DriftDetector().setFeatureCols("x").setNumBins(5)

  private def collect1(df: org.apache.spark.sql.DataFrame) = {
    val r = df.collect().head
    (r.getAs[Double]("psi"), r.getAs[Double]("ks"),
      r.getAs[Long]("n_ref"), r.getAs[Long]("n_cur"))
  }

  test("identical distributions: psi ~ 0, ks = 0") {
    import spark.implicits._
    val ref = (0 until 10).map(_.toDouble).toDF("x")
    val (psi, ks, nr, nc) = collect1(det.transform(ref, ref).head)
    assert(math.abs(psi) < 1e-12 && ks == 0.0 && nr == 10L && nc == 10L)
  }

  test("shifted window: hand-computed PSI and binned-KS") {
    import spark.implicits._
    // ref 0..9, 5 bins over [0,9] (width 1.8) -> counts [2,2,2,2,2]
    // cur 5..14 clamps into [0,0,1,2,7]
    // Laplace p=(c+0.5)/(n+2.5): psi = 0.995333..., ks = max CDF gap = 0.5
    val ref = (0 until 10).map(_.toDouble).toDF("x")
    val cur = (5 until 15).map(_.toDouble).toDF("x")
    val (psi, ks, _, _) = collect1(det.transform(ref, cur).head)
    val expPsi = {
      val pr = Array.fill(5)(2.5 / 12.5)
      val pc = Array(0.5, 0.5, 1.5, 2.5, 7.5).map(_ / 12.5)
      pr.indices.map(i => (pc(i) - pr(i)) * math.log(pc(i) / pr(i))).sum
    }
    assert(math.abs(psi - expPsi) < 1e-12, s"psi $psi vs $expPsi")
    assert(math.abs(psi - 0.9953333) < 1e-4)
    assert(ks == 0.5, s"ks $ks")
  }

  test("constant reference feature: everything lands in bin 0, no NaN/Inf") {
    import spark.implicits._
    val ref = Seq(7.0, 7.0, 7.0).toDF("x")
    val cur = Seq(7.0, 7.0).toDF("x")
    val (psi, ks, _, _) = collect1(det.transform(ref, cur).head)
    assert(!psi.isNaN && !psi.isInfinite && ks == 0.0)
  }

  test("multiple features in one pass; nulls and NaNs are dropped per-feature") {
    import spark.implicits._
    val ref = Seq((1.0, 10.0), (2.0, Double.NaN), (3.0, 30.0)).toDF("a", "b")
    val cur = Seq((1.0, 10.0), (3.0, 30.0)).toDF("a", "b")
    val out = new DriftDetector().setFeatureCols("a", "b").setNumBins(4)
      .transform(ref, cur).head.collect()
      .map(r => r.getString(0) -> (r.getAs[Long]("n_ref"), r.getAs[Long]("n_cur"))).toMap
    assert(out("a") == (3L, 2L))
    assert(out("b") == (2L, 2L)) // the NaN reference row dropped
  }

  test("empty-side features surface explicit nulls instead of vanishing (r8 ADVICE)") {
    import spark.implicits._
    val ref = Seq((1.0, Option.empty[Double]), (2.0, None), (3.0, None)).toDF("x", "y")
    val cur = Seq((Option.empty[Double], Some(4.0)), (None, Some(5.0))).toDF("x", "y")
    val out = new DriftDetector().setFeatureCols("x", "y").setNumBins(5)
      .transform(ref, cur).head.collect()
      .map(r => r.getString(0) -> r).toMap
    // x: reference present, current all-null -> ks/null (no distribution), n_cur 0
    assert(out("x").getAs[Long]("n_ref") == 3L && out("x").getAs[Long]("n_cur") == 0L)
    assert(out("x").isNullAt(out("x").fieldIndex("ks")), "ks must be explicit null, not a NaN")
    // y: reference all-null -> the feature still APPEARS, with null metrics
    // but REAL current-side counts (r9 review: n_cur must not read 0
    // when current rows exist just because the reference was empty)
    assert(out.contains("y"), "features with no reference rows must not vanish")
    assert(out("y").getAs[Long]("n_ref") == 0L && out("y").getAs[Long]("n_cur") == 2L)
    assert(out("y").isNullAt(out("y").fieldIndex("psi")))
    assert(out("y").isNullAt(out("y").fieldIndex("ks")))
  }

  test("guards: wrong arity and empty featureCols rejected") {
    import spark.implicits._
    val df = Seq(1.0).toDF("x")
    intercept[IllegalArgumentException](det.transform(df))
    intercept[IllegalArgumentException](new DriftDetector().setFeatureCols())
  }

  test("param save/load round-trip") {
    val dir = tmpDir()
    new DriftDetector().setFeatureCols("v1", "v2").setNumBins(20).save(dir)
    val back = DriftDetector.load(spark, dir)
    assert(back.getFeatureCols.toSeq == Seq("v1", "v2") && back.getNumBins == 20)
  }
}
