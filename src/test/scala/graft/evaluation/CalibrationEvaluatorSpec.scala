package graft.evaluation

import graft.SparkSpec

class CalibrationEvaluatorSpec extends SparkSpec {

  private def eval = new CalibrationEvaluator()
    .setLabelCol("y").setPredictionCol("p")

  test("reliability bins, gaps, Brier, and ECE by hand") {
    import spark.implicits._
    // bin [0.0, 0.5): preds 0.2, 0.4 with labels 0, 1 -> mean_pred .3, frac_pos .5
    // bin [0.5, 1.0]: preds 0.8, 0.8, 1.0 with labels 1, 1, 1
    val df = Seq((0.2, 0.0), (0.4, 1.0), (0.8, 1.0), (0.8, 1.0), (1.0, 1.0))
      .toDF("p", "y")
    val twoBin = eval.setNumBins(2)
    val bins = twoBin.transform(df).head.collect()
      .map(r => r.getInt(0) -> (r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(5)))
      .toMap
    assert(bins(0)._1 == 2 && math.abs(bins(0)._2 - 0.3) < 1e-12)
    assert(math.abs(bins(0)._3 - 0.5) < 1e-12 && math.abs(bins(0)._4 - 0.2) < 1e-12)
    assert(bins(1)._1 == 3)
    val s = twoBin.summary(df)
    // brier = (0.04 + 0.36 + 0.04 + 0.04 + 0) / 5
    assert(math.abs(s.brier - 0.48 / 5) < 1e-12)
    // ece = (2*0.2 + 3*(13/15 - 1).abs) / 5
    assert(math.abs(s.ece - (2 * 0.2 + 3 * (1.0 - 13.0 / 15)) / 5) < 1e-12)
    assert(s.numBinsUsed == 2)
  }

  test("a perfectly calibrated coin has near-zero ECE") {
    import spark.implicits._
    val rnd = new scala.util.Random(5)
    val rows = (0 until 4000).map { _ =>
      val p = rnd.nextDouble()
      (p, if (rnd.nextDouble() < p) 1.0 else 0.0)
    }
    val s = eval.setNumBins(10).summary(rows.toDF("p", "y"))
    assert(s.ece < 0.05, s"ece=${s.ece}")
  }

  test("prediction 1.0 lands in the last bin; out-of-range fails loudly") {
    import spark.implicits._
    val ok = eval.setNumBins(4).transform(Seq((1.0, 1.0)).toDF("p", "y")).head.collect()
    assert(ok.length == 1 && ok(0).getInt(0) == 3)
    val e = intercept[Exception] {
      eval.transform(Seq((1.2, 1.0)).toDF("p", "y")).head.collect()
    }
    assert(e.getMessage.contains("out of [0,1]") ||
      e.getCause != null && e.getCause.getMessage.contains("out of [0,1]"))
  }

  test("param save/load round-trip") {
    val dir = tmpDir()
    eval.setNumBins(20).save(dir)
    val back = CalibrationEvaluator.load(spark, dir)
    assert(back.getNumBins == 20 && back.getLabelCol == "y")
  }
}
