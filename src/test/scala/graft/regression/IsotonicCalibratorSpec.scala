package graft.regression

import graft.SparkSpec
import org.apache.spark.sql.functions._

class IsotonicCalibratorSpec extends SparkSpec {

  private def cal = new IsotonicCalibrator()
    .setPredictionCol("p").setLabelCol("y")

  test("hand-checked PAV: one violation pools into a flat block") {
    import spark.implicits._
    // score 1 -> mean 1.0, score 2 -> mean 0.0: violator, pools to 0.5
    val df = Seq((1.0, 1.0), (2.0, 0.0), (3.0, 1.0)).toDF("p", "y")
    val m = cal.fit(df)
    val knots = m.getModelData.head.orderBy("boundary").collect()
      .map(r => (r.getDouble(0), r.getDouble(1)))
    assert(knots.toSeq == Seq((1.0, 0.5), (2.0, 0.5), (3.0, 1.0)))
    val out = m.transform(Seq(0.0, 1.5, 2.5, 9.9).toDF("p")).head
      .orderBy("p").collect().map(_.getDouble(1))
    // clamp left, inside the flat block, midway up the ramp, clamp right
    assert(out.toSeq == Seq(0.5, 0.5, 0.75, 1.0))
  }

  test("already-monotone group means are returned unchanged") {
    import spark.implicits._
    val df = (0 until 400).map { i =>
      val k = i % 4
      val j = i / 4 // independent of the group key
      (k / 4.0, if (j % 4 < k) 1.0 else 0.0) // means 0, .25, .5, .75
    }.toDF("p", "y")
    val m = cal.fit(df)
    val out = m.transform(Seq(0.0, 0.25, 0.5, 0.75).toDF("p")).head
      .orderBy("p").collect().map(_.getDouble(1))
    assert(out.toSeq == Seq(0.0, 0.25, 0.5, 0.75))
  }

  test("differential vs spark.ml IsotonicRegression on random weighted data") {
    import spark.implicits._
    val rnd = new scala.util.Random(41)
    val data = (0 until 2000).map { _ =>
      val p = rnd.nextInt(50) / 50.0 // repeated scores: real PAV blocks
      (p, if (rnd.nextDouble() < 0.3 + 0.4 * p) 1.0 else 0.0,
        1.0 + rnd.nextInt(3).toDouble)
    }.toDF("p", "y", "wt")
    val ours = cal.setWeightCol("wt").fit(data)

    val ml = new org.apache.spark.ml.regression.IsotonicRegression()
      .setFeaturesCol("pv").setLabelCol("y").setWeightCol("wt")
      .fit(data.withColumn("pv", col("p")))

    val probes = (-5 to 105).map(_ / 100.0).toDF("p").withColumn("pv", col("p"))
    val got = ours.transform(probes).head
      .select("p", "calibrated").collect().map(r => r.getDouble(0) -> r.getDouble(1)).toMap
    val want = ml.setPredictionCol("mlcal").transform(probes)
      .select("p", "mlcal").collect().map(r => r.getDouble(0) -> r.getDouble(1)).toMap
    probes.collect().map(_.getDouble(0)).foreach { x =>
      assert(math.abs(got(x) - want(x)) < 1e-9, s"at $x: ${got(x)} vs ${want(x)}")
    }
  }

  test("guards: empty fit and the distinct-score gate fail loudly") {
    import spark.implicits._
    val e1 = intercept[IllegalArgumentException] {
      cal.fit(Seq.empty[(Double, Double)].toDF("p", "y"))
    }
    assert(e1.getMessage.contains("no valid"))
    val many = (0 until 100).map(i => (i / 100.0, 1.0)).toDF("p", "y")
    val e2 = intercept[IllegalArgumentException] {
      cal.setMaxDistinctScores(10).fit(many)
    }
    assert(e2.getMessage.contains("maxDistinctScores"))
  }

  test("null and NaN scores pass through transform as null") {
    import spark.implicits._
    val m = cal.fit(Seq((0.0, 0.0), (1.0, 1.0)).toDF("p", "y"))
    val out = m.transform(
      Seq(Some(0.5), None, Some(Double.NaN)).toDF("p")).head.collect()
    assert(out(0).getDouble(1) == 0.5 && out(1).isNullAt(1) && out(2).isNullAt(1))
  }

  test("model save/load round-trip preserves knots and params") {
    import spark.implicits._
    val m = cal.setOutputCol("cc").fit(Seq((1.0, 1.0), (2.0, 0.0)).toDF("p", "y"))
    val dir = tmpDir()
    m.save(dir)
    val back = IsotonicCalibratorModel.load(spark, dir)
    assert(back.getOutputCol == "cc" && back.getPredictionCol == "p")
    val out = back.transform(Seq(1.5).toDF("p")).head.collect()(0).getDouble(1)
    assert(out == 0.5)
  }
}
