package graft.evaluation

import graft.SparkSpec

class RegressionEvaluatorSpec extends SparkSpec {

  private def eval = new RegressionEvaluator()

  test("rmse/mae/r2 match hand computation and spark.ml") {
    import spark.implicits._
    val d = Seq((3.0, 2.5), (-0.5, 0.0), (2.0, 2.0), (7.0, 8.0))
      .toDF("label", "prediction")
    val r = eval.transform(d).head.head()
    // sklearn's canonical example: mse 0.375, mae 0.5, r2 ~0.9486
    assert(math.abs(r.getAs[Double]("rmse") - math.sqrt(0.375)) < 1e-12)
    assert(math.abs(r.getAs[Double]("mae") - 0.5) < 1e-12)
    assert(math.abs(r.getAs[Double]("r2") - 0.9486081370449679) < 1e-12)
    assert(r.getAs[Long]("n") == 4)

    val ml = new org.apache.spark.ml.evaluation.RegressionEvaluator()
      .setLabelCol("label").setPredictionCol("prediction")
    assert(math.abs(r.getAs[Double]("rmse") - ml.setMetricName("rmse").evaluate(d)) < 1e-12)
    assert(math.abs(r.getAs[Double]("mae") - ml.setMetricName("mae").evaluate(d)) < 1e-12)
    assert(math.abs(r.getAs[Double]("r2") - ml.setMetricName("r2").evaluate(d)) < 1e-12)
  }

  test("mape skips zero labels; all-zero labels give null mape") {
    import spark.implicits._
    val d = Seq((2.0, 1.0), (0.0, 5.0), (4.0, 5.0)).toDF("label", "prediction")
    val r = eval.transform(d).head.head()
    // rows with y != 0: |1/2| and |1/4| -> mean 0.375
    assert(math.abs(r.getAs[Double]("mape") - 0.375) < 1e-12)
    val zeros = Seq((0.0, 1.0), (0.0, 2.0)).toDF("label", "prediction")
    assert(eval.transform(zeros).head.head().isNullAt(4))
  }

  test("edge cases: perfect fit r2 = 1; constant label with error r2 = 0") {
    import spark.implicits._
    val perfect = Seq((1.0, 1.0), (2.0, 2.0)).toDF("label", "prediction")
    assert(eval.transform(perfect).head.head().getAs[Double]("r2") == 1.0)
    val const = Seq((3.0, 1.0), (3.0, 2.0)).toDF("label", "prediction")
    assert(eval.transform(const).head.head().getAs[Double]("r2") == 0.0)
  }

  test("rows with null label or prediction are excluded from n AND every sum (r8 ADVICE)") {
    import spark.implicits._
    val clean = Seq((3.0, 2.5), (-0.5, 0.0), (2.0, 2.0), (7.0, 8.0))
      .toDF("label", "prediction")
    val dirty = (Seq((Some(3.0), Some(2.5)), (Some(-0.5), Some(0.0)),
      (Some(2.0), Some(2.0)), (Some(7.0), Some(8.0)),
      (None, Some(9.0)), (Some(5.0), None), (None: Option[Double], None: Option[Double])))
      .toDF("label", "prediction")
    val a = eval.transform(clean).head.head()
    val b = eval.transform(dirty).head.head()
    assert(b.getAs[Long]("n") == 4) // nulls no longer counted, deflating rmse/mae
    Seq("rmse", "mae", "r2").foreach { m =>
      assert(math.abs(a.getAs[Double](m) - b.getAs[Double](m)) < 1e-12, m)
    }
    // a non-zero label with a NULL prediction must not enter n_nonzero either
    val mapeOnly = Seq((Some(2.0), Some(1.0)), (Some(4.0), None))
      .toDF("label", "prediction")
    assert(math.abs(eval.transform(mapeOnly).head.head().getAs[Double]("mape") - 0.5) < 1e-12)
  }

  test("param save/load round-trip") {
    val dir = tmpDir()
    eval.setLabelCol("y").setPredictionCol("yhat").save(dir)
    val back = RegressionEvaluator.load(spark, dir)
    assert(back.getLabelCol == "y" && back.getPredictionCol == "yhat")
  }
}
