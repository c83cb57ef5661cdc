package graft.evaluation

import graft.SparkSpec

class MulticlassEvaluatorSpec extends SparkSpec {

  //  label:  0 0 0 1 1 2 2 2 2 3
  //  pred:   0 0 1 1 2 2 2 0 2 1   (class 3 never predicted; 3 appears once as label)
  private def data = {
    import spark.implicits._
    Seq((0, 0), (0, 0), (0, 1), (1, 1), (1, 2),
      (2, 2), (2, 2), (2, 0), (2, 2), (3, 1))
      .toDF("label", "prediction")
  }

  private def eval = new MulticlassEvaluator()

  test("per-class tp/support/predicted/precision/recall/f1 match hand computation") {
    val rows = eval.transform(data).head
      .select("clazz", "tp", "support", "predicted", "precision", "recall", "f1")
      .collect().map(r => r.getDouble(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4), r.getDouble(5), r.getDouble(6)))
      .toMap
    def approx(a: Double, b: Double) = math.abs(a - b) < 1e-12
    // class 0: tp 2, support 3, predicted 3 -> p=2/3 r=2/3 f1=2/3
    assert(rows(0.0)._1 == 2 && rows(0.0)._2 == 3 && rows(0.0)._3 == 3)
    assert(approx(rows(0.0)._4, 2.0 / 3) && approx(rows(0.0)._6, 2.0 / 3))
    // class 1: tp 1, support 2, predicted 3 -> p=1/3 r=1/2 f1=2*(1/6)/(5/6)=0.4
    assert(approx(rows(1.0)._4, 1.0 / 3) && approx(rows(1.0)._5, 0.5) && approx(rows(1.0)._6, 0.4))
    // class 2: tp 3, support 4, predicted 4 -> p=3/4 r=3/4
    assert(approx(rows(2.0)._4, 0.75) && approx(rows(2.0)._5, 0.75))
    // class 3: never predicted -> precision 0, recall 0, f1 0 (no NaN)
    assert(rows(3.0) == (0L, 1L, 0L, 0.0, 0.0, 0.0))
  }

  test("summary: accuracy and macro/weighted roll-ups; differential vs spark.ml") {
    val s = eval.summary(data)
    assert(math.abs(s.accuracy - 0.6) < 1e-12 && s.numClasses == 4)
    val refEval = new org.apache.spark.ml.evaluation.MulticlassClassificationEvaluator()
      .setLabelCol("label").setPredictionCol("prediction")
    val df = data.selectExpr("CAST(label AS DOUBLE) label", "CAST(prediction AS DOUBLE) prediction")
    assert(math.abs(s.accuracy - refEval.setMetricName("accuracy").evaluate(df)) < 1e-12)
    assert(math.abs(s.weightedF1 - refEval.setMetricName("weightedFMeasure").evaluate(df)) < 1e-12)
  }

  test("a prediction-only class still gets a row (precision counted, recall 0)") {
    import spark.implicits._
    val d = Seq((0, 0), (0, 9)).toDF("label", "prediction")
    val rows = eval.transform(d).head.select("clazz", "support", "predicted", "recall")
      .collect().map(r => r.getDouble(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    assert(rows(9.0) == (0L, 1L, 0.0))
  }

  test("param save/load round-trip") {
    val dir = tmpDir()
    eval.setLabelCol("y").setPredictionCol("yhat").save(dir)
    val back = MulticlassEvaluator.load(spark, dir)
    assert(back.getLabelCol == "y" && back.getPredictionCol == "yhat")
  }
}
