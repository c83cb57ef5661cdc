package graft.classification

import org.apache.spark.ml.linalg.{Vector, Vectors}
import graft.SparkSpec

/**
 * Reference fixtures for LogisticRegression and LinearSVC, ported from
 * classification/LogisticRegressionTest.java:75-104,413-436 and
 * classification/LinearSVCTest.java:66-80,290-296 — the shared 10-row
 * binomial table, expected coefficients under default params (maxIter 20,
 * learningRate 0.1, globalBatchSize 32 ⇒ full batch, tol 1e-6), and the
 * three regularization triples pinned to 1e-3.
 */
class LinearModelFixtureSpec extends SparkSpec {

  private def binomialDf = {
    import spark.implicits._
    Seq(
      (Vectors.dense(1, 2, 3, 4), 0.0, 1.0), (Vectors.dense(2, 2, 3, 4), 0.0, 2.0),
      (Vectors.dense(3, 2, 3, 4), 0.0, 3.0), (Vectors.dense(4, 2, 3, 4), 0.0, 4.0),
      (Vectors.dense(5, 2, 3, 4), 0.0, 5.0), (Vectors.dense(11, 2, 3, 4), 1.0, 1.0),
      (Vectors.dense(12, 2, 3, 4), 1.0, 2.0), (Vectors.dense(13, 2, 3, 4), 1.0, 3.0),
      (Vectors.dense(14, 2, 3, 4), 1.0, 4.0), (Vectors.dense(15, 2, 3, 4), 1.0, 5.0))
      .toDF("features", "label", "weight")
  }

  private def lrCoefficients(reg: Double, elasticNet: Double): Seq[Double] =
    new LogisticRegression().setWeightCol("weight").setReg(reg).setElasticNet(elasticNet)
      .fit(binomialDf).getModelData.head.select("coefficient").head()
      .getAs[Vector](0).toArray.toSeq

  private def svcCoefficients(reg: Double, elasticNet: Double): Seq[Double] =
    new LinearSVC().setWeightCol("weight").setReg(reg).setElasticNet(elasticNet)
      .fit(binomialDf).getModelData.head.select("coefficient").head()
      .getAs[Vector](0).toArray.toSeq

  private def assertClose(actual: Seq[Double], expected: Seq[Double], tol: Double): Unit =
    actual.zip(expected).foreach { case (a, e) =>
      assert(math.abs(a - e) < tol, s"coefficient $a vs expected $e (tol $tol) in $actual")
    }

  test("LogisticRegression coefficients match the reference under default params") {
    // LogisticRegressionTest.java:101-102, tolerance 0.1 (:313)
    assertClose(lrCoefficients(0, 0), Seq(0.525, -0.283, -0.425, -0.567), 0.1)
  }

  test("LogisticRegression regularized coefficients match to 1e-3") {
    // LogisticRegressionTest.java:414-418
    assertClose(lrCoefficients(0.1, 0.0), Seq(0.484, -0.258, -0.388, -0.517), 1e-3)
    assertClose(lrCoefficients(0.1, 1.0), Seq(0.417, -0.145, -0.312, -0.480), 1e-3)
    assertClose(lrCoefficients(0.1, 0.5), Seq(0.451, -0.203, -0.351, -0.498), 1e-3)
  }

  test("LogisticRegression prediction semantics: x0<=5 -> 0 with raw(0)>0.5") {
    // LogisticRegressionTest.java:147-163
    val model = new LogisticRegression().setWeightCol("weight").fit(binomialDf)
    val rows = model.transform(binomialDf).head
      .select("features", "prediction", "rawPrediction").collect()
    assert(rows.length == 10)
    rows.foreach { r =>
      val x0 = r.getAs[Vector](0)(0)
      val pred = r.getDouble(1)
      val raw = r.getAs[Vector](2)
      if (x0 <= 5) { assert(pred == 0.0); assert(raw(0) > 0.5) }
      else { assert(pred == 1.0); assert(raw(0) < 0.5) }
    }
  }

  test("LogisticRegression output schema appends renamed prediction columns") {
    // LogisticRegressionTest.java:229-247
    val renamed = binomialDf.toDF("test_features", "test_label", "test_weight")
    val out = new LogisticRegression()
      .setFeaturesCol("test_features").setLabelCol("test_label").setWeightCol("test_weight")
      .setPredictionCol("test_predictionCol").setRawPredictionCol("test_rawPredictionCol")
      .fit(renamed).transform(renamed).head
    assert(out.columns.toSeq == Seq(
      "test_features", "test_label", "test_weight",
      "test_predictionCol", "test_rawPredictionCol"))
  }

  test("LogisticRegression model data schema is (coefficient, modelVersion)") {
    // LogisticRegressionTest.java:292-294; LogisticRegressionModelData.java:36
    val model = new LogisticRegression().setWeightCol("weight").fit(binomialDf)
    val md = model.getModelData.head
    assert(md.columns.toSeq == Seq("coefficient", "modelVersion"))
    assert(md.select("modelVersion").head().getLong(0) == 0L)
  }

  test("multiClass=multinomial is rejected at fit with the reference message") {
    // LogisticRegressionTest.java:373-384; HasMultiClass validator allows the
    // value, fit rejects it
    val e = intercept[IllegalArgumentException] {
      new LogisticRegression().setMultiClass("multinomial").fit(binomialDf)
    }
    assert(e.getMessage.contains(
      "Multinomial classification is not supported yet. Supported options: [auto, binomial]."))
  }

  test("non-binomial labels are rejected during training with the reference message") {
    import spark.implicits._
    // multinomialTrainData, LogisticRegressionTest.java:88-99
    val multinomial = Seq(
      (Vectors.dense(1, 2, 3, 4), 0.0, 1.0), (Vectors.dense(2, 2, 3, 4), 0.0, 2.0),
      (Vectors.dense(3, 2, 3, 4), 2.0, 3.0), (Vectors.dense(4, 2, 3, 4), 2.0, 4.0),
      (Vectors.dense(5, 2, 3, 4), 2.0, 5.0), (Vectors.dense(11, 2, 3, 4), 1.0, 1.0))
      .toDF("features", "label", "weight")
    val e = intercept[Exception] {
      new LogisticRegression().setWeightCol("weight").fit(multinomial)
    }
    def rootMessage(t: Throwable): String =
      if (t.getCause == null || t.getCause == t) Option(t.getMessage).getOrElse("")
      else rootMessage(t.getCause) + Option(t.getMessage).getOrElse("")
    assert(rootMessage(e).contains(
      "Multinomial classification is not supported yet. Supported options: [auto, binomial]."))
  }

  test("LinearSVC coefficients match the reference under default params") {
    // LinearSVCTest.java:78-79, tolerance 0.1 (:245)
    assertClose(svcCoefficients(0, 0), Seq(0.470, -0.273, -0.410, -0.546), 0.1)
  }

  test("LinearSVC regularized coefficients match to 1e-3") {
    // LinearSVCTest.java:292-295
    assertClose(svcCoefficients(0.1, 0.0), Seq(0.437, -0.262, -0.393, -0.524), 1e-3)
    assertClose(svcCoefficients(0.1, 1.0), Seq(0.426, -0.197, -0.329, -0.463), 1e-3)
    assertClose(svcCoefficients(0.1, 0.5), Seq(0.419, -0.238, -0.372, -0.505), 1e-3)
  }

  test("LinearSVC raw prediction is [dot, -dot] with sign matching the class") {
    // LinearSVCTest.java:102-119
    val model = new LinearSVC().setWeightCol("weight").fit(binomialDf)
    val rows = model.transform(binomialDf).head
      .select("features", "prediction", "rawPrediction").collect()
    rows.foreach { r =>
      val x0 = r.getAs[Vector](0)(0)
      val pred = r.getDouble(1)
      val raw = r.getAs[Vector](2)
      assert(raw(0) == -raw(1))
      if (x0 <= 5) { assert(pred == 0.0); assert(raw(0) < 0) }
      else { assert(pred == 1.0); assert(raw(0) > 0) }
    }
  }
}
