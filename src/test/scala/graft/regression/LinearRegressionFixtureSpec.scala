package graft.regression

import org.apache.spark.ml.linalg.Vectors
import graft.SparkSpec

/**
 * Reference fixture for LinearRegression, ported from
 * regression/LinearRegressionTest.java:65-81 — 8 training rows,
 * expected coefficients [1.141, 1.829] within 0.1, predictions within
 * 10% relative error of the labels, under the reference defaults
 * (maxIter 20, learningRate 0.1, globalBatchSize 32, tol 1e-6, reg 0).
 */
class LinearRegressionFixtureSpec extends SparkSpec {

  private def trainDf = {
    import spark.implicits._
    Seq(
      (Vectors.dense(2, 1), 4.0, 1.0), (Vectors.dense(3, 2), 7.0, 1.0),
      (Vectors.dense(4, 3), 10.0, 1.0), (Vectors.dense(2, 4), 10.0, 1.0),
      (Vectors.dense(2, 2), 6.0, 1.0), (Vectors.dense(4, 3), 10.0, 1.0),
      (Vectors.dense(1, 2), 5.0, 1.0), (Vectors.dense(5, 3), 11.0, 1.0))
      .toDF("features", "label", "weight")
  }

  test("coefficients reach the reference expectation under default params") {
    val model = new LinearRegression().setWeightCol("weight").fit(trainDf)
    val coeff = model.getModelData.head.collect().head
      .getAs[org.apache.spark.ml.linalg.Vector](0).toArray.toSeq
    val expected = Seq(1.141, 1.829)
    coeff.zip(expected).foreach { case (c, e) =>
      assert(math.abs(c - e) < 0.1, s"coefficient $c vs expected $e")
    }
  }

  test("predictions within 10% relative error of labels") {
    val model = new LinearRegression().setWeightCol("weight").fit(trainDf)
    val rows = model.transform(trainDf).head.select("label", "prediction").collect()
    rows.foreach { r =>
      val label = r.getDouble(0); val pred = r.getDouble(1)
      assert(math.abs(pred - label) / label < 0.1, s"pred $pred vs label $label")
    }
  }
}
