package graft.streaming

import org.scalatest.funsuite.AnyFunSuite

/**
 * Param-surface fixture for the online logistic regression pair, ported
 * from classification/OnlineLogisticRegressionTest.java:380-425 —
 * estimator defaults (FTRL alpha/beta 0.1, batch 32, reg/elasticNet 0)
 * and the model's modelVersionCol defaulting to "modelVersion"
 * (OnlineLogisticRegressionModelParams.java:35-40 shadows the generic
 * HasModelVersionCol default "version").
 */
class OnlineLrParamFixtureSpec extends AnyFunSuite {

  test("estimator defaults match the reference") {
    val est = new OnlineLogisticRegression()
    assert(est.getFeaturesCol == "features")
    assert(est.getLabelCol == "label")
    assert(est.getReg == 0.0)
    assert(est.getElasticNet == 0.0)
    assert(est.getAlpha == 0.1)
    assert(est.getBeta == 0.1)
    assert(est.getGlobalBatchSize == 32)
  }

  test("model defaults match the reference, incl. modelVersion output col") {
    val m = new OnlineLogisticRegressionModel()
    assert(m.getFeaturesCol == "features")
    assert(m.getModelVersionCol == "modelVersion")
    assert(m.getPredictionCol == "prediction")
    assert(m.getRawPredictionCol == "rawPrediction")

    m.setFeaturesCol("test_feature").setPredictionCol("pred")
      .setModelVersionCol("version").setRawPredictionCol("raw")
    assert(m.getFeaturesCol == "test_feature")
    assert(m.getModelVersionCol == "version")
    assert(m.getPredictionCol == "pred")
    assert(m.getRawPredictionCol == "raw")
  }
}
