package graft.streaming

import org.apache.spark.ml.linalg.{Vector, Vectors}
import org.apache.spark.sql.functions._
import graft.SparkSpec

/**
 * Warm-starting online FTRL from a batch LogisticRegressionModel
 * (reference OnlineLogisticRegressionTest
 * testFitAndPredictWithInitLogisticRegressionModel): the batch model's
 * coefficients seed the online state, first-version scoring matches
 * the batch model, and subsequent FTRL updates move from there.
 */
class OnlineLrWarmStartSpec extends SparkSpec {

  private def binomial = {
    import spark.implicits._
    Seq(
      (Vectors.dense(1, 2), 0.0), (Vectors.dense(2, 2), 0.0), (Vectors.dense(3, 2), 0.0),
      (Vectors.dense(11, 2), 1.0), (Vectors.dense(12, 2), 1.0), (Vectors.dense(13, 2), 1.0))
      .toDF("features", "label")
  }

  test("batch model data seeds the online model; first version scores like batch") {
    val batchModel = new graft.classification.LogisticRegression().fit(binomial)
    val init = OnlineLogisticRegressionModel.warmInit(batchModel.getModelData.head)

    val online = new OnlineLogisticRegressionModel().setModelData(init)
    val got = online.transform(binomial).head
      .select("features", "prediction").collect()
      .map(r => (r.getAs[Vector](0)(0), r.getDouble(1))).toMap
    val expected = batchModel.transform(binomial).head
      .select("features", "prediction").collect()
      .map(r => (r.getAs[Vector](0)(0), r.getDouble(1))).toMap
    assert(got == expected)

    // the warm coefficient is the version-0 row, carrying the batch version
    val row = init.head()
    assert(row.getAs[Long]("version") == 0L)
    assert(row.getAs[Vector]("coefficient").toArray.sameElements(
      batchModel.getModelData.head.select("coefficient").head().getAs[Vector](0).toArray))
  }

  test("an FTRL update from the warm state moves the coefficients, not resets them") {
    import spark.implicits._
    val batchModel = new graft.classification.LogisticRegression().fit(binomial)
    val warmCoeff = batchModel.getModelData.head
      .select("coefficient").head().getAs[Vector](0).toArray

    val online = new OnlineLogisticRegressionModel() // default FTRL alpha/beta
      .setModelData(OnlineLogisticRegressionModel.warmInit(batchModel.getModelData.head))
    val updated = online.update(
      Seq((Vectors.dense(12.0, 2.0), 1.0, 1.0)).toDF("features", "label", "weight"),
      "features", "label", "weight")
    val newCoeff = updated.getModelData.head
      .orderBy(col("version").desc).limit(1)
      .select("coefficient").head().getAs[Vector](0).toArray
    // moved (the update did something)...
    assert(!newCoeff.sameElements(warmCoeff))
    // ...but not to the cold-start state: the FTRL z-update subtracts
    // sigma * warmCoeff, so the sign structure of the batch solution
    // survives one small step
    assert(newCoeff(0).sign == warmCoeff(0).sign)
  }
}
