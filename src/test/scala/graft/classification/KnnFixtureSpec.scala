package graft.classification

import org.apache.spark.ml.linalg.Vectors
import graft.SparkSpec

/**
 * Reference fixture for Knn, ported from
 * classification/KnnTest.java:63-91 (train/predict rows whose expected
 * prediction equals the carried label) and :161-167 (training set
 * smaller than k).
 */
class KnnFixtureSpec extends SparkSpec {

  private def trainDf = {
    import spark.implicits._
    Seq(
      (Vectors.dense(2.0, 3.0), 1.0), (Vectors.dense(2.1, 3.1), 1.0),
      (Vectors.dense(200.1, 300.1), 2.0), (Vectors.dense(200.2, 300.2), 2.0),
      (Vectors.dense(200.3, 300.3), 2.0), (Vectors.dense(200.4, 300.4), 2.0),
      (Vectors.dense(200.4, 300.4), 2.0), (Vectors.dense(200.6, 300.6), 2.0),
      (Vectors.dense(2.1, 3.1), 1.0), (Vectors.dense(2.1, 3.1), 1.0),
      (Vectors.dense(2.1, 3.1), 1.0), (Vectors.dense(2.1, 3.1), 1.0),
      (Vectors.dense(2.3, 3.2), 1.0), (Vectors.dense(2.3, 3.2), 1.0),
      (Vectors.dense(2.8, 3.2), 3.0), (Vectors.dense(300.0, 3.2), 4.0),
      (Vectors.dense(2.2, 3.2), 1.0), (Vectors.dense(2.4, 3.2), 5.0),
      (Vectors.dense(2.5, 3.2), 5.0), (Vectors.dense(2.5, 3.2), 5.0),
      (Vectors.dense(2.1, 3.1), 1.0)).toDF("features", "label")
  }

  private def predictDf = {
    import spark.implicits._
    Seq(
      (Vectors.dense(4.0, 4.1), 5.0),
      (Vectors.dense(300.0, 42.0), 2.0)).toDF("features", "label")
  }

  test("fit + predict matches reference expected labels (default k=5)") {
    val out = new Knn().fit(trainDf).transform(predictDf).head
      .select("label", "prediction").collect()
    assert(out.length == 2)
    out.foreach(r => assert(r.getDouble(0) == r.getDouble(1),
      s"expected ${r.getDouble(0)}, predicted ${r.getDouble(1)}"))
  }

  test("training set smaller than k still predicts (KnnTest.java:161-167)") {
    val out = new Knn().fit(predictDf).transform(predictDf).head
      .select("label", "prediction").collect()
    assert(out.length == 2)
    out.foreach(r => assert(r.getDouble(0) == r.getDouble(1)))
  }
}
