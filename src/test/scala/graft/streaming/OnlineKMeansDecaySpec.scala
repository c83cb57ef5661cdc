package graft.streaming

import org.apache.spark.ml.linalg.{Vector, Vectors}
import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.clustering.KMeans

/**
 * Reference fixture for the OnlineKMeans decay update, ported from
 * clustering/OnlineKMeansTest.java:387-424 (testDecayFactor): offline
 * fit on the first batch, one online update of the second batch with
 * decayFactor 0.5 and initial weights = offline cluster sizes, expected
 * centroids (-10.2, -200.2/3) and (10.1, 200.3/3), weights (4.5, 4.5).
 */
class OnlineKMeansDecaySpec extends SparkSpec {

  test("decayFactor 0.5 update matches reference expected model data") {
    import spark.implicits._
    val train1 = Seq(
      Vectors.dense(10.0, 0.0), Vectors.dense(10.0, 0.3), Vectors.dense(10.3, 0.0),
      Vectors.dense(-10.0, 0.0), Vectors.dense(-10.0, 0.6), Vectors.dense(-10.6, 0.0))
      .map(Tuple1(_)).toDF("features")
    val train2 = Seq(
      Vectors.dense(10.0, 100.0), Vectors.dense(10.0, 100.3), Vectors.dense(10.3, 100.0),
      Vectors.dense(-10.0, -100.0), Vectors.dense(-10.0, -100.6), Vectors.dense(-10.6, -100.0))
      .map(Tuple1(_)).toDF("features")

    // offline fit supplies the initial centroids; its cluster sizes are
    // the initial weights, as in the reference's KMeansModelData.
    // Warm-start with one point per cluster so Lloyd's local optimum is
    // deterministic on this 6-point fixture.
    val warmStart = Seq(
      (0, Vectors.dense(10.0, 0.0)), (1, Vectors.dense(-10.0, 0.0)))
      .toDF("centroidId", "centroid")
    val offline = new KMeans().setK(2).setInitialModelData(warmStart).fit(train1)
    val sizes = offline.transform(train1).head
      .groupBy("prediction").count().collect()
      .map(r => r.get(0).toString.toDouble.toInt -> r.getLong(1).toDouble).toMap
    val init = offline.getModelData.head
      .withColumn("weight",
        udf((id: Int) => sizes(id)).apply(col("centroidId")).cast("double"))

    val updated = new OnlineKMeansModel()
      .setDecayFactor(0.5)
      .setModelData(init)
      .update(train2, "features")

    val rows = updated.getModelData.head
      .select("centroid", "weight").collect()
      .map(r => (r.getAs[Vector](0).toArray, r.getDouble(1)))
      .sortBy(_._1.head)
    assert(rows.length == 2)
    val expected = Seq(
      (Array(-10.2, -200.2 / 3), 4.5),
      (Array(10.1, 200.3 / 3), 4.5))
    rows.zip(expected).foreach { case ((c, w), (ec, ew)) =>
      assert(math.abs(w - ew) < 1e-5, s"weight $w vs $ew")
      c.zip(ec).foreach { case (a, b) => assert(math.abs(a - b) < 1e-5, s"centroid $a vs $b") }
    }
  }
}
