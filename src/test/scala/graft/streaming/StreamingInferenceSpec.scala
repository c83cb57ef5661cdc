package graft.streaming

import org.apache.spark.ml.linalg.{Vector, Vectors}
import org.apache.spark.sql.functions.col
import graft.SparkSpec

/**
 * Train offline, score the unbounded stream: fitted models transform
 * streaming DataFrames directly because inference is a pure projection
 * (broadcast O(model) state + codegen/UDF per row — no shuffle, no
 * state store). This is the reference's serving story re-expressed on
 * Structured Streaming.
 */
class StreamingInferenceSpec extends SparkSpec {

  test("StandardScaler + LogisticRegression score a stream end-to-end") {
    import spark.implicits._
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext

    // offline: fit the scaler on a batch
    val train = Seq(Vectors.dense(0.0, 0.0), Vectors.dense(2.0, 4.0))
      .map(Tuple1(_)).toDF("features")
    val scaler = new graft.feature.StandardScaler()
      .setInputCol("features").setOutputCol("scaled").setWithMean(true)
      .fit(train)
    // offline: a trained classifier (fixed coefficients: sign of x0)
    val clf = new graft.classification.LogisticRegressionModel()
      .setModelData(Seq(Tuple1(Array(5.0, 0.0))).toDF("c")
        .select(org.apache.spark.ml.functions.array_to_vector(col("c")).as("coefficient")))
      .setFeaturesCol("scaled")

    // online: score the stream with both models chained
    val stream = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Double, Double)]
    val streamDf = stream.toDF()
      .select(org.apache.spark.ml.functions.array_to_vector(
        org.apache.spark.sql.functions.array(col("_1"), col("_2"))).as("features"))
    val scored = clf.transform(scaler.transform(streamDf).head).head
    val query = scored.select("features", "prediction")
      .writeStream.outputMode("append").format("memory").queryName("stream_preds").start()
    stream.addData((3.0, 1.0), (-3.0, 1.0), (4.0, 0.0))
    query.processAllAvailable()
    stream.addData((-1.0, 2.0)) // second micro-batch scores with the same model
    query.processAllAvailable()
    query.stop()

    val rows = spark.table("stream_preds").collect()
      .map(r => (r.getAs[Vector](0)(0), r.getDouble(1)))
    assert(rows.length == 4)
    // positive x0 (above the scaled mean) → class 1, negative → class 0
    rows.foreach { case (x0, pred) =>
      assert(pred == (if (x0 > 1.0) 1.0 else 0.0), s"x0=$x0 pred=$pred")
    }
  }
}
