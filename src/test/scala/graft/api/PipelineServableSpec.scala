package graft.api

import org.apache.spark.ml.linalg.{Vector, Vectors}
import graft.SparkSpec

/**
 * PipelineModel servable support, mirroring
 * api/PipelineTest.java:113-131 (supportServable is true only when every
 * stage is a servable-capable transformer) and :133-170 (a chained
 * pipeline servable scores without Spark).
 */
class PipelineServableSpec extends SparkSpec {

  private def trainDf = {
    import spark.implicits._
    Seq(
      (Vectors.dense(1, 2), 0.0), (Vectors.dense(2, 2), 0.0), (Vectors.dense(3, 2), 0.0),
      (Vectors.dense(11, 2), 1.0), (Vectors.dense(12, 2), 1.0), (Vectors.dense(13, 2), 1.0))
      .toDF("features", "label")
  }

  test("supportServable: models yes, estimators and plain operators no") {
    import graft.classification.{LogisticRegression, LogisticRegressionModel}
    import graft.feature.StandardScaler
    val lrModel = new LogisticRegression().fit(trainDf)
    val scalerModel = new StandardScaler().setInputCol("features").setOutputCol("features")
      .fit(trainDf)
    assert(new PipelineModel(Seq(scalerModel, lrModel)).supportServable)
    assert(!new PipelineModel(Seq(new LogisticRegression(), lrModel)).supportServable)
    assert(!new PipelineModel(
      Seq(new graft.feature.Binarizer(), lrModel)).supportServable)
  }

  test("pipeline toServable scores like the distributed pipeline, Spark-free") {
    import graft.classification.LogisticRegression
    import graft.feature.StandardScaler
    val scaler = new StandardScaler().setInputCol("features").setOutputCol("scaled")
      .setWithMean(true)
    val scalerModel = scaler.fit(trainDf)
    val scaled = scalerModel.transform(trainDf).head
    val lrModel = new LogisticRegression().setFeaturesCol("scaled").fit(scaled)
    val pipeline = new PipelineModel(Seq(scalerModel, lrModel))

    // distributed predictions
    val expected = pipeline.transform(trainDf).head
      .select("prediction").collect().map(_.getDouble(0)).toSeq

    // Spark-free predictions via the chained servable — note the
    // servable consumes plain double arrays
    val servable = pipeline.toServable
    val input = graft.servable.LocalDataFrame(
      Seq("features"),
      trainDf.select("features").collect().map(r =>
        Seq(r.getAs[Vector](0).toArray: Any)).toSeq)
    val out = servable.transform(input)
    val got = out.column("prediction").map(_.asInstanceOf[Double])
    assert(got == expected, s"$got vs $expected")
  }
}
