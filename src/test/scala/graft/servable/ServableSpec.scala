package graft.servable

import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import org.apache.spark.sql.functions.col
import graft.SparkSpec

class ServableSpec extends SparkSpec {

  test("logistic regression: distributed fit → export → Spark-free scoring parity") {
    import spark.implicits._
    // fixed-coefficient Spark model
    val coeffs = Seq(Tuple1(Array(0.5, -1.0))).toDF("coefficient")
      .select(org.apache.spark.ml.functions.array_to_vector(col("coefficient")).as("coefficient"))
    val sparkModel = new graft.classification.LogisticRegressionModel().setModelData(coeffs)

    val rows = Seq(Array(4.0, 1.0), Array(-2.0, 3.0), Array(0.0, 0.0))
    val input = rows.map(Tuple1(_)).toDF("arr")
      .select(org.apache.spark.ml.functions.array_to_vector(col("arr")).as("features"))
    val expected = sparkModel.transform(input).head
      .select("prediction").collect().map(_.getDouble(0)).toSeq

    // export + serve without Spark
    val buf = new ByteArrayOutputStream()
    ServableExport.exportLinearModel(coeffs, buf)
    val servable = new LogisticRegressionModelServable()
      .setModelData(new ByteArrayInputStream(buf.toByteArray))
    val local = LocalDataFrame(Seq("features"), rows.map(r => Seq(r: Any)))
    val got = servable.transform(local).column("prediction").map(_.asInstanceOf[Double])
    assert(got == expected)
    // raw prediction carries the probabilities
    val raw = servable.transform(LocalDataFrame(Seq("features"), Seq(Seq(Array(4.0, 1.0)))))
      .column("rawPrediction").head.asInstanceOf[Array[Double]]
    assert(math.abs(raw(0) + raw(1) - 1.0) < 1e-12)
  }

  test("standard scaler servable + pipeline chaining") {
    import spark.implicits._
    val modelData = Seq((Array(1.0, 10.0), Array(2.0, 5.0))).toDF("m", "s")
      .select(org.apache.spark.ml.functions.array_to_vector(col("m")).as("mean"),
        org.apache.spark.ml.functions.array_to_vector(col("s")).as("std"))
    val buf = new ByteArrayOutputStream()
    ServableExport.exportStandardScaler(modelData, buf)
    val scaler = new StandardScalerModelServable()
      .setInputCol("features").setOutputCol("features_scaled")
      .setModelData(new ByteArrayInputStream(buf.toByteArray))
    val lr = new LogisticRegressionModelServable().setCoefficient(Array(1.0, 0.0))
    lr.featuresCol = "features_scaled"

    val pipeline = new PipelineModelServable(Seq(scaler, lr))
    val out = pipeline.transform(
      LocalDataFrame(Seq("features"), Seq(Seq(Array(5.0, 20.0)))))
    val scaled = out.column("features_scaled").head.asInstanceOf[Array[Double]]
    assert(scaled.toSeq == Seq(2.0, 2.0)) // (5-1)/2, (20-10)/5
    assert(out.column("prediction").head == 1.0) // σ(2.0) > 0.5
  }

  test("LocalDataFrame validates shapes and unknown columns") {
    intercept[IllegalArgumentException] {
      LocalDataFrame(Seq("a", "b"), Seq(Seq(1)))
    }
    val df = LocalDataFrame(Seq("a"), Seq(Seq(1)))
    intercept[IllegalArgumentException] { df.getIndex("missing") }
    intercept[IllegalArgumentException] { df.addColumn("b", Seq(1, 2)) }
  }
}
