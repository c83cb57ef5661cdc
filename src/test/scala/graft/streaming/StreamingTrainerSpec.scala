package graft.streaming

import org.apache.spark.ml.linalg.Vector
import org.apache.spark.sql.functions._
import graft.SparkSpec

class StreamingTrainerSpec extends SparkSpec {

  test("StreamingTrainer drives OnlineKMeans from an unbounded stream") {
    import spark.implicits._
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val init = Seq((0, Array(0.0, 0.0), 1.0), (1, Array(10.0, 0.0), 1.0))
      .toDF("centroidId", "arr", "weight")
      .select(col("centroidId"),
        org.apache.spark.ml.functions.array_to_vector(col("arr")).as("centroid"),
        col("weight"))
    val stream = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Double, Double)]
    val features = stream.toDF()
      .select(org.apache.spark.ml.functions.array_to_vector(
        array(col("_1"), col("_2"))).as("features"))

    val handle = StreamingTrainer.attach[OnlineKMeansModel](
      features,
      new OnlineKMeansModel().setDecayFactor(0.5).setModelData(init),
      (m, b) => m.update(b, "features"))
    stream.addData((1.0, 0.0), (9.0, 0.0), (11.0, 0.0))
    handle.query.processAllAvailable()
    // second micro-batch continues from the first's state
    stream.addData((3.0, 0.0))
    handle.query.processAllAvailable()
    handle.query.stop()

    val got = handle.latest().getModelData.head.orderBy("centroidId").collect()
      .map(r => (r.getAs[Vector](1)(0), r.getDouble(2)))
    // batch 1: c0 ← (2/3, w=1.5), c1 ← (10, w=2.5); batch 2 folds (3,0)
    // into c0: w = 0.5·1.5 + 1 = 1.75, centroid = (0.5·1.5·2/3 + 3)/1.75
    val expX = (0.5 * 1.5 * (2.0 / 3) + 3.0) / 1.75
    assert(math.abs(got(0)._1 - expX) < 1e-9 && math.abs(got(0)._2 - 1.75) < 1e-9,
      s"got ${got.toSeq}")
    assert(math.abs(got(1)._1 - 10.0) < 1e-9)
  }

  test("StreamingTrainer rejects bounded input") {
    import spark.implicits._
    val bounded = Seq(1, 2, 3).toDF("x")
    val e = intercept[IllegalArgumentException] {
      StreamingTrainer.attach[AnyRef](bounded, new Object, (m, _) => m)
    }
    assert(e.getMessage.contains("streaming DataFrame"))
  }

  test("StreamingTrainer resumes from its checkpoint: the model continues, committed batches are not replayed") {
    import spark.implicits._
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val chk = java.nio.file.Files.createTempDirectory("graft-chk").toString
    val stream = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[Double]
    val vecs = stream.toDF()
      .select(org.apache.spark.ml.functions.array_to_vector(array(col("value"))).as("vec"))

    val h1 = StreamingTrainer.attach[OnlineStandardScalerModel](
      vecs,
      new OnlineStandardScalerModel().setInputCol("vec"),
      (m, b) => m.update(b, "vec"),
      checkpoint = Some(chk))
    stream.addData(1.0, 2.0, 3.0)
    h1.query.processAllAvailable()
    h1.query.stop() // simulated failure after batch 0 committed

    // data that arrives while the trainer is down
    stream.addData(4.0, 5.0)

    // restart against the SAME checkpoint dir with the surviving model:
    // the resumed query must pick up at the committed offset, so the
    // restarted model sees ONLY the new data
    val h2 = StreamingTrainer.attach[OnlineStandardScalerModel](
      vecs, h1.latest(), (m, b) => m.update(b, "vec"), checkpoint = Some(chk))
    h2.query.processAllAvailable()
    h2.query.stop()

    val rows = h2.latest().getModelData.head.orderBy("version").collect()
    // continuity, not reset: versions 0 (pre-crash) and 1 (post-restart);
    // a replay of batch 0 would give count 8 and a third version
    assert(rows.length == 2, rows.toSeq)
    assert(rows(1).getLong(2) == 5L, rows.toSeq)
    assert(math.abs(rows(1).getAs[Vector]("mean")(0) - 3.0) < 1e-9)
  }

  test("versioned online-LR through Structured Streaming survives kill/restart " +
      "with version continuity and correct delay-gated scoring") {
    import spark.implicits._
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val chk = java.nio.file.Files.createTempDirectory("graft-lr-chk").toString
    val stream = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Double, Double, Double, Long)]
    val rows = stream.toDF()
      .select(org.apache.spark.ml.functions.array_to_vector(
        array(col("_1"), col("_2"))).as("features"),
        col("_3").as("label"), col("_4").as("ts"), lit(1.0).as("w"))

    def updateFn(m: OnlineLogisticRegressionModel,
        b: org.apache.spark.sql.DataFrame): OnlineLogisticRegressionModel = {
      val mt = b.agg(max("ts")).head() match {
        case r if r.isNullAt(0) => Long.MaxValue
        case r => r.getLong(0)
      }
      m.update(b, "features", "label", "w", mt)
    }

    val init = new OnlineLogisticRegressionModel()
      .setModelData(OnlineLogisticRegressionModel.zeroInit(spark, 2))
    val h1 = StreamingTrainer.attach[OnlineLogisticRegressionModel](
      rows, init, updateFn, checkpoint = Some(chk))
    stream.addData((1.0, 0.0, 1.0, 1000L), (-1.0, 0.0, 0.0, 1000L))
    h1.query.processAllAvailable()
    h1.query.stop() // simulated failure after batch 0 committed

    // arrives while the trainer is down
    stream.addData((0.0, 1.0, 1.0, 2000L), (0.0, -1.0, 0.0, 2000L))

    // restart on the SAME checkpoint with the surviving model: batch 0
    // must not replay, the version stream must continue 1 → 2
    val h2 = StreamingTrainer.attach[OnlineLogisticRegressionModel](
      rows, h1.latest(), updateFn, checkpoint = Some(chk))
    h2.query.processAllAvailable()
    h2.query.stop()

    val model = h2.latest()
    val versions = model.getModelData.head.orderBy("version")
      .select("version", "modelTimeMs").collect()
    // zeroInit(v0, MinValue) + exactly one version per micro-batch; a
    // replayed batch 0 would append a fourth row
    assert(versions.map(_.getLong(0)).toSeq == Seq(0L, 1L, 2L), versions.toSeq)
    assert(versions.map(_.getLong(1)).drop(1).toSeq == Seq(1000L, 2000L), versions.toSeq)

    // delay-gated scoring across the restart boundary: a row at t=1000
    // is served by the pre-crash version, one at t=2000 by the
    // post-restart version — the reference's row-buffering rule
    // (OnlineLogisticRegressionModel.java:68)
    val scoring = Seq((1.0, 0.0, 1000L), (1.0, 0.0, 2000L), (1.0, 0.0, 99999L))
      .toDF("x1", "x2", "ts")
      .select(org.apache.spark.ml.functions.array_to_vector(
        array(col("x1"), col("x2"))).as("features"), col("ts"))
    val scored = model.setMaxAllowedModelDelayMs(0L).setTimeCol("ts")
      .transform(scoring).head
      .select("ts", "modelVersion").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(scored == Map(1000L -> 1L, 2000L -> 2L, 99999L -> -1L), scored)
  }

  test("StreamingTrainer latest() reflects every committed batch for the scaler") {
    import spark.implicits._
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val stream = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[Double]
    val vecs = stream.toDF()
      .select(org.apache.spark.ml.functions.array_to_vector(array(col("value"))).as("vec"))
    val handle = StreamingTrainer.attach[OnlineStandardScalerModel](
      vecs,
      new OnlineStandardScalerModel().setInputCol("vec"),
      (m, b) => m.update(b, "vec"))
    stream.addData(1.0, 2.0, 3.0)
    handle.query.processAllAvailable()
    val v1 = handle.latest().getModelData.head.count()
    stream.addData(4.0, 5.0)
    handle.query.processAllAvailable()
    handle.query.stop()
    val rows = handle.latest().getModelData.head.orderBy("version").collect()
    assert(v1 == 1 && rows.length == 2)
    // cumulative moments over all 5 values: mean 3, count 5
    assert(rows(1).getLong(2) == 5)
    assert(math.abs(rows(1).getAs[Vector]("mean")(0) - 3.0) < 1e-9)
  }
}
