package graft.streaming

import org.apache.spark.ml.linalg.{Vector, Vectors}
import org.apache.spark.sql.functions.col
import graft.SparkSpec

class OnlineSpec extends SparkSpec {

  private val eps = 1e-9

  test("Windows param codec round trip") {
    val cases: Seq[Windows] = Seq(GlobalWindows, CountTumblingWindows(100),
      EventTimeTumblingWindows(60000), EventTimeSessionWindows(5000),
      ProcessingTimeTumblingWindows(1000), ProcessingTimeSessionWindows(2000))
    cases.foreach { w =>
      assert(Windows.codec.decode(Windows.codec.encode(w)) === w)
    }
  }

  private def scalerInput = {
    import spark.implicits._
    Seq((0L, 1.0), (1000L, 2.0), (1000L, 4.0), (2500L, 3.0), (2500L, 5.0), (2500L, 7.0))
      .toDF("ts", "x")
      .select(col("ts"), org.apache.spark.ml.functions.array_to_vector(
        org.apache.spark.sql.functions.array(col("x"))).as("vec"))
  }

  test("OnlineStandardScaler event-time windows emit cumulative model versions") {
    val model = new OnlineStandardScaler()
      .setInputCol("vec").setTimeCol("ts")
      .setWindows(EventTimeTumblingWindows(1000))
      .fit(scalerInput)
    val versions = model.getModelData.head
      .orderBy("version")
      .collect()
      .map(r => (r.getLong(0), r.getLong(2),
        r.getAs[Vector]("mean")(0), r.getAs[Vector]("std")(0)))
    assert(versions.length == 3)
    val (v0, n0, m0, s0) = versions(0)
    assert(v0 == 0 && n0 == 1 && math.abs(m0 - 1.0) < eps && s0 == 0.0)
    val (_, n1, m1, s1) = versions(1)
    assert(n1 == 3 && math.abs(m1 - 7.0 / 3) < eps && math.abs(s1 - math.sqrt(7.0 / 3)) < eps)
    val (_, n2, m2, s2) = versions(2)
    assert(n2 == 6 && math.abs(m2 - 22.0 / 6) < eps
      && math.abs(s2 - math.sqrt(23.0 + 1.0 / 3) / math.sqrt(5.0)) < 1e-6)
    // transform scales by the latest version and records it
    val out = model.setOutputCol("scaled").transform(scalerInput).head
      .select("scaled", "version").head()
    assert(out.getLong(1) == 2)
    assert(math.abs(out.getAs[Vector](0)(0) - (1.0 - m2) / s2) < eps)
  }

  test("OnlineStandardScaler count and session windows produce the right version counts") {
    val count = new OnlineStandardScaler().setInputCol("vec")
      .setWindows(CountTumblingWindows(2)).fit(scalerInput)
    assert(count.getModelData.head.count() == 3)
    // count triggers only fire full windows: 6 rows / size 4 → ONE
    // version over the first 4 rows; the partial tail emits nothing
    // (Flink countWindowAll semantics)
    val partial = new OnlineStandardScaler().setInputCol("vec")
      .setWindows(CountTumblingWindows(4)).fit(scalerInput)
    val pRows = partial.getModelData.head.collect()
    assert(pRows.length == 1 && pRows.head.getAs[Long]("count") == 4)
    val global = new OnlineStandardScaler().setInputCol("vec")
      .setWindows(GlobalWindows).fit(scalerInput)
    assert(global.getModelData.head.count() == 1)
    import spark.implicits._
    val sessionInput = Seq((0L, 1.0), (100L, 2.0), (5000L, 3.0), (5100L, 4.0))
      .toDF("ts", "x")
      .select(col("ts"), org.apache.spark.ml.functions.array_to_vector(
        org.apache.spark.sql.functions.array(col("x"))).as("vec"))
    val session = new OnlineStandardScaler().setInputCol("vec").setTimeCol("ts")
      .setWindows(EventTimeSessionWindows(1000)).fit(sessionInput)
    assert(session.getModelData.head.count() == 2)
  }

  test("OnlineStandardScaler processing-time windows degenerate to one version on bounded replay") {
    Seq(ProcessingTimeTumblingWindows(1000), ProcessingTimeSessionWindows(1000)).foreach { w =>
      val m = new OnlineStandardScaler().setInputCol("vec").setWindows(w).fit(scalerInput)
      assert(m.getModelData.head.count() == 1)
    }
  }

  test("OnlineStandardScalerModel versioned scoring: earliest qualifying version per row") {
    import spark.implicits._
    // versions: 0 (winEnd 1000), 1 (winEnd 2000), 2 (winEnd 3000)
    val model = new OnlineStandardScaler()
      .setInputCol("vec").setTimeCol("ts")
      .setWindows(EventTimeTumblingWindows(1000))
      .fit(scalerInput)
      .setOutputCol("scaled").setModelVersionCol("ver")
      .setMaxAllowedModelDelayMs(0L)
    val probes = Seq((0L, 6.0), (2500L, 6.0), (9999L, 6.0)).toDF("ts", "x")
      .select(col("ts"), org.apache.spark.ml.functions.array_to_vector(
        org.apache.spark.sql.functions.array(col("x"))).as("vec"))
    val rows = model.transform(probes).head.orderBy("ts")
      .select("ver", "scaled").collect()
    // ts=0 → version 0 (std 0 → output 0); ts=2500 → version 2; ts=9999 → no
    // qualifying version (the reference would buffer forever): null + -1
    assert(rows(0).getLong(0) == 0L && rows(0).getAs[Vector](1)(0) == 0.0)
    assert(rows(1).getLong(0) == 2L)
    val m2 = 22.0 / 6
    val s2 = math.sqrt((23.0 + 1.0 / 3) / 5.0)
    assert(math.abs(rows(1).getAs[Vector](1)(0) - (6.0 - m2) / s2) < eps)
    assert(rows(2).getLong(0) == -1L && rows(2).get(1) == null)
    // a larger delay lets a late row use an OLDER version: ts=2500, delay=1500
    val relaxed = model.setMaxAllowedModelDelayMs(1500L)
      .transform(probes).head.orderBy("ts").select("ver").collect()
    assert(relaxed(1).getLong(0) == 0L)
    assert(relaxed(2).getLong(0) == -1L) // key = 9999-1500 = 8499 > every windowEnd
  }

  test("OnlineKMeans decay update (hand-computed fixture)") {
    import spark.implicits._
    val init = Seq((0, Array(0.0, 0.0), 1.0), (1, Array(10.0, 0.0), 1.0))
      .toDF("centroidId", "arr", "weight")
      .select(col("centroidId"),
        org.apache.spark.ml.functions.array_to_vector(col("arr")).as("centroid"),
        col("weight"))
    val batch = Seq(Array(1.0, 0.0), Array(9.0, 0.0), Array(11.0, 0.0))
      .map(Tuple1(_)).toDF("arr")
      .select(org.apache.spark.ml.functions.array_to_vector(col("arr")).as("features"))
    val model = new OnlineKMeans().setK(2).setDecayFactor(0.5).setGlobalBatchSize(3)
      .setInitialModelData(init).fit(batch)
    val got = model.getModelData.head.orderBy("centroidId").collect()
      .map(r => (r.getAs[Vector](1)(0), r.getDouble(2)))
    // c0: w=0.5·1+1=1.5, λ=2/3 → (2/3, 0); c1: w=0.5+2=2.5, mean (10,0) stays
    assert(math.abs(got(0)._1 - 2.0 / 3) < eps && math.abs(got(0)._2 - 1.5) < eps)
    assert(math.abs(got(1)._1 - 10.0) < eps && math.abs(got(1)._2 - 2.5) < eps)
    // inference assigns to nearest updated centroid
    val pred = model.transform(batch).head.select("prediction").collect().map(_.getInt(0))
    assert(pred.toSeq == Seq(0, 1, 1))
  }

  test("online updates are no-ops on empty micro-batches") {
    import spark.implicits._
    val init = Seq((0, Array(0.0), 1.0), (1, Array(10.0), 1.0))
      .toDF("centroidId", "arr", "weight")
      .select(col("centroidId"),
        org.apache.spark.ml.functions.array_to_vector(col("arr")).as("centroid"),
        col("weight"))
    val empty = Seq.empty[Tuple1[Array[Double]]].toDF("arr")
      .select(org.apache.spark.ml.functions.array_to_vector(col("arr")).as("features"))
    val km = new OnlineKMeansModel().setDecayFactor(0.5).setModelData(init)
    val before = km.getModelData.head.orderBy("centroidId").collect().map(_.toString).toSeq
    val after = km.update(empty, "features")
      .getModelData.head.orderBy("centroidId").collect().map(_.toString).toSeq
    assert(after == before)

    val lrInit = Seq((Array(0.5, -0.5), Array(0.0, 0.0), Array(0.0, 0.0)))
      .toDF("c", "z", "n")
      .select(org.apache.spark.ml.functions.array_to_vector(col("c")).as("coefficient"),
        org.apache.spark.ml.functions.array_to_vector(col("z")).as("zParam"),
        org.apache.spark.ml.functions.array_to_vector(col("n")).as("nParam"))
    val lr = new OnlineLogisticRegressionModel().setModelData(lrInit)
    val emptyLr = Seq.empty[(Array[Double], Double, Double)].toDF("arr", "label", "weight")
      .select(org.apache.spark.ml.functions.array_to_vector(col("arr")).as("features"),
        col("label"), col("weight"))
    val lrAfter = lr.update(emptyLr, "features", "label", "weight")
      .getModelData.head.collect().map(_.toString).toSeq
    assert(lrAfter == lrInit.collect().map(_.toString).toSeq)
  }

  test("OnlineKMeansModel.update drives from Structured Streaming foreachBatch") {
    import spark.implicits._
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val init = Seq((0, Array(0.0, 0.0), 1.0), (1, Array(10.0, 0.0), 1.0))
      .toDF("centroidId", "arr", "weight")
      .select(col("centroidId"),
        org.apache.spark.ml.functions.array_to_vector(col("arr")).as("centroid"),
        col("weight"))
    @volatile var model = new OnlineKMeansModel().setDecayFactor(0.5).setModelData(init)
    val stream = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Double, Double)]
    val query = stream.toDF()
      .select(org.apache.spark.ml.functions.array_to_vector(
        org.apache.spark.sql.functions.array(col("_1"), col("_2"))).as("features"))
      .writeStream
      .foreachBatch { (df: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
        model = model.update(df, "features")
      }
      .start()
    stream.addData((1.0, 0.0), (9.0, 0.0), (11.0, 0.0))
    query.processAllAvailable()
    query.stop()
    val got = model.getModelData.head.orderBy("centroidId").collect()
      .map(r => (r.getAs[Vector](1)(0), r.getDouble(2)))
    assert(math.abs(got(0)._1 - 2.0 / 3) < eps && math.abs(got(0)._2 - 1.5) < eps)
    assert(math.abs(got(1)._1 - 10.0) < eps && math.abs(got(1)._2 - 2.5) < eps)
  }

  test("OnlineStandardScalerModel.update from foreachBatch matches the windowed fit") {
    import spark.implicits._
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    // reference run: count-tumbling windows of 3 over the same 6 values
    val fitModel = new OnlineStandardScaler().setInputCol("vec")
      .setWindows(CountTumblingWindows(3)).fit(scalerInput)
    val expected = fitModel.getModelData.head.orderBy("version").collect()
      .map(r => (r.getLong(2), r.getAs[Vector]("mean")(0), r.getAs[Vector]("std")(0)))

    @volatile var model = new OnlineStandardScalerModel().setInputCol("vec")
    val stream = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[Double]
    val query = stream.toDF()
      .select(org.apache.spark.ml.functions.array_to_vector(
        org.apache.spark.sql.functions.array(col("value"))).as("vec"))
      .writeStream
      .foreachBatch { (df: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
        model = model.update(df)
      }
      .start()
    stream.addData(1.0, 2.0, 4.0)     // micro-batch 1 == window 1
    query.processAllAvailable()
    stream.addData(3.0, 5.0, 7.0)     // micro-batch 2 == window 2
    query.processAllAvailable()
    query.stop()
    val got = model.getModelData.head.orderBy("version").collect()
      .map(r => (r.getLong(2), r.getAs[Vector]("mean")(0), r.getAs[Vector]("std")(0)))
    assert(got.length == 2 && expected.length == 2)
    got.zip(expected).foreach { case ((n1, m1, s1), (n2, m2, s2)) =>
      assert(n1 == n2 && math.abs(m1 - m2) < 1e-9 && math.abs(s1 - s2) < 1e-9)
    }
    // the streamed model scores like any fitted model
    val scored = model.setOutputCol("scaled").transform(scalerInput).head
      .select("version").head().getLong(0)
    assert(scored == 1L)
  }

  test("OnlineLogisticRegressionModel.update drives from Structured Streaming foreachBatch") {
    import spark.implicits._
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val init = OnlineLogisticRegressionModel.zeroInit(spark, 1)
    val batch = Seq((Array(1.0), 1.0)).toDF("arr", "label")
      .select(org.apache.spark.ml.functions.array_to_vector(col("arr")).as("features"),
        col("label"))
    @volatile var model = new OnlineLogisticRegression()
      .setAlpha(0.1).setBeta(1.0).setReg(0.0).setElasticNet(0.0)
      .setGlobalBatchSize(1).setInitialModelData(init)
      .fit(batch)
    val stream = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Double, Double)]
    val query = stream.toDF()
      .select(org.apache.spark.ml.functions.array_to_vector(
        org.apache.spark.sql.functions.array(col("_1"))).as("features"),
        col("_2").as("label"),
        org.apache.spark.sql.functions.lit(1.0).as("w"))
      .writeStream
      .foreachBatch { (df: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
        model = model.update(df, "features", "label", "w")
      }
      .start()
    stream.addData((1.0, 1.0)) // same point as the hand-computed second FTRL step
    query.processAllAvailable()
    query.stop()
    val w2 = model.getModelData.head.orderBy(col("version").desc).limit(1)
      .select("coefficient").head().getAs[Vector](0)(0)
    assert(math.abs(w2 - 0.062234) < 1e-5)
  }

  test("StreamingStats: watermarked windowed aggregation over a real stream") {
    import spark.implicits._
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val stream = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(java.sql.Timestamp, Double)]
    val agg = StreamingStats.windowedMoments(
      stream.toDF().toDF("ts", "value"), "ts", "value", "10 seconds", "5 seconds")
    val query = agg.writeStream.outputMode("append")
      .format("memory").queryName("win_stats").start()
    def ts(s: Long) = new java.sql.Timestamp(s * 1000)
    stream.addData((ts(1), 2.0), (ts(3), 4.0), (ts(12), 10.0))
    query.processAllAvailable()
    // watermark has not passed the first window's end yet → nothing emitted
    assert(spark.table("win_stats").count() == 0)
    stream.addData((ts(100), 1.0)) // advances the watermark past both windows
    query.processAllAvailable()
    query.stop()
    val rows = spark.table("win_stats").orderBy("window_start").collect()
    assert(rows.length == 2)
    assert(rows(0).getLong(2) == 2 && math.abs(rows(0).getDouble(3) - 3.0) < eps)
    assert(rows(1).getLong(2) == 1 && rows(1).getDouble(6) == 10.0)
  }

  test("KeyedRunningStats: per-key state persists across micro-batches") {
    import spark.implicits._
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val stream = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(String, Double)]
    val stats = KeyedRunningStats.runningMoments(stream.toDF().toDF("k", "v"), "k", "v")
    val query = stats.writeStream.outputMode("update")
      .format("memory").queryName("key_stats").start()
    stream.addData(("a", 1.0), ("a", 3.0), ("b", 10.0))
    query.processAllAvailable()
    stream.addData(("a", 5.0)) // second micro-batch updates a's existing state
    query.processAllAvailable()
    query.stop()
    val last = spark.table("key_stats").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2), r.getDouble(3)))
      .groupBy(_._1).map { case (k, rows) => k -> rows.maxBy(_._2) }
    // a: n=3 over both batches, mean 3, var ((1-3)²+(3-3)²+(5-3)²)/2 = 4
    assert(last("a") == ("a", 3L, 3.0, 4.0))
    assert(last("b") == ("b", 1L, 10.0, 0.0))
  }

  test("OnlineLogisticRegression FTRL steps (hand-computed fixture)") {
    import spark.implicits._
    val init = OnlineLogisticRegressionModel.zeroInit(spark, 1)
    val batch = Seq((Array(1.0), 1.0)).toDF("arr", "label")
      .select(org.apache.spark.ml.functions.array_to_vector(col("arr")).as("features"),
        col("label"))
    val est = new OnlineLogisticRegression()
      .setAlpha(0.1).setBeta(1.0).setReg(0.0).setElasticNet(0.0)
      .setGlobalBatchSize(1).setInitialModelData(init)
    val m1 = est.fit(batch)
    def latestCoef(m: OnlineLogisticRegressionModel): Double =
      m.getModelData.head.orderBy(col("version").desc).limit(1)
        .select("coefficient").head().getAs[Vector](0)(0)
    val w1 = latestCoef(m1)
    // g=−0.5, σ=5, z=−0.5, n=0.25 → w = 0.5/((1+0.5)/0.1) = 1/30
    assert(math.abs(w1 - 0.5 / 15) < eps)
    val m2 = m1.update(batch.withColumn("w", org.apache.spark.sql.functions.lit(1.0)),
      "features", "label", "w")
    val w2 = latestCoef(m2)
    assert(math.abs(w2 - 0.062234) < 1e-5)
    // prediction crosses 0.5 with a positive coefficient and x=1
    val out = m2.transform(batch).head.select("prediction").head().getDouble(0)
    assert(out == 1.0)
  }

  test("OnlineLogisticRegressionModel versioned scoring: earliest qualifying version per row") {
    import spark.implicits._
    def featDf(rows: Seq[(Double, Double)]) = rows.toDF("x", "label")
      .select(org.apache.spark.ml.functions.array_to_vector(
        org.apache.spark.sql.functions.array(col("x"))).as("features"),
        col("label"), org.apache.spark.sql.functions.lit(1.0).as("w"))
    val init = OnlineLogisticRegressionModel.zeroInit(spark, 1)
    val m0 = new OnlineLogisticRegressionModel().setModelData(init)
    m0.set(m0.reg, 0.0); m0.set(m0.elasticNet, 0.0)
    m0.set(m0.alpha, 0.1); m0.set(m0.beta, 1.0)
    // version 1 at t=1000 (one step toward label 1), version 2 at t=2000
    val m1 = m0.update(featDf(Seq((1.0, 1.0))), "features", "label", "w", 1000L)
    val m2 = m1.update(featDf(Seq((1.0, 1.0))), "features", "label", "w", 2000L)
    val stream = m2.getModelData.head.orderBy("version").collect()
    assert(stream.map(_.getAs[Long]("version")).toSeq == Seq(0L, 1L, 2L))
    assert(stream.map(_.getAs[Long]("modelTimeMs")).toSeq ==
      Seq(Long.MinValue, 1000L, 2000L))

    val probes = Seq((0L, 1.0), (1500L, 1.0), (9999L, 1.0)).toDF("ts", "x")
      .select(col("ts"), org.apache.spark.ml.functions.array_to_vector(
        org.apache.spark.sql.functions.array(col("x"))).as("features"))
    val scored = m2.setMaxAllowedModelDelayMs(0L).setTimeCol("ts")
      .setModelVersionCol("ver")
      .transform(probes).head.orderBy("ts")
      .select("ver", "prediction", "rawPrediction").collect()
    // ts=0 → earliest version with time >= 0 is v1 (the zero-init v0 at
    // MinValue is never servable); ts=1500 → v2; ts=9999 → none: buffered
    assert(scored(0).getLong(0) == 1L && scored(0).getDouble(1) == 1.0)
    val p1 = scored(0).getAs[Vector](2)(1)
    assert(math.abs(p1 - 1.0 / (1.0 + math.exp(-0.5 / 15))) < eps)
    assert(scored(1).getLong(0) == 2L)
    val p2 = scored(1).getAs[Vector](2)(1)
    assert(math.abs(p2 - 1.0 / (1.0 + math.exp(-0.062234))) < 1e-5)
    assert(scored(2).getLong(0) == -1L && scored(2).get(1) == null && scored(2).get(2) == null)
    // a larger delay lets a late row use an OLDER version
    val relaxed = m2.setMaxAllowedModelDelayMs(1500L)
      .transform(probes).head.orderBy("ts").select("ver").collect()
    assert(relaxed(1).getLong(0) == 1L)  // key = 1500-1500 = 0 → v1
    assert(relaxed(2).getLong(0) == -1L) // key = 8499 > every modelTimeMs
  }
}
