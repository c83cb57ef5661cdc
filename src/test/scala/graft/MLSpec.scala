package graft

import org.apache.spark.ml.linalg.{Vector, Vectors}
import graft.classification._
import graft.clustering._
import graft.regression._

class MLSpec extends SparkSpec {

  test("KMeans separates the reference's two clusters") {
    import spark.implicits._
    // reference KMeansTest DATA: two clusters around (0,0) and (9,0)
    val data = Seq(
      Vectors.dense(0.0, 0.0), Vectors.dense(0.0, 0.3), Vectors.dense(0.3, 0.0),
      Vectors.dense(9.0, 0.0), Vectors.dense(9.0, 0.6), Vectors.dense(9.6, 0.0))
      .map(Tuple1(_)).toDF("features")
    val model = new KMeans().setK(2).setMaxIter(10).setSeed(42L).fit(data)
    val out = model.transform(data).head
      .select("features", "prediction").collect()
      .map(r => (r.getAs[Vector](0), r.getInt(1)))
    val groups = out.groupBy(_._2).values.map(_.map(_._1).toSet).toSet
    assert(groups == Set(
      Set(Vectors.dense(0.0, 0.0), Vectors.dense(0.0, 0.3), Vectors.dense(0.3, 0.0)),
      Set(Vectors.dense(9.0, 0.0), Vectors.dense(9.0, 0.6), Vectors.dense(9.6, 0.0))))
    // centroids are cluster means
    val centroids = model.getModelData.head.collect()
      .map(_.getAs[Vector]("centroid").toArray).sortBy(_.head)
    assert(centroids(0).zip(Array(0.1, 0.1)).forall { case (a, b) => math.abs(a - b) < 1e-9 })
    assert(centroids(1).zip(Array(9.2, 0.2)).forall { case (a, b) => math.abs(a - b) < 1e-9 })
  }

  test("KMeans with fewer distinct points than clusters keeps one group") {
    import spark.implicits._
    // KMeansTest.java:154-173: three identical points, k=2 → all rows
    // land in one cluster; no crash on the empty cluster
    val data = Seq(
      Vectors.dense(0.0, 0.1), Vectors.dense(0.0, 0.1), Vectors.dense(0.0, 0.1))
      .map(Tuple1(_)).toDF("features")
    val model = new KMeans().setK(2).setMaxIter(3).setSeed(11L).fit(data)
    val preds = model.transform(data).head
      .select("prediction").collect().map(_.getInt(0)).toSet
    assert(preds.size == 1)
  }

  test("KMeans warm start from fixed initial centroids is deterministic") {
    import spark.implicits._
    val data = Seq(
      Vectors.dense(0.0, 0.0), Vectors.dense(1.0, 0.0),
      Vectors.dense(9.0, 0.0), Vectors.dense(10.0, 0.0))
      .map(Tuple1(_)).toDF("features")
    val init = Seq((0, Vectors.dense(2.0, 0.0)), (1, Vectors.dense(8.0, 0.0)))
      .toDF("centroidId", "centroid")
    // one Lloyd round from the fixed seeds: {0,1}→(0.5,0), {9,10}→(9.5,0)
    val model = new KMeans().setK(2).setMaxIter(1).setInitialModelData(init).fit(data)
    val centroids = model.getModelData.head.orderBy("centroidId").collect()
      .map(_.getAs[Vector]("centroid")(0))
    assert(math.abs(centroids(0) - 0.5) < 1e-12 && math.abs(centroids(1) - 9.5) < 1e-12)
    // wrong centroid count fails fast
    val bad = intercept[IllegalArgumentException] {
      new KMeans().setK(3).setMaxIter(1).setInitialModelData(init).fit(data)
    }
    assert(bad.getMessage.contains("initial centroids"))
  }

  test("KMeans save/load and cosine distance") {
    import spark.implicits._
    val data = Seq(
      Vectors.dense(1.0, 0.1), Vectors.dense(2.0, 0.2),
      Vectors.dense(0.1, 1.0), Vectors.dense(0.2, 2.0)).map(Tuple1(_)).toDF("features")
    val model = new KMeans().setK(2).setMaxIter(5).setSeed(7L)
      .setDistanceMeasure("cosine").fit(data)
    val dir = tmpDir()
    model.save(dir)
    val loaded = KMeansModel.load(spark, dir)
    assert(loaded.getDistanceMeasure == "cosine")
    val preds = loaded.transform(data).head.select("prediction").as[Int].collect()
    assert(preds(0) == preds(1) && preds(2) == preds(3) && preds(0) != preds(2))
  }

  test("LogisticRegression learns the reference's binomial data") {
    import spark.implicits._
    // reference LogisticRegressionTest binomial fixture
    val binomial = Seq(
      (Vectors.dense(1, 2, 3, 4), 0.0, 1.0), (Vectors.dense(2, 2, 3, 4), 0.0, 2.0),
      (Vectors.dense(3, 2, 3, 4), 0.0, 3.0), (Vectors.dense(4, 2, 3, 4), 0.0, 4.0),
      (Vectors.dense(5, 2, 3, 4), 0.0, 5.0), (Vectors.dense(11, 2, 3, 4), 1.0, 1.0),
      (Vectors.dense(12, 2, 3, 4), 1.0, 2.0), (Vectors.dense(13, 2, 3, 4), 1.0, 3.0),
      (Vectors.dense(14, 2, 3, 4), 1.0, 4.0), (Vectors.dense(15, 2, 3, 4), 1.0, 5.0))
      .toDF("features", "label", "weight")
    val model = new LogisticRegression().setWeightCol("weight").setMaxIter(100)
      .setLearningRate(0.1).setGlobalBatchSize(10).fit(binomial)
    val out = model.transform(binomial).head
      .select("label", "prediction", "rawPrediction").collect()
    out.foreach { r =>
      assert(r.getDouble(0) == r.getDouble(1), s"mispredicted: $r")
      val raw = r.getAs[Vector](2)
      assert(math.abs(raw(0) + raw(1) - 1.0) < 1e-9)
      if (r.getDouble(1) == 1.0) assert(raw(1) > 0.5) else assert(raw(1) < 0.5)
    }
  }

  test("LinearSVC separates the binomial data") {
    import spark.implicits._
    val binomial = (1 to 5).map(i => (Vectors.dense(i.toDouble, 1.0), 0.0)) ++
      (11 to 15).map(i => (Vectors.dense(i.toDouble, 1.0), 1.0))
    val df = binomial.toDF("features", "label")
    val model = new LinearSVC().setMaxIter(200).setLearningRate(0.05)
      .setGlobalBatchSize(10).fit(df)
    val out = model.transform(df).head.select("label", "prediction").collect()
    out.foreach(r => assert(r.getDouble(0) == r.getDouble(1), s"mispredicted: $r"))
  }

  test("LinearSVC threshold extremes flip every prediction (reference testThreshold)") {
    import spark.implicits._
    val binomial = (1 to 5).map(i => (Vectors.dense(i.toDouble, 1.0), 0.0)) ++
      (11 to 15).map(i => (Vectors.dense(i.toDouble, 1.0), 1.0))
    val df = binomial.toDF("features", "label")
    def preds(threshold: Double): Seq[Double] =
      new LinearSVC().setMaxIter(50).setLearningRate(0.05).setGlobalBatchSize(10)
        .setThreshold(threshold).fit(df)
        .transform(df).head.select("prediction").as[Double].collect().toSeq
    assert(preds(-Double.MaxValue).forall(_ == 1.0))
    assert(preds(Double.MaxValue).forall(_ == 0.0))
  }

  test("LinearRegression fits y = 2x + 1") {
    import spark.implicits._
    val df = (1 to 20).map { i =>
      (Vectors.dense(i.toDouble / 10, 1.0), 2.0 * i / 10 + 1.0)
    }.toDF("features", "label")
    val model = new LinearRegression().setMaxIter(500).setLearningRate(0.3)
      .setGlobalBatchSize(20).fit(df)
    val coeff = model.getModelData.head.head().getAs[Vector](0).toArray
    assert(math.abs(coeff(0) - 2.0) < 0.15, s"slope ${coeff(0)}")
    assert(math.abs(coeff(1) - 1.0) < 0.15, s"intercept ${coeff(1)}")
    val preds = model.transform(df).head.select("label", "prediction").collect()
    preds.foreach(r => assert(math.abs(r.getDouble(0) - r.getDouble(1)) < 0.3))
  }

  test("SGD regularization matches reference math") {
    import graft.common.optim.SGD
    // L2 only
    val w1 = Array(3.0, 4.0)
    val loss1 = SGD.regularize(w1, 0.1, 0.0, 0.01)
    assert(math.abs(loss1 - 0.05 * 5.0) < 1e-12) // reg/2 * ||w||₂
    assert(math.abs(w1(0) - 3.0 * (1 - 0.001)) < 1e-12)
    // L1 only
    val w2 = Array(3.0, -4.0)
    SGD.regularize(w2, 0.1, 1.0, 0.01)
    assert(math.abs(w2(0) - (3.0 - 0.001)) < 1e-12)
    assert(math.abs(w2(1) - (-4.0 + 0.001)) < 1e-12)
  }

  test("NaiveBayes on the reference-style categorical data") {
    import spark.implicits._
    val train = Seq(
      (Vectors.dense(0.0, 0.0), 11.0), (Vectors.dense(0.0, 1.0), 11.0),
      (Vectors.dense(1.0, 0.0), 10.0), (Vectors.dense(1.0, 1.0), 10.0),
      (Vectors.dense(1.0, 1.0), 10.0)).toDF("features", "label")
    val model = new NaiveBayes().setSmoothing(1.0).fit(train)
    val out = model.transform(train).head.select("label", "prediction").collect()
    out.foreach(r => assert(r.getDouble(0) == r.getDouble(1), s"mispredicted $r"))
    // save/load round trip
    val dir = tmpDir()
    model.save(dir)
    val loaded = NaiveBayesModel.load(spark, dir)
    val out2 = loaded.transform(train).head.select("prediction").as[Double].collect()
    assert(out2.toSeq == out.map(_.getDouble(1)).toSeq)
  }

  test("NaiveBayes reference fixture predictions + ragged-vector rejection") {
    import spark.implicits._
    // NaiveBayesTest.java:67-92 — exact train/predict/expected
    val train = Seq(
      (Vectors.dense(0.0, 0.0), 11.0), (Vectors.dense(1.0, 0.0), 10.0),
      (Vectors.dense(1.0, 1.0), 10.0)).toDF("features", "label")
    val model = new NaiveBayes().setSmoothing(1.0).fit(train)
    val predict = Seq(Vectors.dense(0.0, 1.0), Vectors.dense(0.0, 0.0),
      Vectors.dense(1.0, 0.0), Vectors.dense(1.0, 1.0)).map(Tuple1(_)).toDF("features")
    val got = model.transform(predict).head
      .select("features", "prediction").collect()
      .map(r => r.getAs[Vector](0) -> r.getDouble(1)).toMap
    assert(got == Map(
      Vectors.dense(0.0, 1.0) -> 11.0, Vectors.dense(0.0, 0.0) -> 11.0,
      Vectors.dense(1.0, 0.0) -> 10.0, Vectors.dense(1.0, 1.0) -> 10.0))

    // ragged vectors are rejected at fit with the reference's message
    // (NaiveBayesTest testVectorWithDiffLen) — not silently mistrained
    val ragged = Seq(
      (Vectors.dense(0.0, 0.0), 11.0), (Vectors.dense(1.0, 0.0), 10.0),
      (Vectors.dense(1.0), 10.0)).toDF("features", "label")
    val e = intercept[IllegalArgumentException] { new NaiveBayes().fit(ragged) }
    assert(e.getMessage.contains("equal length"), e.getMessage)

    // unseen feature VALUE at predict: the reference NPEs
    // (testPredictUnseenFeature); we score the label -Inf instead and
    // still emit a deterministic prediction — graceful by design
    val unseen = Seq(Vectors.dense(2.0, 1.0)).map(Tuple1(_)).toDF("features")
    val p = model.transform(unseen).head.select("prediction").as[Double].head()
    assert(p == 10.0 || p == 11.0)
  }

  test("Knn classifies by majority of k nearest") {
    import spark.implicits._
    val train = Seq(
      (Vectors.dense(0.0, 0.0), 0.0), (Vectors.dense(0.1, 0.1), 0.0),
      (Vectors.dense(0.2, 0.0), 0.0), (Vectors.dense(5.0, 5.0), 1.0),
      (Vectors.dense(5.1, 5.2), 1.0), (Vectors.dense(4.9, 5.0), 1.0)).toDF("features", "label")
    val model = new Knn().setK(3).fit(train)
    val test = Seq(Vectors.dense(0.05, 0.05), Vectors.dense(5.05, 5.05))
      .map(Tuple1(_)).toDF("features")
    val preds = model.transform(test).head.select("prediction").as[Double].collect()
    assert(preds.toSeq == Seq(0.0, 1.0))
  }

  test("KnnModel rejects probe batches past MaxProbes with a clear error") {
    import spark.implicits._
    val train = Seq((Vectors.dense(0.0), 0.0), (Vectors.dense(1.0), 1.0))
      .toDF("features", "label")
    val model = new Knn().setK(1).fit(train)
    val bigProbe = spark.range(KnnModel.MaxProbes + 1)
      .select(org.apache.spark.ml.functions.array_to_vector(
        org.apache.spark.sql.functions.array(
          org.apache.spark.sql.functions.col("id").cast("double"))).as("features"))
    val e = intercept[IllegalArgumentException] { model.transform(bigProbe) }
    assert(e.getMessage.contains("BruteForceCosineKnn"))
  }

  test("Pipeline with estimator: scaler then kmeans, save/load") {
    import spark.implicits._
    val df = Seq(
      Vectors.dense(0.0, 1.0), Vectors.dense(0.5, 1.0), Vectors.dense(9.0, 1.0),
      Vectors.dense(9.5, 1.0)).map(Tuple1(_)).toDF("input")
    val pipeline = new graft.api.Pipeline(Seq(
      new graft.feature.StandardScaler().setInputCol("input").setOutputCol("features"),
      new KMeans().setK(2).setMaxIter(5).setSeed(3L)))
    val model = pipeline.fit(df)
    val out = model.transform(df).head
    val preds = out.select("prediction").as[Int].collect()
    assert(preds(0) == preds(1) && preds(2) == preds(3) && preds(0) != preds(2))

    val dir = tmpDir()
    model.save(dir)
    val loaded = graft.api.PipelineModel.load(spark, dir)
    val preds2 = loaded.transform(df).head.select("prediction").as[Int].collect()
    assert(preds2.toSeq == preds.toSeq)
  }
}
