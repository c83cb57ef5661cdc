package graft

import org.apache.spark.ml.linalg.{Vector, Vectors}
import org.apache.spark.sql.functions._

/**
 * Differential tests against spark.ml — an independent, mature
 * implementation of the same algorithms. These complement the DuckDB
 * oracles (which replay deterministic math) by checking STATISTICAL
 * agreement on the iterative trainers, where unrolled-SQL oracles are
 * weakest. Seeded synthetic data; thresholds chosen with margin so
 * the tests are deterministic, not flaky.
 */
class DifferentialSpec extends SparkSpec {

  private def blobs(n: Int, seed: Int): Seq[(Vector, Double)] = {
    val rnd = new scala.util.Random(seed)
    (0 until n).map { i =>
      val label = i % 2
      val cx = if (label == 0) -2.0 else 2.0
      (Vectors.dense(cx + rnd.nextGaussian() * 0.7,
        cx * 0.5 + rnd.nextGaussian() * 0.7), label.toDouble)
    }
  }

  test("LogisticRegression predictions agree with spark.ml on separable data") {
    import spark.implicits._
    val df = blobs(400, 11).toDF("features", "label").cache()
    val ours = new graft.classification.LogisticRegression()
      .setMaxIter(120).setLearningRate(0.5).setGlobalBatchSize(400)
      .fit(df).transform(df).head
      .select(col("prediction").cast("double").as("p_ours"), col("features"))
    val theirs = new org.apache.spark.ml.classification.LogisticRegression()
      .setMaxIter(50).fit(df).transform(df)
      .select(col("prediction").as("p_sparkml"), col("features"))
    val joined = ours.join(theirs, "features")
    val n = joined.count().toDouble
    val agree = joined.where(col("p_ours") === col("p_sparkml")).count().toDouble
    assert(agree / n >= 0.97, s"agreement ${agree / n}")
  }

  test("NaiveBayes predictions match spark.ml multinomial exactly") {
    import spark.implicits._
    val rnd = new scala.util.Random(5)
    val rows = (0 until 300).map { i =>
      val label = i % 3
      // per-class token-count profiles with a dominant dimension
      val counts = Array.tabulate(4) { d =>
        val base = if (d == label) 6 else 1
        (base + rnd.nextInt(3)).toDouble
      }
      (Vectors.dense(counts): Vector, label.toDouble)
    }
    val df = rows.toDF("features", "label").cache()
    val ours = new graft.classification.NaiveBayes().setSmoothing(1.0)
      .fit(df).transform(df).head
      .select(col("features"), col("prediction").cast("double").as("p_ours"))
    val theirs = new org.apache.spark.ml.classification.NaiveBayes()
      .setSmoothing(1.0).setModelType("multinomial").fit(df).transform(df)
      .select(col("features"), col("prediction").as("p_sparkml"))
    val joined = ours.join(theirs, "features")
    // same closed-form math on both sides → identical argmax everywhere
    assert(joined.where(col("p_ours") =!= col("p_sparkml")).count() == 0)
  }

  test("LinearRegression recovers the same coefficients as spark.ml (no intercept)") {
    import spark.implicits._
    val rnd = new scala.util.Random(3)
    val w = Array(2.0, -3.0, 0.5)
    val rows = (0 until 500).map { _ =>
      val x = Array.fill(3)(rnd.nextGaussian())
      val y = x.zip(w).map { case (a, b) => a * b }.sum
      (Vectors.dense(x): Vector, y)
    }
    val df = rows.toDF("features", "label").cache()
    val ourCoef = new graft.regression.LinearRegression()
      .setMaxIter(200).setLearningRate(0.1).setGlobalBatchSize(500)
      .fit(df).getModelData.head
      .select("coefficient").head().getAs[Vector](0).toArray
    val theirCoef = new org.apache.spark.ml.regression.LinearRegression()
      .setFitIntercept(false).fit(df).coefficients.toArray
    ourCoef.zip(theirCoef).zip(w).foreach { case ((a, b), t) =>
      assert(math.abs(a - b) < 0.05, s"ours $a vs sparkml $b (true $t)")
      assert(math.abs(a - t) < 0.05)
    }
  }

  test("MinMaxScaler transforms identically to spark.ml") {
    import spark.implicits._
    val rnd = new scala.util.Random(23)
    val rows = (0 until 200).map(_ => Tuple1(
      Vectors.dense(Array.fill(4)(rnd.nextGaussian() * 10)): Vector))
    val df = rows.toDF("features").cache()
    val ours = new graft.feature.MinMaxScaler()
      .setInputCol("features").setOutputCol("scaled")
      .fit(df).transform(df).head.select("features", "scaled")
    val theirs = new org.apache.spark.ml.feature.MinMaxScaler()
      .setInputCol("features").setOutputCol("scaled2")
      .fit(df).transform(df).select("features", "scaled2")
    ours.join(theirs, "features").collect().foreach { r =>
      val a = r.getAs[Vector]("scaled").toArray
      val b = r.getAs[Vector]("scaled2").toArray
      a.indices.foreach(i => assert(math.abs(a(i) - b(i)) < 1e-12, s"dim $i: ${a(i)} vs ${b(i)}"))
    }
  }

  private def assertVectorsAgree(ours: org.apache.spark.sql.DataFrame,
      theirs: org.apache.spark.sql.DataFrame, ourCol: String, theirCol: String,
      tol: Double = 1e-12): Unit =
    ours.join(theirs, "features").collect().foreach { r =>
      val a = r.getAs[Vector](ourCol).toArray
      val b = r.getAs[Vector](theirCol).toArray
      assert(a.length == b.length)
      a.indices.foreach(i => assert(math.abs(a(i) - b(i)) < tol, s"dim $i: ${a(i)} vs ${b(i)}"))
    }

  private def gaussianVecs(n: Int, dim: Int, seed: Int) = {
    import spark.implicits._
    val rnd = new scala.util.Random(seed)
    (0 until n).map(_ => Tuple1(Vectors.dense(Array.fill(dim)(rnd.nextGaussian() * 5)): Vector))
      .toDF("features").cache()
  }

  test("StandardScaler matches spark.ml across the withMean/withStd matrix") {
    val df = gaussianVecs(150, 3, 41)
    for ((wm, ws) <- Seq((false, true), (true, true), (true, false))) {
      val ours = new graft.feature.StandardScaler()
        .setInputCol("features").setOutputCol("s").setWithMean(wm).setWithStd(ws)
        .fit(df).transform(df).head.select("features", "s")
      val theirs = new org.apache.spark.ml.feature.StandardScaler()
        .setInputCol("features").setOutputCol("s2").setWithMean(wm).setWithStd(ws)
        .fit(df).transform(df).select("features", "s2")
      assertVectorsAgree(ours, theirs, "s", "s2", 1e-9)
    }
  }

  test("MaxAbsScaler transforms identically to spark.ml") {
    val df = gaussianVecs(150, 4, 43)
    val ours = new graft.feature.MaxAbsScaler()
      .setInputCol("features").setOutputCol("s")
      .fit(df).transform(df).head.select("features", "s")
    val theirs = new org.apache.spark.ml.feature.MaxAbsScaler()
      .setInputCol("features").setOutputCol("s2")
      .fit(df).transform(df).select("features", "s2")
    assertVectorsAgree(ours, theirs, "s", "s2")
  }

  test("PolynomialExpansion matches spark.ml up to monomial ordering") {
    val df = gaussianVecs(40, 3, 47)
    // spark.ml orders expanded monomials differently; compare as sorted
    // multisets per row (the same monomial values must appear)
    val ours = new graft.feature.PolynomialExpansion()
      .setInputCol("features").setOutputCol("p").setDegree(3)
      .transform(df).head.select("features", "p")
    val theirs = new org.apache.spark.ml.feature.PolynomialExpansion()
      .setInputCol("features").setOutputCol("p2").setDegree(3)
      .transform(df).select("features", "p2")
    ours.join(theirs, "features").collect().foreach { r =>
      val a = r.getAs[Vector]("p").toArray.sorted
      val b = r.getAs[Vector]("p2").toArray.sorted
      assert(a.length == b.length)
      a.indices.foreach(i => assert(math.abs(a(i) - b(i)) < 1e-9, s"$i: ${a(i)} vs ${b(i)}"))
    }
  }

  test("DCT forward and inverse match spark.ml") {
    val df = gaussianVecs(60, 8, 53)
    for (inv <- Seq(false, true)) {
      val ours = new graft.feature.DCT()
        .setInputCol("features").setOutputCol("d").setInverse(inv)
        .transform(df).head.select("features", "d")
      val theirs = new org.apache.spark.ml.feature.DCT()
        .setInputCol("features").setOutputCol("d2").setInverse(inv)
        .transform(df).select("features", "d2")
      assertVectorsAgree(ours, theirs, "d", "d2", 1e-9)
    }
  }

  test("RobustScaler transforms identically to spark.ml (GK sketch fit)") {
    import spark.implicits._
    val rnd = new scala.util.Random(41)
    val rows = (0 until 500).map(_ => Tuple1(
      Vectors.dense(Array.fill(3)(rnd.nextGaussian() * 5 + 1)): Vector))
    val df = rows.toDF("features").cache()
    val ours = new graft.feature.RobustScaler()
      .setInputCol("features").setOutputCol("scaled")
      .setWithCentering(true).setWithScaling(true)
      .fit(df).transform(df).head.select("features", "scaled")
    val theirs = new org.apache.spark.ml.feature.RobustScaler()
      .setInputCol("features").setOutputCol("scaled2")
      .setWithCentering(true).setWithScaling(true)
      .fit(df).transform(df).select("features", "scaled2")
    ours.join(theirs, "features").collect().foreach { r =>
      val a = r.getAs[Vector]("scaled").toArray
      val b = r.getAs[Vector]("scaled2").toArray
      a.indices.foreach(i => assert(math.abs(a(i) - b(i)) < 1e-9, s"dim $i: ${a(i)} vs ${b(i)}"))
    }
  }

  test("VectorIndexer category maps match spark.ml (capped distinct fit)") {
    import spark.implicits._
    val rnd = new scala.util.Random(43)
    // dim 0: categorical {0, 1, 3}; dim 1: continuous uniform
    val rows = (0 until 400).map { _ =>
      Tuple1(Vectors.dense(
        Seq(0.0, 1.0, 3.0)(rnd.nextInt(3)), rnd.nextDouble() * 100): Vector)
    }
    val df = rows.toDF("features").cache()
    val ours = new graft.feature.VectorIndexer().setMaxCategories(4)
      .setInputCol("features").setOutputCol("indexed")
      .fit(df).transform(df).head.select("features", "indexed")
    val theirs = new org.apache.spark.ml.feature.VectorIndexer().setMaxCategories(4)
      .setInputCol("features").setOutputCol("indexed2")
      .fit(df).transform(df).select("features", "indexed2")
    ours.join(theirs, "features").collect().foreach { r =>
      val a = r.getAs[Vector]("indexed").toArray
      val b = r.getAs[Vector]("indexed2").toArray
      a.indices.foreach(i => assert(a(i) == b(i), s"dim $i: ${a(i)} vs ${b(i)}"))
    }
  }

  test("IDF weights match spark.ml exactly") {
    import spark.implicits._
    val rnd = new scala.util.Random(31)
    val rows = (0 until 100).map { _ =>
      val idx = (0 until 6).filter(_ => rnd.nextBoolean())
      Tuple1(Vectors.sparse(6, idx.map(i => (i, rnd.nextInt(5) + 1.0))): Vector)
    }
    val df = rows.toDF("features").cache()
    val ourIdf = new graft.feature.IDF().setMinDocFreq(1)
      .setInputCol("features").setOutputCol("w")
      .fit(df).getModelData.head.head().getAs[Vector](0).toArray
    val theirIdf = new org.apache.spark.ml.feature.IDF().setMinDocFreq(1)
      .setInputCol("features").setOutputCol("w")
      .fit(df).idf.toArray
    ourIdf.zip(theirIdf).foreach { case (a, b) => assert(math.abs(a - b) < 1e-12, s"$a vs $b") }
  }

  test("LinearSVC predictions agree with spark.ml on separable data") {
    import spark.implicits._
    val df = blobs(400, 29).toDF("features", "label").cache()
    val ours = new graft.classification.LinearSVC()
      .setMaxIter(150).setLearningRate(0.2).setGlobalBatchSize(400)
      .fit(df).transform(df).head
      .select(col("prediction").cast("double").as("p_ours"), col("features"))
    val theirs = new org.apache.spark.ml.classification.LinearSVC()
      .setMaxIter(50).fit(df).transform(df)
      .select(col("prediction").as("p_sparkml"), col("features"))
    val joined = ours.join(theirs, "features")
    val n = joined.count().toDouble
    val agree = joined.where(col("p_ours") === col("p_sparkml")).count().toDouble
    assert(agree / n >= 0.97, s"agreement ${agree / n}")
  }

  test("KMeans finds the same partition as spark.ml on well-separated blobs") {
    import spark.implicits._
    val rnd = new scala.util.Random(17)
    val centers = Seq((0.0, 0.0), (10.0, 0.0), (0.0, 10.0))
    val rows = (0 until 300).map { i =>
      val (cx, cy) = centers(i % 3)
      Tuple1(Vectors.dense(cx + rnd.nextGaussian() * 0.5,
        cy + rnd.nextGaussian() * 0.5): Vector)
    }
    val df = rows.toDF("features").cache()
    val ours = new graft.clustering.KMeans().setK(3).setMaxIterK(20).setSeed(42L)
      .fit(df).transform(df).head
      .select(col("features"), col("prediction").cast("int").as("c_ours"))
    val theirs = new org.apache.spark.ml.clustering.KMeans().setK(3).setSeed(1L)
      .fit(df).transform(df)
      .select(col("features"), col("prediction").as("c_sparkml"))
    // cluster ids are arbitrary — require a 1:1 mapping between the two
    // labelings (both must recover the ground-truth blobs exactly)
    val pairs = ours.join(theirs, "features")
      .groupBy("c_ours", "c_sparkml").count().collect()
    assert(pairs.length == 3, s"partitions disagree: ${pairs.toSeq}")
    assert(pairs.map(_.getInt(0)).distinct.length == 3)
    assert(pairs.map(_.getInt(1)).distinct.length == 3)
  }
}
