package graft.streaming

import org.apache.spark.ml.linalg.{Vector, Vectors}
import org.apache.spark.sql.functions._
import graft.SparkSpec

class OnlinePCASpec extends SparkSpec {

  private val eps = 1e-9

  /** 40 rows, 3 dims, ts = row index: correlated data so the
    * components are non-trivial. */
  private def input = {
    import spark.implicits._
    (0 until 40).map { i =>
      val x = i * 0.5 + (i % 7) * 0.3
      val y = 2.0 * x + (i % 5) * 0.9
      val z = -x + (i % 3) * 1.7
      (i.toLong, Vectors.dense(x, y, z): Vector)
    }.toDF("ts", "vec")
  }

  private def sqNorm(v: Vector): Double = v.toArray.map(a => a * a).sum

  test("global window matches batch PCA exactly") {
    val online = new OnlinePCA().setInputCol("vec").setK(3)
      .setWindows(GlobalWindows).fit(input)
    val batch = new graft.feature.PCA().setInputCol("vec").setK(3).fit(input)

    val or = online.getModelData.head.orderBy(col("version").desc).head()
    val br = batch.getModelData.head.head()
    val oEv = or.getAs[scala.collection.Seq[Double]]("eigenvalues")
    val bEv = br.getAs[scala.collection.Seq[Double]]("eigenvalues")
    oEv.zip(bEv).foreach { case (a, b) => assert(math.abs(a - b) < 1e-8) }
    val oC = or.getAs[scala.collection.Seq[Double]]("components")
    val bC = br.getAs[scala.collection.Seq[Double]]("components")
    oC.zip(bC).foreach { case (a, b) => assert(math.abs(a - b) < 1e-8) }
    assert(or.getAs[Long]("count") == 40L)
  }

  test("event-time windows emit cumulative versions; full rank preserves centered norms") {
    val model = new OnlinePCA().setInputCol("vec").setK(3).setTimeCol("ts")
      .setWindows(EventTimeTumblingWindows(10)).fit(input)
      .setOutputCol("proj")
    val versions = model.getModelData.head.orderBy("version").collect()
    assert(versions.length == 4)
    assert(versions.map(_.getAs[Long]("count")).toSeq == Seq(10L, 20L, 30L, 40L))
    assert(versions.map(_.getAs[Long]("windowEndMs")).toSeq == Seq(10L, 20L, 30L, 40L))

    // latest scoring: proj norm == centered norm under the LATEST mean
    val latestMean = versions.last.getAs[scala.collection.Seq[Double]]("mean").toArray
    val out = model.transform(input).head.collect()
    out.foreach { r =>
      val v = r.getAs[Vector]("vec").toArray
      val centered = v.zip(latestMean).map { case (a, m) => (a - m) * (a - m) }.sum
      assert(math.abs(sqNorm(r.getAs[Vector]("proj")) - centered) < 1e-8)
      assert(r.getAs[Long]("version") == 3L)
    }
  }

  test("versioned as-of scoring picks the earliest qualifying version") {
    val model = new OnlinePCA().setInputCol("vec").setK(3).setTimeCol("ts")
      .setWindows(EventTimeTumblingWindows(10)).fit(input)
      .setOutputCol("proj").setMaxAllowedModelDelayMs(0L)
    // row ts=5: earliest windowEnd >= 5 is 10 → version 0
    // row ts=10: windowEnd 10 >= 10 → version 0 (as-of: trained on 0..9)
    // row ts=11: earliest windowEnd >= 11 is 20 → version 1
    val rows = model.transform(input).head.select("ts", "version").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(rows(5L) == 0L && rows(10L) == 0L && rows(11L) == 1L && rows(39L) == 3L)

    // per-version norm preservation: each row's proj norm equals its
    // centered norm under ITS version's mean
    val means = model.getModelData.head.orderBy("version").collect()
      .map(_.getAs[scala.collection.Seq[Double]]("mean").toArray)
    model.transform(input).head.collect().foreach { r =>
      val mu = means(r.getAs[Long]("version").toInt)
      val v = r.getAs[Vector]("vec").toArray
      val centered = v.zip(mu).map { case (a, m) => (a - m) * (a - m) }.sum
      assert(math.abs(sqNorm(r.getAs[Vector]("proj")) - centered) < 1e-8)
    }
  }

  test("versioned scoring: too-early rows get null and version -1") {
    import spark.implicits._
    // delay makes windowEnd >= ts - delay fail for a far-future row
    val model = new OnlinePCA().setInputCol("vec").setK(2).setTimeCol("ts")
      .setWindows(EventTimeTumblingWindows(10)).fit(input)
      .setOutputCol("proj").setMaxAllowedModelDelayMs(0L)
    val future = Seq((1000L, Vectors.dense(1.0, 2.0, 3.0): Vector)).toDF("ts", "vec")
    val r = model.transform(future).head.select("proj", "version").head()
    assert(r.isNullAt(0) && r.getLong(1) == -1L)
  }

  test("update() folds a batch exactly like refitting on the union") {
    import spark.implicits._
    val first = input.where(col("ts") < 20)
    val second = input.where(col("ts") >= 20)
    val m0 = new OnlinePCA().setInputCol("vec").setK(3)
      .setWindows(GlobalWindows).fit(first)
    val m1 = m0.update(second, windowEndMs = 40L)
    val refit = new OnlinePCA().setInputCol("vec").setK(3)
      .setWindows(GlobalWindows).fit(input)

    val a = m1.getModelData.head.orderBy(col("version").desc).head()
    val b = refit.getModelData.head.head()
    assert(a.getAs[Long]("count") == 40L)
    assert(a.getAs[Long]("version") == 1L)
    a.getAs[scala.collection.Seq[Double]]("eigenvalues")
      .zip(b.getAs[scala.collection.Seq[Double]]("eigenvalues"))
      .foreach { case (x, y) => assert(math.abs(x - y) < 1e-8) }
    a.getAs[scala.collection.Seq[Double]]("components")
      .zip(b.getAs[scala.collection.Seq[Double]]("components"))
      .foreach { case (x, y) => assert(math.abs(x - y) < 1e-8) }
    // receiver unchanged (update is functional)
    assert(m0.getModelData.head.count() == 1L)
  }

  test("update() resumes exactly from persisted model data (sum/gram round trip)") {
    import spark.implicits._
    val first = input.where(col("ts") < 20)
    val second = input.where(col("ts") >= 20)
    val fitted = new OnlinePCA().setInputCol("vec").setK(3)
      .setWindows(GlobalWindows).fit(first)
    // simulate a load: fresh model object, only the persisted rows
    val loaded = new OnlinePCAModel().setModelData(fitted.getModelData.head)
      .set(fitted.k, 3).setInputCol("vec").setOutputCol("proj")
    val resumed = loaded.update(second, windowEndMs = 40L)
    val direct = fitted.update(second, windowEndMs = 40L)
    val a = resumed.getModelData.head.orderBy(col("version").desc).head()
    val b = direct.getModelData.head.orderBy(col("version").desc).head()
    a.getAs[scala.collection.Seq[Double]]("eigenvalues")
      .zip(b.getAs[scala.collection.Seq[Double]]("eigenvalues"))
      .foreach { case (x, y) => assert(math.abs(x - y) < eps) }
  }

  test("update() on a fresh model starts the version stream") {
    import spark.implicits._
    val m = new OnlinePCAModel().setInputCol("vec").setOutputCol("proj")
    val m1 = m.set(m.k, 3).update(input)
    val row = m1.getModelData.head.head()
    assert(row.getAs[Long]("version") == 0L && row.getAs[Long]("count") == 40L)
  }

  test("whiten matches batch PCA's whitened projection") {
    val online = new OnlinePCA().setInputCol("vec").setK(3).setWhiten(true)
      .setWindows(GlobalWindows).fit(input).setOutputCol("proj")
    val batch = new graft.feature.PCA().setInputCol("vec").setK(3)
      .setWhiten(true).fit(input).setOutputCol("proj")
    val a = online.transform(input).head.select("ts", "proj").collect()
      .map(r => r.getLong(0) -> r.getAs[Vector](1).toArray).toMap
    val b = batch.transform(input).head.select("ts", "proj").collect()
      .map(r => r.getLong(0) -> r.getAs[Vector](1).toArray).toMap
    a.foreach { case (ts, v) =>
      v.zip(b(ts)).foreach { case (x, y) => assert(math.abs(x - y) < 1e-8, s"ts=$ts") }
    }
  }

  test("k truncation and explainedVariance ordering") {
    val model = new OnlinePCA().setInputCol("vec").setK(2)
      .setWindows(GlobalWindows).fit(input).setOutputCol("proj")
    val ev = model.explainedVariance
    assert(ev.length == 2 && ev(0) >= ev(1))
    val out = model.transform(input).head.select("proj").head().getAs[Vector](0)
    assert(out.size == 2)
    // count windows path sanity: 40 rows / size 15 → 2 full windows
    val cw = new OnlinePCA().setInputCol("vec").setK(2)
      .setWindows(CountTumblingWindows(15)).fit(input)
    val counts = cw.getModelData.head.orderBy("version").collect()
      .map(_.getAs[Long]("count")).toSeq
    assert(counts == Seq(15L, 30L))
  }
}
