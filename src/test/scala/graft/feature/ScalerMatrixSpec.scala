package graft.feature

import org.apache.spark.ml.linalg.{Vector, Vectors}
import graft.SparkSpec

/**
 * Reference scaler fixtures: MinMaxScaler (feature/MinMaxScalerTest
 * .java:60-148 — exact outputs, zero-range column maps to the output
 * range midpoint) and RobustScaler (feature/RobustScalerTest.java:
 * 64-315 — default no-centering, centering/scaling combos, zero IQR,
 * NaN pass-through, feature-count mismatch).
 */
class ScalerMatrixSpec extends SparkSpec {

  private def df(rows: Seq[Vector]) = {
    import spark.implicits._
    rows.map(Tuple1(_)).toDF("input")
  }

  private def collectVecs(out: org.apache.spark.sql.DataFrame): Seq[Seq[Double]] =
    out.select("output").collect().map(_.getAs[Vector](0).toArray.toSeq).toSeq

  test("MinMaxScaler maps the reference fixture exactly") {
    val train = df(Seq(Vectors.dense(0.0, 3.0), Vectors.dense(2.1, 0.0),
      Vectors.dense(4.1, 5.1), Vectors.dense(6.1, 8.1), Vectors.dense(200.0, 400.0)))
    val predict = df(Seq(Vectors.dense(150.0, 90.0), Vectors.dense(50.0, 40.0),
      Vectors.dense(100.0, 50.0)))
    val model = new MinMaxScaler().setInputCol("input").setOutputCol("output").fit(train)
    assert(collectVecs(model.transform(predict).head) == Seq(
      Seq(0.75, 0.225), Seq(0.25, 0.1), Seq(0.5, 0.125)))
  }

  test("MinMaxScaler zero-range dimension maps to the output-range midpoint") {
    val train = df(Seq(Vectors.dense(40.0, 80.0)))
    val predict = df(Seq(Vectors.dense(30.0, 50.0)))
    val model = new MinMaxScaler().setInputCol("input").setOutputCol("output")
      .setMin(0.0).setMax(10.0).fit(train)
    assert(collectVecs(model.transform(predict).head) == Seq(Seq(5.0, 5.0)))
  }

  private def robustTrain = df((0 to 8).map(i => Vectors.dense(i.toDouble, -i.toDouble)))
  private def robustPredict = df(Seq(Vectors.dense(3.0, -3.0), Vectors.dense(6.0, -6.0),
    Vectors.dense(99.0, -99.0)))

  test("RobustScaler default (no centering) divides by the IQR") {
    val model = new RobustScaler().setInputCol("input").setOutputCol("output").fit(robustTrain)
    assert(collectVecs(model.transform(robustPredict).head) == Seq(
      Seq(0.75, -0.75), Seq(1.5, -1.5), Seq(24.75, -24.75)))
  }

  test("RobustScaler with centering subtracts the median first") {
    val model = new RobustScaler().setInputCol("input").setOutputCol("output")
      .setWithCentering(true).fit(robustTrain)
    assert(collectVecs(model.transform(robustPredict).head) == Seq(
      Seq(-0.25, 0.25), Seq(0.5, -0.5), Seq(23.75, -23.75)))
  }

  test("RobustScaler centering without scaling subtracts only") {
    val model = new RobustScaler().setInputCol("input").setOutputCol("output")
      .setWithCentering(true).setWithScaling(false).fit(robustTrain)
    assert(collectVecs(model.transform(robustPredict).head) == Seq(
      Seq(-1.0, 1.0), Seq(2.0, -2.0), Seq(95.0, -95.0)))
  }

  test("RobustScaler zero IQR scales to zero, not infinity") {
    val train = df(Seq(Vectors.dense(0.0, 0.0), Vectors.dense(1.0, 1.0),
      Vectors.dense(1.0, 1.0), Vectors.dense(1.0, 1.0), Vectors.dense(4.0, 4.0)))
    val model = new RobustScaler().setInputCol("input").setOutputCol("output").fit(train)
    assert(collectVecs(model.transform(robustPredict).head).forall(_.forall(_ == 0.0)))
  }

  test("MaxAbsScaler dense fixture incl. an all-zero dimension (reference :67-102)") {
    val train = df(Seq(Vectors.dense(0.0, 3.0, 0.0), Vectors.dense(2.1, 0.0, 0.0),
      Vectors.dense(4.1, 5.1, 0.0), Vectors.dense(6.1, 8.1, 0.0),
      Vectors.dense(200.0, -400.0, 0.0)))
    val predict = df(Seq(Vectors.dense(150.0, 90.0, 1.0), Vectors.dense(50.0, 40.0, 1.0),
      Vectors.dense(100.0, 50.0, 0.5)))
    val model = new MaxAbsScaler().setInputCol("input").setOutputCol("output").fit(train)
    assert(collectVecs(model.transform(predict).head) == Seq(
      Seq(0.75, 0.225, 1.0), Seq(0.25, 0.1, 1.0), Seq(0.5, 0.125, 0.5)))
  }

  test("MaxAbsScaler sparse fixture stays sparse (reference :80-110)") {
    val train = df(Seq(
      Vectors.sparse(4, Array(1, 3), Array(4.0, 3.0)),
      Vectors.sparse(4, Array(0, 2), Array(2.0, -6.0)),
      Vectors.sparse(4, Array(1, 2), Array(1.0, 3.0)),
      Vectors.sparse(4, Array(0, 1), Array(2.0, 8.0)),
      Vectors.sparse(4, Array(1, 3), Array(1.0, 5.0))))
    val predict = df(Seq(
      Vectors.sparse(4, Array(0, 1), Array(2.0, 4.0)),
      Vectors.sparse(4, Array(0, 2), Array(1.0, 3.0)),
      Vectors.sparse(4, Array.empty[Int], Array.empty[Double]),
      Vectors.sparse(4, Array(1, 3), Array(1.0, 2.0))))
    val model = new MaxAbsScaler().setInputCol("input").setOutputCol("output").fit(train)
    val got = model.transform(predict).head.select("output").collect().map(_.getAs[Vector](0))
    assert(got.toSeq == Seq(
      Vectors.sparse(4, Array(0, 1), Array(1.0, 0.5)),
      Vectors.sparse(4, Array(0, 2), Array(0.5, 0.5)),
      Vectors.sparse(4, Array.empty[Int], Array.empty[Double]),
      Vectors.sparse(4, Array(1, 3), Array(0.125, 0.4))))
  }

  test("IDF fixture: ln((m+1)/(df+1)) weighting and minDocFreq zeroing (IDFTest :57-67)") {
    val input = df(Seq(Vectors.dense(0.0, 1.0, 0.0, 2.0), Vectors.dense(0.0, 1.0, 2.0, 3.0),
      Vectors.dense(0.0, 1.0, 0.0, 0.0)))
    def run(minDf: Int) = collectVecs(
      new IDF().setMinDocFreq(minDf).setInputCol("input").setOutputCol("output")
        .fit(input).transform(input).head)
    val expected = Seq(
      Seq(0.0, 0.0, 0.0, 0.5753641), Seq(0.0, 0.0, 1.3862943, 0.8630462),
      Seq(0.0, 0.0, 0.0, 0.0))
    run(0).zip(expected).foreach { case (g, e) =>
      g.zip(e).foreach { case (a, b) => assert(math.abs(a - b) < 1e-7, s"$g vs $e") }
    }
    val expected2 = Seq(
      Seq(0.0, 0.0, 0.0, 0.5753641), Seq(0.0, 0.0, 0.0, 0.8630462),
      Seq(0.0, 0.0, 0.0, 0.0))
    run(2).zip(expected2).foreach { case (g, e) =>
      g.zip(e).foreach { case (a, b) => assert(math.abs(a - b) < 1e-7, s"$g vs $e") }
    }
  }

  test("RobustScaler ignores NaN in fit and passes NaN through in transform") {
    val train = df(Seq(Vectors.dense(0.0, Double.NaN), Vectors.dense(Double.NaN, 0.0),
      Vectors.dense(1.0, -1.0), Vectors.dense(2.0, -2.0), Vectors.dense(3.0, -3.0),
      Vectors.dense(4.0, -4.0)))
    val model = new RobustScaler().setInputCol("input").setOutputCol("output").fit(train)
    val got = collectVecs(model.transform(train).head)
    val expected = Seq(
      Seq(0.0, Double.NaN), Seq(Double.NaN, 0.0), Seq(0.5, -0.5),
      Seq(1.0, -1.0), Seq(1.5, -1.5), Seq(2.0, -2.0))
    got.zip(expected).foreach { case (g, e) =>
      g.zip(e).foreach { case (a, b) =>
        assert((a.isNaN && b.isNaN) || math.abs(a - b) < 1e-12, s"$got vs $expected")
      }
    }
  }
}
