package graft.feature

import org.apache.spark.ml.linalg.{Vector, Vectors}
import graft.SparkSpec

/**
 * The reference's KBinsDiscretizer fixture matrix
 * (feature/KBinsDiscretizerTest.java:62-120): three columns per row —
 * a normal column, a CONSTANT column, and a numDistinct < numBins
 * column — through all three strategies at numBins=3, plus the
 * zero-width-bin quantile case at numBins=10 (:288-303) and the
 * empty-train error (:273-286).
 */
class KBinsMatrixSpec extends SparkSpec {

  private def vec(a: Double, b: Double, c: Double) = Vectors.dense(a, b, c)

  private def train = {
    import spark.implicits._
    Seq(vec(1, 10, 0), vec(1, 10, 0), vec(1, 10, 0), vec(4, 10, 0), vec(5, 10, 0),
      vec(6, 10, 0), vec(7, 10, 0), vec(10, 10, 0), vec(13, 10, 3))
      .map(Tuple1(_)).toDF("features")
  }
  private def test_ = {
    import spark.implicits._
    Seq(vec(-1, 0, 0), vec(1, 1, 1), vec(1.5, 1, 2), vec(5, 2, 3), vec(7.25, 3, 4),
      vec(13, 4, 5), vec(15, 4, 6))
      .map(Tuple1(_)).toDF("features")
  }

  private def run(strategy: String, bins: Int): Seq[Seq[Double]] = {
    val model = new KBinsDiscretizer().setStrategy(strategy).setNumBins(bins)
      .setInputCol("features").setOutputCol("bins").fit(train)
    model.transform(test_).head.select("bins").collect()
      .map(_.getAs[Vector](0).toArray.toSeq).toSeq
  }

  test("uniform strategy matches the reference fixture (constant + sparse-distinct cols)") {
    assert(run("uniform", 3) == Seq(
      Seq(0.0, 0.0, 0.0), Seq(0.0, 0.0, 1.0), Seq(0.0, 0.0, 2.0), Seq(1.0, 0.0, 2.0),
      Seq(1.0, 0.0, 2.0), Seq(2.0, 0.0, 2.0), Seq(2.0, 0.0, 2.0)))
  }

  test("quantile strategy matches the reference fixture (duplicate edges preserved)") {
    assert(run("quantile", 3) == Seq(
      Seq(0.0, 0.0, 0.0), Seq(0.0, 0.0, 0.0), Seq(0.0, 0.0, 1.0), Seq(1.0, 0.0, 1.0),
      Seq(2.0, 0.0, 1.0), Seq(2.0, 0.0, 1.0), Seq(2.0, 0.0, 1.0)))
  }

  test("kmeans strategy matches the reference fixture (uniform fallback on <= k distinct)") {
    assert(run("kmeans", 3) == Seq(
      Seq(0.0, 0.0, 0.0), Seq(0.0, 0.0, 1.0), Seq(0.0, 0.0, 2.0), Seq(1.0, 0.0, 2.0),
      Seq(1.0, 0.0, 2.0), Seq(2.0, 0.0, 2.0), Seq(2.0, 0.0, 2.0)))
  }

  test("quantile zero-width bins split instead of collapsing (reference numBins=10)") {
    // train col0 [1,1,1,4,...] at 10 bins: tempEdges keep TWO 1s, the
    // right copy becomes (1+4)/2 — reference testBinsWithWidthAsZero
    assert(run("quantile", 10).map(_.head) == Seq(0.0, 0.0, 0.0, 3.0, 5.0, 6.0, 6.0))
  }

  test("fit on empty data fails with the reference message") {
    val e = intercept[IllegalArgumentException] {
      new KBinsDiscretizer().setStrategy("quantile").setInputCol("features")
        .setOutputCol("bins").fit(train.limit(0))
    }
    assert(e.getMessage.contains("The training set is empty."), e.getMessage)
  }
}
