package graft.common.util

import org.apache.spark.sql.catalyst.util.QuantileSummaries
import org.scalatest.funsuite.AnyFunSuite

/**
 * The reference carries its own Greenwald-Khanna sketch
 * (common/util/QuantileSummary.java:30-33); we substitute Spark's
 * catalyst QuantileSummaries (same algorithm) in RobustScaler and
 * KBinsDiscretizer. This spec re-runs the reference's rank-error
 * contract (common/util/QuantileSummaryTest.java:58-89,112-156) against
 * the substitute: every queried percentile must land within the
 * epsilon-rank window over the reference's three datasets, under
 * insert-only, insert+compress, and cross-epsilon merge.
 */
class QuantileSummarySpec extends AnyFunSuite {

  private val percentiles = Seq(0.0, 0.01, 0.1, 0.25, 0.75, 0.5, 0.9, 0.99, 1.0)

  private def datasets: Seq[Array[Double]] = Seq(
    (0 until 100).map(_.toDouble).toArray,
    (0 until 100).map(x => (99 - x).toDouble).toArray,
    (-100 until 0).map(_.toDouble).toArray)

  private def build(data: Array[Double], epsilon: Double): QuantileSummaries = {
    var s = new QuantileSummaries(
      QuantileSummaries.defaultCompressThreshold, epsilon,
      Array.empty[QuantileSummaries.Stats], 0L, false)
    data.foreach(x => s = s.insert(x))
    s.compress()
  }

  /** QuantileSummaryTest.java:71-89 — approx rank within the epsilon window. */
  private def validate(approx: Double, data: Array[Double], percentile: Double,
      epsilon: Double): Unit = {
    val rank = math.ceil(
      (data.count(_ <= approx) + data.count(_ < approx)) / 2.0)
    val lower = math.floor((percentile - epsilon) * data.length)
    val upper =
      if (epsilon == 0) math.ceil((percentile + epsilon) * data.length) + 1
      else math.ceil((percentile + epsilon) * data.length)
    assert(rank >= lower && rank <= upper,
      s"rank $rank not in [$lower, $upper], percentile $percentile, approx $approx")
  }

  test("quantiles within epsilon=0.001 rank error on all three datasets") {
    datasets.foreach { data =>
      val s = build(data, 0.001)
      percentiles.foreach { p =>
        validate(s.query(p).get, data, p, 0.001)
      }
    }
  }

  test("epsilon=0 answers exactly") {
    datasets.foreach { data =>
      val s = build(data, 0.0)
      percentiles.foreach(p => validate(s.query(p).get, data, p, 0.0))
    }
  }

  test("empty sketch returns no answer") {
    val s = build(Array.empty[Double], 0.001)
    assert(s.query(0.5).isEmpty)
  }

  test("merge across datasets and epsilons keeps the looser bound") {
    // QuantileSummaryTest.java:141-156 shape: merged sketches answer
    // within the larger epsilon over the concatenation
    val cases = Seq(
      ((0 until 100).map(_.toDouble).toArray, 0.001,
        (100 until 200).map(_.toDouble).toArray, 0.001),
      ((0 until 1000).map(_.toDouble).toArray, 0.001,
        (-50 until 50).map(_.toDouble).toArray, 0.01))
    cases.foreach { case (d1, e1, d2, e2) =>
      val merged = build(d2, e2).compress().merge(build(d1, e1).compress())
      val all = d1 ++ d2
      val eps = math.max(e1, e2)
      percentiles.foreach(p => validate(merged.query(p).get, all, p, eps))
    }
  }
}
