package graft.evaluation

import org.apache.spark.ml.linalg.Vectors
import org.apache.spark.sql.DataFrame
import graft.SparkSpec

/**
 * The reference's BinaryClassificationEvaluator fixture matrix
 * (evaluation/BinaryClassificationEvaluatorTest.java:55-118 fixtures
 * and expected values; :169-190 metric/column ordering; :255-283 tied
 * scores; :296-316 weighted) — tied raw scores and weights are the
 * numerically delicate corners of the prefix-walk AUC computation.
 */
class EvaluatorMatrixSpec extends SparkSpec {

  private val Eps = 1e-5

  private def baseRows = Seq(
    (1.0, 0.9), (1.0, 0.8), (1.0, 0.7), (0.0, 0.75), (0.0, 0.6), (1.0, 0.65),
    (0.0, 0.4), (0.0, 0.3), (1.0, 0.35), (0.0, 0.2), (1.0, 0.1))

  private def vecDf(rows: Seq[(Double, Double)]): DataFrame = {
    import spark.implicits._
    rows.map { case (l, p) => (l, Vectors.dense(1 - p, p)) }.toDF("label", "rawPrediction")
  }

  private def evalMetrics(df: DataFrame, metrics: String*): Seq[Double] = {
    val out = new BinaryClassificationEvaluator().setMetricsNames(metrics: _*)
      .transform(df).head
    assert(out.columns.toSeq == metrics, out.columns.toSeq)
    val r = out.head()
    metrics.indices.map(r.getDouble)
  }

  test("areaUnderPR / KS / areaUnderROC match the reference fixture in requested order") {
    // INPUT_DATA: 12 rows (the 11 above plus the leading (1.0, 0.9) trio
    // collapses to the reference's exact list)
    val rows = Seq((1.0, 0.9), (1.0, 0.8), (1.0, 0.7), (0.0, 0.75), (0.0, 0.6),
      (1.0, 0.65), (1.0, 0.55), (0.0, 0.4), (0.0, 0.3), (1.0, 0.35), (0.0, 0.2), (1.0, 0.1))
    val got = evalMetrics(vecDf(rows), "areaUnderPR", "ks", "areaUnderROC")
    val expected = Seq(0.7691481137909708, 0.3714285714285714, 0.6571428571428571)
    got.zip(expected).foreach { case (g, e) => assert(math.abs(g - e) < Eps, s"$got") }
  }

  test("tied raw scores: ROC/PR/KS/Lorenz match the reference multi-score fixture") {
    val rows = Seq((1.0, 0.9), (1.0, 0.9), (1.0, 0.9), (0.0, 0.75), (0.0, 0.6),
      (1.0, 0.9), (1.0, 0.9), (0.0, 0.4), (0.0, 0.3), (1.0, 0.9), (0.0, 0.2), (1.0, 0.1))
    val got = evalMetrics(vecDf(rows), "areaUnderROC", "areaUnderPR", "ks", "areaUnderLorenz")
    val expected = Seq(0.8571428571428571, 0.9377705627705628, 0.8571428571428571,
      0.6488095238095237)
    got.zip(expected).foreach { case (g, e) => assert(math.abs(g - e) < Eps, s"$got") }
  }

  test("weights scale every prefix sum (reference weighted fixture)") {
    import spark.implicits._
    val rows = Seq(
      (1.0, 0.9, 0.8), (1.0, 0.9, 0.7), (1.0, 0.9, 0.5), (0.0, 0.75, 1.2),
      (0.0, 0.6, 1.3), (1.0, 0.9, 1.5), (1.0, 0.9, 1.4), (0.0, 0.4, 0.3),
      (0.0, 0.3, 0.5), (1.0, 0.9, 1.9), (0.0, 0.2, 1.2), (1.0, 0.1, 1.0))
    val df = rows.map { case (l, p, w) => (l, Vectors.dense(1 - p, p), w) }
      .toDF("label", "rawPrediction", "weight")
    val out = new BinaryClassificationEvaluator()
      .setMetricsNames("areaUnderROC", "areaUnderPR").setWeightCol("weight")
      .transform(df).head.head()
    val expected = Seq(0.8717948717948718, 0.9510202726261435)
    expected.zipWithIndex.foreach { case (e, i) =>
      assert(math.abs(out.getDouble(i) - e) < Eps, out.toSeq)
    }
  }

  test("a perfectly separable two-row input scores 1.0 on every metric") {
    val df = vecDf(Seq((1.0, 0.9), (0.0, 0.1)))
    val got = evalMetrics(df, "areaUnderPR", "ks", "areaUnderROC")
    assert(got.forall(v => math.abs(v - 1.0) < Eps), got)
  }

  test("double raw-prediction column is accepted directly") {
    import spark.implicits._
    val rows = Seq((1, 0.9), (1, 0.8), (1, 0.7), (0, 0.75), (0, 0.6), (1, 0.65),
      (1, 0.55), (0, 0.4), (0, 0.3), (1, 0.35), (0, 0.2), (1, 0.1))
    val df = rows.toDF("label", "rawPrediction")
    val got = evalMetrics(df, "areaUnderPR", "ks", "areaUnderROC")
    val expected = Seq(0.7691481137909708, 0.3714285714285714, 0.6571428571428571)
    got.zip(expected).foreach { case (g, e) => assert(math.abs(g - e) < Eps, s"$got") }
  }
}
