package graft.streaming

import org.apache.spark.ml.linalg.{Vector, Vectors}
import graft.SparkSpec

/**
 * Reference fixture for OnlineStandardScaler's cumulative per-window
 * moments, ported from feature/OnlineStandardScalerTest.java:70-97:
 * nine rows across three 3-second event-time windows produce three
 * model versions whose mean/std accumulate over ALL rows seen so far.
 * Our windowEndMs is end-exclusive (3000/9000/12000) where the
 * reference reports end-inclusive (2999/8999/11999); the moments and
 * version numbering are identical.
 */
class OnlineScalerFixtureSpec extends SparkSpec {

  test("three event-time windows emit reference means and stds") {
    import spark.implicits._
    val df = Seq(
      (0L, Vectors.dense(-2.5, 9, 1)), (1000L, Vectors.dense(1.4, -5, 1)),
      (2000L, Vectors.dense(2, -1, -2)), (6000L, Vectors.dense(0.7, 3, 1)),
      (7000L, Vectors.dense(0, 1, 1)), (8000L, Vectors.dense(0.5, 0, -2)),
      (9000L, Vectors.dense(0.4, 1, 1)), (10000L, Vectors.dense(0.3, 2, 1)),
      (11000L, Vectors.dense(0.5, 1, -2))).toDF("ts", "input")

    val model = new OnlineStandardScaler()
      .setInputCol("input").setOutputCol("output")
      .setWindows(EventTimeTumblingWindows(3000L))
      .setTimeCol("ts")
      .fit(df)

    val rows = model.getModelData.head
      .select("version", "windowEndMs", "count", "mean", "std")
      .orderBy("version").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getAs[Vector](3).toArray, r.getAs[Vector](4).toArray))
    assert(rows.length == 3)

    val expected = Seq(
      (0L, 3000L, 3L, Array(0.3, 1.0, 0.0), Array(2.4433583, 7.2111026, 1.7320508)),
      (1L, 9000L, 6L, Array(0.35, 1.1666667, 0.0), Array(1.5630099, 4.6654760, 1.5491933)),
      (2L, 12000L, 9L, Array(0.3666667, 1.2222222, 0.0), Array(1.2369316, 3.7006005, 1.5)))

    rows.zip(expected).foreach { case ((v, end, n, mean, std), (ev, eend, en, emean, estd)) =>
      assert(v == ev && end == eend && n == en, s"version/window/count ($v,$end,$n)")
      mean.zip(emean).foreach { case (a, b) => assert(math.abs(a - b) < 1e-6, s"mean $a vs $b") }
      std.zip(estd).foreach { case (a, b) => assert(math.abs(a - b) < 1e-6, s"std $a vs $b") }
    }
  }
}
