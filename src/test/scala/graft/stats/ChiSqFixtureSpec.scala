package graft.stats

import org.apache.spark.ml.linalg.{Vector, Vectors}
import graft.SparkSpec

/**
 * The reference's ChiSqTest fixture (stats/ChiSqTestTest.java:54-81):
 * 13 (label, dense-2) samples with known p-values, degrees of
 * freedom, and χ² statistics, in both flattened and nested output
 * shapes.
 */
class ChiSqFixtureSpec extends SparkSpec {

  private def samples = {
    import spark.implicits._
    Seq(
      (0.0, Vectors.dense(5, 1.0)), (2.0, Vectors.dense(6, 2.0)),
      (1.0, Vectors.dense(7, 2.0)), (1.0, Vectors.dense(5, 4.0)),
      (0.0, Vectors.dense(5, 1.0)), (2.0, Vectors.dense(6, 2.0)),
      (1.0, Vectors.dense(7, 2.0)), (1.0, Vectors.dense(5, 4.0)),
      (2.0, Vectors.dense(5, 1.0)), (0.0, Vectors.dense(5, 2.0)),
      (0.0, Vectors.dense(5, 2.0)), (1.0, Vectors.dense(9, 4.0)),
      (1.0, Vectors.dense(9, 3.0))).toDF("label", "features")
  }

  test("flattened rows match the reference p-values, dof, and statistics") {
    val got = new ChiSqTest().setFlatten(true)
      .transform(samples).head
      .collect().map(r => r.getInt(0) -> (r.getDouble(1), r.getLong(2), r.getDouble(3))).toMap
    assert(got.keySet == Set(0, 1))
    val (p0, d0, s0) = got(0)
    val (p1, d1, s1) = got(1)
    assert(math.abs(p0 - 0.03419350755) < 1e-9 && d0 == 6L &&
      math.abs(s0 - 13.61904761905) < 1e-9, got(0).toString)
    assert(math.abs(p1 - 0.24220177737) < 1e-9 && d1 == 6L &&
      math.abs(s1 - 7.94444444444) < 1e-9, got(1).toString)
  }

  test("nested row matches the reference vectors") {
    val r = new ChiSqTest().transform(samples).head.head()
    val p = r.getAs[Vector]("pValues")
    val s = r.getAs[Vector]("statistics")
    assert(math.abs(p(0) - 0.03419350755) < 1e-9 && math.abs(p(1) - 0.24220177737) < 1e-9)
    assert(math.abs(s(0) - 13.61904761905) < 1e-9 && math.abs(s(1) - 7.94444444444) < 1e-9)
  }
}
