package graft.feature

import org.apache.spark.ml.linalg.{SparseVector, Vector, Vectors}
import graft.SparkSpec

/**
 * Reference fixtures for Normalizer (feature/NormalizerTest.java:51-90
 * p=1.5 dense + sparse expected values, :158-167 invalid p) and
 * SQLTransformer (feature/SQLTransformerTest.java:49-72 expected
 * outputs, :99-110 invalid statement, :146-186 group-by and tumbling
 * window aggregation).
 */
class NormalizerSqlFixtureSpec extends SparkSpec {
  import org.apache.spark.sql.functions._

  private val eps = 1e-7

  test("Normalizer p=1.5 dense fixture") {
    import spark.implicits._
    val df = Seq(
      Vectors.dense(2.1, 3.1, 2.3, 3.4, 5.3, 5.1),
      Vectors.dense(2.3, 4.1, 1.3, 2.4, 5.1, 4.1)).map(Tuple1(_)).toDF("denseVec")
    val out = new Normalizer().setInputCol("denseVec").setOutputCol("outputVec").setP(1.5)
      .transform(df).head.select("outputVec").collect().map(_.getAs[Vector](0))
    val expected = Seq(
      Array(0.17386300895299714, 0.25665491797823387, 0.19042139075804446,
        0.28149249068580484, 0.43879711783375464, 0.42223873602870726),
      Array(0.20785190042726007, 0.3705186051094636, 0.11748150893714701,
        0.2168889395762714, 0.4608889965995767, 0.3705186051094636))
    out.zip(expected).foreach { case (v, e) =>
      v.toArray.zip(e).foreach { case (a, b) => assert(math.abs(a - b) < eps, s"$a vs $b") }
    }
  }

  test("Normalizer p=1.5 sparse fixture keeps sparsity") {
    import spark.implicits._
    val df = Seq(
      Vectors.sparse(5, Array(1, 3, 4), Array(0.1, 0.2, 0.3)),
      Vectors.sparse(5, Array(1, 2, 4), Array(0.1, 0.2, 0.3))).map(Tuple1(_)).toDF("sparseVec")
    val out = new Normalizer().setInputCol("sparseVec").setOutputCol("outputVec").setP(1.5)
      .transform(df).head.select("outputVec").collect().map(_.getAs[Vector](0))
    val expectedVals = Array(0.23070057753660791, 0.46140115507321583, 0.6921017326098237)
    assert(out.forall(_.isInstanceOf[SparseVector]))
    assert(out(0).asInstanceOf[SparseVector].indices.toSeq == Seq(1, 3, 4))
    assert(out(1).asInstanceOf[SparseVector].indices.toSeq == Seq(1, 2, 4))
    out.foreach { v =>
      v.asInstanceOf[SparseVector].values.zip(expectedVals).foreach { case (a, b) =>
        assert(math.abs(a - b) < eps, s"$a vs $b")
      }
    }
  }

  test("Normalizer rejects p < 1 with the reference message") {
    val e = intercept[IllegalArgumentException] { new Normalizer().setP(0.5) }
    assert(e.getMessage.contains("Parameter p is given an invalid value 0.5"))
  }

  // --- SQLTransformer -------------------------------------------------

  private def sqlInput = {
    import spark.implicits._
    Seq((0, 1.0, 3.0), (1, 2.0, 3.0), (2, 2.0, 2.0), (3, 4.0, 2.0)).toDF("id", "v1", "v2")
  }

  test("SQLTransformer numeric expressions fixture") {
    val out = new SQLTransformer()
      .setStatement("SELECT *, (v1 + v2) AS v3, (v1 * v2) AS v4 FROM __THIS__")
      .transform(sqlInput).head
    assert(out.columns.toSeq == Seq("id", "v1", "v2", "v3", "v4"))
    val rows = out.collect().map(r =>
      (r.getInt(0), r.getDouble(1), r.getDouble(2), r.getDouble(3), r.getDouble(4))).toSet
    assert(rows == Set(
      (0, 1.0, 3.0, 4.0, 3.0), (1, 2.0, 3.0, 5.0, 6.0),
      (2, 2.0, 2.0, 4.0, 4.0), (3, 4.0, 2.0, 6.0, 8.0)))
  }

  test("SQLTransformer built-in function fixture (SQRT)") {
    val rows = new SQLTransformer().setStatement("SELECT *, SQRT(v1) AS v3 FROM __THIS__")
      .transform(sqlInput).head.collect()
      .map(r => (r.getInt(0), r.getDouble(3))).toMap
    val expected = Map(0 -> 1.0, 1 -> math.sqrt(2.0), 2 -> math.sqrt(2.0), 3 -> 2.0)
    expected.foreach { case (k, v) => assert(math.abs(rows(k) - v) < eps) }
  }

  test("SQLTransformer group-by aggregation fixture") {
    val rows = new SQLTransformer()
      .setStatement("SELECT v2, SUM(v1) AS v3 FROM __THIS__ GROUP BY v2")
      .transform(sqlInput).head.collect()
      .map(r => (r.getDouble(0), r.getDouble(1))).toSet
    assert(rows == Set((3.0, 3.0), (2.0, 6.0)))
  }

  test("SQLTransformer tumbling-window aggregation fixture") {
    // SQLTransformerTest.java:158-186 — all four rows land in one
    // 10-minute window; SUM(v1) = 9.0. Spark's window() table function
    // replaces the reference's TUMBLE TVF.
    val withTime = sqlInput.withColumn(
      "time_ltz", org.apache.spark.sql.functions.timestamp_seconds(org.apache.spark.sql.functions.col("id")))
    val rows = new SQLTransformer()
      .setStatement(
        "SELECT SUM(v1) AS v3 FROM __THIS__ GROUP BY window(time_ltz, '10 minutes')")
      .transform(withTime).head.collect().map(_.getDouble(0)).toSeq
    assert(rows == Seq(9.0))
  }

  test("SQLTransformer rejects a statement without __THIS__ (reference message)") {
    val e = intercept[IllegalArgumentException] {
      new SQLTransformer().setStatement("SELECT * FROM __THAT__")
    }
    assert(e.getMessage.contains(
      "Parameter statement is given an invalid value SELECT * FROM __THAT__"))
  }
}
