package graft.functions

import org.apache.spark.ml.linalg.{DenseVector, Vector, Vectors}
import org.apache.spark.sql.functions.col
import graft.SparkSpec

/**
 * Reference fixtures for the SQL-callable conversion functions, ported
 * from FunctionsTest.java:52-135 — vectorToArray over dense, sparse and
 * mixed vector columns always yields the dense double array;
 * arrayToVector accepts double, float, int and long element types and
 * yields dense vectors; both are callable by name from SQL.
 */
class FunctionsFixtureSpec extends SparkSpec {

  private val expectedArrays = Seq(Seq(0.0, 0.0), Seq(0.0, 1.0))
  private val expectedVectors = Seq(Vectors.dense(0.0, 0.0), Vectors.dense(0.0, 1.0))

  private def checkToArray(vectors: Seq[Vector]): Unit = {
    import spark.implicits._
    val out = vectors.map(Tuple1(_)).toDF("vector")
      .select(Functions.vectorToArray(col("vector")).as("array"))
      .collect().map(_.getSeq[Double](0).toSeq).toSeq
    assert(out == expectedArrays, s"$out")
  }

  test("vectorToArray on dense, sparse and mixed vector columns") {
    checkToArray(Seq(Vectors.dense(0.0, 0.0), Vectors.dense(0.0, 1.0)))
    checkToArray(Seq(
      Vectors.sparse(2, Array.empty[Int], Array.empty[Double]),
      Vectors.sparse(2, Array(1), Array(1.0))))
    checkToArray(Seq(Vectors.dense(0.0, 0.0), Vectors.sparse(2, Array(1), Array(1.0))))
  }

  test("arrayToVector on double, float, int and long element types") {
    import spark.implicits._
    def check(df: org.apache.spark.sql.DataFrame): Unit = {
      val out = df.select(Functions.arrayToVector(col("array")).as("vector"))
        .collect().map(_.getAs[Vector](0)).toSeq
      assert(out == expectedVectors, s"$out")
      out.foreach(v => assert(v.isInstanceOf[DenseVector]))
    }
    check(Seq(Seq(0.0, 0.0), Seq(0.0, 1.0)).toDF("array"))
    check(Seq(Seq(0.0f, 0.0f), Seq(0.0f, 1.0f)).toDF("array"))
    check(Seq(Seq(0, 0), Seq(0, 1)).toDF("array"))
    check(Seq(Seq(0L, 0L), Seq(0L, 1L)).toDF("array"))
  }

  test("both functions callable by name from SQL after register()") {
    Functions.register(spark)
    import spark.implicits._
    Seq(Seq(1.0, 2.0)).toDF("a").createOrReplaceTempView("funcs_fixture_in")
    val roundTrip = spark.sql(
      "SELECT vectorToArray(arrayToVector(a)) AS out FROM funcs_fixture_in")
      .head().getSeq[Double](0).toSeq
    assert(roundTrip == Seq(1.0, 2.0))
  }
}
