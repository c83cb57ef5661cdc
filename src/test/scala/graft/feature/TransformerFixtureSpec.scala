package graft.feature

import org.apache.spark.ml.linalg.{Vector, Vectors}
import graft.SparkSpec

/**
 * Reference fixtures for the simple transformers: Binarizer
 * (feature/BinarizerTest.java:51-76 + :143 custom thresholds — the
 * numeric/dense/sparse tri-column fixture) and NGram
 * (feature/NGramTest.java:47-64 — shorter-than-n inputs).
 */
class TransformerFixtureSpec extends SparkSpec {

  test("Binarizer tri-column fixture: numeric, dense, and sparse with custom thresholds") {
    import spark.implicits._
    val df = Seq(
      (1.0, Vectors.dense(1.0, 2.0),
        Vectors.sparse(17, Array(0, 3, 9), Array(1.0, 2.0, 7.0)): Vector),
      (2.0, Vectors.dense(2.0, 1.0),
        Vectors.sparse(17, Array(0, 2, 14), Array(5.0, 4.0, 1.0)): Vector),
      (3.0, Vectors.dense(5.0, 18.0),
        Vectors.sparse(17, Array(0, 11, 12), Array(2.0, 4.0, 4.0)): Vector))
      .toDF("f0", "f1", "f2")
    val out = new Binarizer()
      .setInputCols("f0", "f1", "f2").setOutputCols("o0", "o1", "o2")
      .setThresholds(1.0, 1.5, 2.5)
      .transform(df).head
      .select("o0", "o1", "o2").collect()
    assert(out.map(_.getDouble(0)).toSeq == Seq(0.0, 1.0, 1.0))
    assert(out.map(_.getAs[Vector](1)).toSeq == Seq(
      Vectors.dense(0.0, 1.0), Vectors.dense(1.0, 0.0), Vectors.dense(1.0, 1.0)))
    // sparse keeps ONLY above-threshold entries as 1.0 (no explicit zeros)
    assert(out.map(_.getAs[Vector](2)).toSeq == Seq(
      Vectors.sparse(17, Array(9), Array(1.0)),
      Vectors.sparse(17, Array(0, 2), Array(1.0, 1.0)),
      Vectors.sparse(17, Array(11, 12), Array(1.0, 1.0))))
  }

  test("NGram on inputs shorter than n yields empty arrays (reference fixture)") {
    import spark.implicits._
    val df = Seq(Seq.empty[String], Seq("a", "b", "c"), Seq("a", "b", "c", "d"))
      .map(Tuple1(_)).toDF("input")
    val got = new NGram().setInputCol("input").setOutputCol("output").setN(2)
      .transform(df).head.select("output").collect()
      .map(_.getSeq[String](0)).sortBy(_.length)
    assert(got.toSeq == Seq(Seq.empty, Seq("a b", "b c"), Seq("a b", "b c", "c d")))
  }
}
