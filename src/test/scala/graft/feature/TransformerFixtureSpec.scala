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

  test("ElementwiseProduct dense + sparse fixtures (explicit zeros preserved)") {
    import spark.implicits._
    val df = Seq(
      (0, Vectors.dense(2.1, 3.1),
        Vectors.sparse(5, Array(3), Array(1.0)): Vector),
      (1, Vectors.dense(1.1, 3.3),
        Vectors.sparse(5, Array(1, 2, 3, 4), Array(1.0, 2.0, 3.0, 4.0)): Vector),
      (2, null, null)).toDF("id", "vec", "sparseVec")
    val dense = new ElementwiseProduct().setInputCol("vec").setOutputCol("out")
      .setScalingVec(Vectors.dense(1.1, 1.1))
      .transform(df).head.orderBy("id").select("out").collect().map(_.getAs[Vector](0))
    assert(dense(0).toArray.zip(Array(2.31, 3.41)).forall { case (a, b) => math.abs(a - b) < 1e-5 })
    assert(dense(1).toArray.zip(Array(1.21, 3.63)).forall { case (a, b) => math.abs(a - b) < 1e-5 })
    assert(dense(2) == null)
    // scaling sparse(5, {0:1.1, 1:1.1}): products at absent scaling
    // indices become EXPLICIT zeros — nnz structure is preserved
    val sparse = new ElementwiseProduct().setInputCol("sparseVec").setOutputCol("out")
      .setScalingVec(Vectors.sparse(5, Array(0, 1), Array(1.1, 1.1)))
      .transform(df).head.orderBy("id").select("out").collect().map(_.getAs[Vector](0))
    assert(sparse(0) == Vectors.sparse(5, Array(3), Array(0.0)))
    val s1 = sparse(1).asInstanceOf[org.apache.spark.ml.linalg.SparseVector]
    assert(s1.indices.toSeq == Seq(1, 2, 3, 4))
    assert(s1.values.zip(Array(1.1, 0.0, 0.0, 0.0)).forall {
      case (a, b) => math.abs(a - b) < 1e-5
    })
  }

  test("Interaction dense and sparse fixtures (row-major outer product, nulls -> null)") {
    import spark.implicits._
    val df = Seq(
      (1.0, Vectors.dense(1.0, 2.0), Vectors.dense(3.0, 4.0),
        Vectors.sparse(17, Array(0, 3, 9), Array(1.0, 2.0, 7.0)): Vector),
      (2.0, Vectors.dense(2.0, 8.0), Vectors.dense(3.0, 4.0, 5.0),
        Vectors.sparse(17, Array(0, 2, 14), Array(5.0, 4.0, 1.0)): Vector))
      .toDF("f0", "f1", "f2", "f3")
    val dense = new Interaction().setInputCols("f0", "f1", "f2").setOutputCol("out")
      .transform(df).head.select("out").collect().map(_.getAs[Vector](0))
    assert(dense(0) == Vectors.dense(3.0, 4.0, 6.0, 8.0))
    assert(dense(1) == Vectors.dense(12.0, 16.0, 20.0, 48.0, 64.0, 80.0))

    val sparse = new Interaction().setInputCols("f0", "f1", "f2", "f3").setOutputCol("out")
      .transform(df).head.select("out").collect().map(_.getAs[Vector](0))
    assert(sparse(0) == Vectors.sparse(68,
      Array(0, 3, 9, 17, 20, 26, 34, 37, 43, 51, 54, 60),
      Array(3.0, 6.0, 21.0, 4.0, 8.0, 28.0, 6.0, 12.0, 42.0, 8.0, 16.0, 56.0)))
    assert(sparse(1) == Vectors.sparse(102,
      Array(0, 2, 14, 17, 19, 31, 34, 36, 48, 51, 53, 65, 68, 70, 82, 85, 87, 99),
      Array(60.0, 48.0, 12.0, 80.0, 64.0, 16.0, 100.0, 80.0, 20.0, 240.0, 192.0,
        48.0, 320.0, 256.0, 64.0, 400.0, 320.0, 80.0)))

    val withNull = Seq((3.0, null.asInstanceOf[Vector], null.asInstanceOf[Vector]))
      .toDF("f0", "f1", "f2")
    val nulled = new Interaction().setInputCols("f0", "f1", "f2").setOutputCol("out")
      .transform(withNull).head.select("out").head()
    assert(nulled.isNullAt(0))
  }

  test("PolynomialExpansion dense degree-2/3 and sparse degree-3 reference fixtures") {
    import spark.implicits._
    val df = Seq(
      (Vectors.dense(1.0, 2.0, 3.0),
        Vectors.sparse(5, Array(1, 4), Array(2.0, 3.0)): Vector),
      (Vectors.dense(2.0, 3.0),
        Vectors.sparse(5, Array(1, 4), Array(2.0, 1.0)): Vector)).toDF("denseVec", "sparseVec")
    def run(in: String, degree: Int) = new PolynomialExpansion()
      .setInputCol(in).setOutputCol("out").setDegree(degree)
      .transform(df).head.select("out").collect().map(_.getAs[Vector](0)).toSeq
    assert(run("denseVec", 2) == Seq(
      Vectors.dense(1.0, 1.0, 2.0, 2.0, 4.0, 3.0, 3.0, 6.0, 9.0),
      Vectors.dense(2.0, 4.0, 3.0, 6.0, 9.0)))
    assert(run("denseVec", 3) == Seq(
      Vectors.dense(1.0, 1.0, 1.0, 2.0, 2.0, 2.0, 4.0, 4.0, 8.0, 3.0, 3.0, 3.0,
        6.0, 6.0, 12.0, 9.0, 9.0, 18.0, 27.0),
      Vectors.dense(2.0, 4.0, 8.0, 3.0, 6.0, 12.0, 9.0, 18.0, 27.0)))
    assert(run("sparseVec", 3) == Seq(
      Vectors.sparse(55, Array(3, 6, 8, 34, 37, 39, 49, 51, 54),
        Array(2.0, 4.0, 8.0, 3.0, 6.0, 12.0, 9.0, 18.0, 27.0)),
      Vectors.sparse(55, Array(3, 6, 8, 34, 37, 39, 49, 51, 54),
        Array(2.0, 4.0, 8.0, 1.0, 2.0, 4.0, 1.0, 2.0, 1.0))))
  }

  test("VectorSlicer dense and sparse reference fixtures") {
    import spark.implicits._
    val df = Seq(
      (0, Vectors.dense(2.1, 3.1, 2.3, 3.4, 5.3, 5.1),
        Vectors.sparse(5, Array(1, 3, 4), Array(0.1, 0.2, 0.3)): Vector),
      (1, Vectors.dense(2.3, 4.1, 1.3, 2.4, 5.1, 4.1),
        Vectors.sparse(5, Array(1, 2, 4), Array(0.1, 0.2, 0.3)): Vector))
      .toDF("id", "vec", "sparseVec")
    def run(in: String) = new VectorSlicer().setInputCol(in).setOutputCol("out")
      .setIndices(0, 1, 2)
      .transform(df).head.orderBy("id").select("out").collect().map(_.getAs[Vector](0)).toSeq
    assert(run("vec") == Seq(Vectors.dense(2.1, 3.1, 2.3), Vectors.dense(2.3, 4.1, 1.3)))
    assert(run("sparseVec") == Seq(
      Vectors.sparse(3, Array(1), Array(0.1)),
      Vectors.sparse(3, Array(1, 2), Array(0.1, 0.2))))
  }

  test("DCT forward and inverse reference fixtures (DCTTest :50-66, 3 dp)") {
    import spark.implicits._
    val df = Seq(Vectors.dense(1.0, 1.0, 1.0, 1.0), Vectors.dense(1.0, 0.0, -1.0, 0.0))
      .map(Tuple1(_)).toDF("input")
    def run(inverse: Boolean): Seq[Seq[Double]] =
      new DCT().setInputCol("input").setOutputCol("output").setInverse(inverse)
        .transform(df).head.select("output").collect()
        .map(_.getAs[Vector](0).toArray.toSeq).toSeq
    val fwd = Seq(Seq(2.0, 0.0, 0.0, 0.0), Seq(0.0, 0.924, 1.0, -0.383))
    run(false).zip(fwd).foreach { case (g, e) =>
      g.zip(e).foreach { case (a, b) => assert(math.abs(a - b) < 1e-3, s"$g vs $e") }
    }
    val inv = Seq(Seq(1.924, -0.383, 0.383, 0.076), Seq(0.0, 1.0, 1.0, 0.0))
    run(true).zip(inv).foreach { case (g, e) =>
      g.zip(e).foreach { case (a, b) => assert(math.abs(a - b) < 1e-3, s"$g vs $e") }
    }
  }

  test("RegexTokenizer option matrix (reference RegexTokenizerTest :99-155)") {
    import spark.implicits._
    val df = Seq("Test for tokenization.", "Te,st. punct").map(Tuple1(_)).toDF("input")
    def run(minLen: Int = 1, gaps: Boolean = true, pattern: String = "\\s+",
        lower: Boolean = true): Seq[Seq[String]] =
      new RegexTokenizer().setInputCol("input").setOutputCol("output")
        .setMinTokenLength(minLen).setGaps(gaps).setPattern(pattern).setToLowercase(lower)
        .transform(df).head.select("output").collect().map(_.getSeq[String](0)).toSeq
    assert(run() == Seq(Seq("test", "for", "tokenization."), Seq("te,st.", "punct")))
    assert(run(lower = false) ==
      Seq(Seq("Test", "for", "tokenization."), Seq("Te,st.", "punct")))
    assert(run(gaps = false, pattern = "\\w+|\\p{Punct}") ==
      Seq(Seq("test", "for", "tokenization", "."), Seq("te", ",", "st", ".", "punct")))
    assert(run(minLen = 3, gaps = false, pattern = "\\w+|\\p{Punct}") ==
      Seq(Seq("test", "for", "tokenization"), Seq("punct")))
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
