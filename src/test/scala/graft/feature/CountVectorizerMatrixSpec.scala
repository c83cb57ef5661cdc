package graft.feature

import org.apache.spark.ml.linalg.{Vector, Vectors}
import graft.SparkSpec

/**
 * The reference's CountVectorizer fixture matrix
 * (feature/CountVectorizerTest.java:63-95 input + expected, :247-283
 * min/maxDF in both count and fraction form, :285-311 minTF, :313+
 * binary, :146-186 invalid min/maxDF): vocabulary ordered by corpus
 * term frequency desc then term asc, document frequency bounds
 * resolved against the corpus size, minTF resolved per document.
 */
class CountVectorizerMatrixSpec extends SparkSpec {

  private def input = {
    import spark.implicits._
    Seq(
      Seq("a", "c", "b", "c"),
      Seq("c", "d", "e"),
      Seq("a", "b", "c"),
      Seq("e", "f"),
      Seq("a", "c", "a")).map(Tuple1(_)).toDF("terms")
  }

  private def run(cv: CountVectorizer): Seq[Vector] = {
    val model = cv.setInputCol("terms").setOutputCol("tf").fit(input)
    model.transform(input).head.select("tf").collect().map(_.getAs[Vector](0)).toSeq
  }

  test("fit + transform matches the reference vocabulary order and counts") {
    assert(run(new CountVectorizer()) == Seq(
      Vectors.sparse(6, Array(0, 1, 2), Array(2.0, 1.0, 1.0)),
      Vectors.sparse(6, Array(0, 3, 4), Array(1.0, 1.0, 1.0)),
      Vectors.sparse(6, Array(0, 1, 2), Array(1.0, 1.0, 1.0)),
      Vectors.sparse(6, Array(3, 5), Array(1.0, 1.0)),
      Vectors.sparse(6, Array(0, 1), Array(1.0, 2.0))))
  }

  private val minMaxExpected = Seq(
    Vectors.sparse(4, Array(0, 1, 2), Array(2.0, 1.0, 1.0)),
    Vectors.sparse(4, Array(0, 3), Array(1.0, 1.0)),
    Vectors.sparse(4, Array(0, 1, 2), Array(1.0, 1.0, 1.0)),
    Vectors.sparse(4, Array(3), Array(1.0)),
    Vectors.sparse(4, Array(0, 1), Array(1.0, 2.0)))

  test("minDF/maxDF as counts prune the vocabulary like the reference") {
    assert(run(new CountVectorizer().setMinDF(2).setMaxDF(4)) == minMaxExpected)
  }

  test("minDF/maxDF as fractions resolve against the corpus size") {
    assert(run(new CountVectorizer().setMinDF(0.4).setMaxDF(0.8)) == minMaxExpected)
  }

  test("fractional minTF filters per document length") {
    assert(run(new CountVectorizer().setMinTF(0.5)) == Seq(
      Vectors.sparse(6, Array(0), Array(2.0)),
      Vectors.sparse(6, Array.empty[Int], Array.empty[Double]),
      Vectors.sparse(6, Array.empty[Int], Array.empty[Double]),
      Vectors.sparse(6, Array(3, 5), Array(1.0, 1.0)),
      Vectors.sparse(6, Array(1), Array(2.0))))
  }

  test("binary clamps every present term to 1.0") {
    val got = run(new CountVectorizer().setBinary(true))
    assert(got.head == Vectors.sparse(6, Array(0, 1, 2), Array(1.0, 1.0, 1.0)))
    assert(got.forall(_.toArray.forall(v => v == 0.0 || v == 1.0)))
  }

  test("maxDF < minDF is rejected at fit (counts, fractions, and mixed)") {
    Seq((0.2, 0.1), (2.0, 1.0), (0.9, 1.0), (10.0, 0.1)).foreach { case (lo, hi) =>
      intercept[IllegalArgumentException] {
        run(new CountVectorizer().setMinDF(lo).setMaxDF(hi))
      }
    }
  }
}
