package graft.feature

import org.apache.spark.sql.DataFrame
import graft.SparkSpec

/**
 * The reference's full StringIndexer edge-case matrix — 4 explicit
 * string orders × keep/skip/error handleInvalid, multi-column, null
 * inputs in both train and predict, and the maxIndexNum cap —
 * mirroring feature/stringindexer/StringIndexerTest.java:61-115
 * (tables + expected rows), :164-205 (order matrix), :209-258
 * (maxIndexNum), :262-300 (handleInvalid).
 */
class StringIndexerMatrixSpec extends SparkSpec {

  // StringIndexerTest.java:96-122 — trainTable / predictTable
  private def train: DataFrame = {
    import spark.implicits._
    Seq[(String, java.lang.Double)](
      ("a", 1.0), ("b", 1.0), ("b", 2.0), ("c", 0.0), ("d", 2.0), ("a", 2.0),
      ("b", 2.0), ("b", -1.0), ("a", -1.0), ("c", -1.0), ("d", null),
      (null, 2.0), (null, null)).toDF("c1", "c2")
  }
  private def predict: DataFrame = {
    import spark.implicits._
    Seq[(String, java.lang.Double)](
      ("a", 2.0), ("b", 1.0), ("e", 2.0), ("f", null), (null, null)).toDF("c1", "c2")
  }

  /** (c1,c2) input key → (o1,o2) output, nulls as None. */
  private def resultMap(df: DataFrame): Map[(String, String), (Option[Double], Option[Double])] =
    df.select("c1", "c2", "o1", "o2").collect().map { r =>
      def o(i: Int): Option[Double] = if (r.isNullAt(i)) None else Some(r.getDouble(i))
      (String.valueOf(r.get(0)), String.valueOf(r.get(1))) -> (o(2), o(3))
    }.toMap

  private def run(order: String, invalid: String, maxIndex: Int = Int.MaxValue): DataFrame = {
    val si = new StringIndexer().setInputCols("c1", "c2").setOutputCols("o1", "o2")
      .setStringOrderType(order).setHandleInvalid(invalid)
    if (maxIndex != Int.MaxValue) si.setMaxIndexNum(maxIndex)
    si.fit(train).transform(predict).head
  }

  private def checkKeep(order: String,
      expected: Map[(String, String), (Option[Double], Option[Double])]): Unit =
    assert(resultMap(run(order, "keep")) == expected, s"order=$order")

  test("alphabetAsc × keep matches the reference row-for-row (incl. model data)") {
    // expectedAlphabeticAscModelData: {{a,b,c,d},{-1.0,0.0,1.0,2.0}}
    val m = new StringIndexer().setInputCols("c1", "c2").setOutputCols("o1", "o2")
      .setStringOrderType("alphabetAsc").fit(train)
    val terms = m.getModelData.head.collect().sortBy(_.getInt(0)).map(_.getSeq[String](1))
    assert(terms(0) == Seq("a", "b", "c", "d"))
    assert(terms(1) == Seq("-1.0", "0.0", "1.0", "2.0"))
    checkKeep("alphabetAsc", Map(
      ("a", "2.0") -> (Some(0.0), Some(3.0)),
      ("b", "1.0") -> (Some(1.0), Some(2.0)),
      ("e", "2.0") -> (Some(4.0), Some(3.0)),
      ("f", "null") -> (Some(4.0), Some(4.0)),
      ("null", "null") -> (Some(4.0), Some(4.0))))
  }

  test("alphabetDesc × keep matches the reference row-for-row") {
    checkKeep("alphabetDesc", Map(
      ("a", "2.0") -> (Some(3.0), Some(0.0)),
      ("b", "1.0") -> (Some(2.0), Some(1.0)),
      ("e", "2.0") -> (Some(4.0), Some(0.0)),
      ("f", "null") -> (Some(4.0), Some(4.0)),
      ("null", "null") -> (Some(4.0), Some(4.0))))
  }

  test("frequencyAsc × keep matches the reference row-for-row") {
    checkKeep("frequencyAsc", Map(
      ("a", "2.0") -> (Some(2.0), Some(3.0)),
      ("b", "1.0") -> (Some(3.0), Some(1.0)),
      ("e", "2.0") -> (Some(4.0), Some(3.0)),
      ("f", "null") -> (Some(4.0), Some(4.0)),
      ("null", "null") -> (Some(4.0), Some(4.0))))
  }

  test("frequencyDesc × keep matches the reference row-for-row") {
    checkKeep("frequencyDesc", Map(
      ("a", "2.0") -> (Some(1.0), Some(0.0)),
      ("b", "1.0") -> (Some(0.0), Some(2.0)),
      ("e", "2.0") -> (Some(4.0), Some(0.0)),
      ("f", "null") -> (Some(4.0), Some(4.0)),
      ("null", "null") -> (Some(4.0), Some(4.0))))
  }

  test("skip drops every row with an unseen or null value in ANY column") {
    val out = run("alphabetAsc", "skip")
    assert(resultMap(out) == Map(
      ("a", "2.0") -> (Some(0.0), Some(3.0)),
      ("b", "1.0") -> (Some(1.0), Some(2.0))))
  }

  test("error raises on the first unseen value") {
    val e = intercept[Exception] { run("alphabetAsc", "error").collect() }
    def messages(t: Throwable): Seq[String] =
      if (t == null) Seq.empty else Option(t.getMessage).toSeq ++ messages(t.getCause)
    assert(messages(e).exists(_.contains("unseen string")),
      s"got: ${messages(e).mkString(" | ")}")
  }

  test("maxIndexNum caps the vocabulary under frequencyDesc (reference expected rows)") {
    assert(resultMap(run("frequencyDesc", "keep", maxIndex = 2)) == Map(
      ("a", "2.0") -> (Some(1.0), Some(0.0)),
      ("b", "1.0") -> (Some(0.0), Some(2.0)),
      ("e", "2.0") -> (Some(2.0), Some(0.0)),
      ("f", "null") -> (Some(2.0), Some(2.0)),
      ("null", "null") -> (Some(2.0), Some(2.0))))
  }

  test("maxIndexNum is rejected for every non-frequencyDesc order") {
    Seq("arbitrary", "alphabetAsc", "alphabetDesc", "frequencyAsc").foreach { order =>
      intercept[IllegalArgumentException] { run(order, "keep", maxIndex = 2) }
    }
  }
}
