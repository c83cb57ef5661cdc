package graft.feature

import graft.SparkSpec

/**
 * Reference edge-case matrices for the remaining high-traffic
 * handleInvalid stages (the StringIndexer matrix lives in
 * StringIndexerMatrixSpec): Bucketizer's keep/skip/error over ±Inf /
 * NaN multi-column input (feature/BucketizerTest.java:54-166) and
 * Imputer's mean/median/most_frequent over mixed null/NaN columns of
 * double/int/float types (feature/ImputerTest.java:60-104).
 */
class InvalidHandlingMatrixSpec extends SparkSpec {

  // ------------------------------------------------------------ Bucketizer

  // BucketizerTest inputData: (id, f1..f4); splits per column
  private def bucketInput = {
    import spark.implicits._
    Seq(
      (1, -0.5, 0.0, 1.0, 0.0),
      (2, Double.NegativeInfinity, 1.0, Double.PositiveInfinity, 1.0),
      (3, Double.NaN, -0.5, -0.5, 2.0)).toDF("id", "f1", "f2", "f3", "f4")
  }
  private val splits: Array[Array[Double]] = Array(
    Array(-0.5, 0.0, 0.5),
    Array(-1.0, 0.0, 2.0),
    Array(Double.NegativeInfinity, 10.0, Double.PositiveInfinity),
    Array(Double.NegativeInfinity, 1.5, Double.PositiveInfinity))

  private def bucketize(invalid: String) = new Bucketizer()
    .setInputCols("f1", "f2", "f3", "f4").setOutputCols("o1", "o2", "o3", "o4")
    .setSplitsArray(splits).setHandleInvalid(invalid)
    .transform(bucketInput).head
    .select("id", "o1", "o2", "o3", "o4").collect()
    .map(r => r.getInt(0) -> (1 to 4).map(r.getDouble).toSeq).toMap

  test("Bucketizer keep: invalid values land in the extra numBuckets bucket") {
    assert(bucketize("keep") == Map(
      1 -> Seq(0.0, 1.0, 0.0, 0.0),
      2 -> Seq(2.0, 1.0, 1.0, 0.0),
      3 -> Seq(2.0, 0.0, 0.0, 1.0)))
  }

  test("Bucketizer skip: a row invalid in ANY column is dropped") {
    assert(bucketize("skip") == Map(1 -> Seq(0.0, 1.0, 0.0, 0.0)))
  }

  test("Bucketizer error: invalid input raises") {
    val e = intercept[Exception] { bucketize("error") }
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Seq.empty else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(e).exists(_.contains("invalid value")), msgs(e).mkString(" | "))
  }

  // --------------------------------------------------------------- Imputer

  // ImputerTest input: (f1 double, f2 double, f3 int-with-null, f4 float),
  // NaN and null both missing under the default missingValue = NaN
  private def imputeInput = {
    import spark.implicits._
    Seq[(Int, java.lang.Double, java.lang.Double, java.lang.Integer, java.lang.Float)](
      (0, Double.NaN, 9.0, 1, 9.0f),
      (1, 1.0, 9.0, null, 9.0f),
      (2, 1.5, 7.0, 1, 7.0f),
      (3, 1.5, Double.NaN, 2, Float.NaN),
      (4, 4.0, 5.0, 4, 5.0f),
      (5, null, 4.0, null, 4.0f)).toDF("id", "f1", "f2", "f3", "f4")
  }

  private def impute(strategy: String): Map[Int, Seq[Double]] = {
    val model = new Imputer()
      .setInputCols("f1", "f2", "f3", "f4").setOutputCols("o1", "o2", "o3", "o4")
      .setStrategy(strategy).fit(imputeInput)
    model.transform(imputeInput).head
      .select("id", "o1", "o2", "o3", "o4").collect()
      .map(r => r.getInt(0) -> (1 to 4).map(r.getDouble).toSeq).toMap
  }

  test("Imputer mean over mixed null/NaN double/int/float columns") {
    assert(impute("mean") == Map(
      0 -> Seq(2.0, 9.0, 1.0, 9.0), 1 -> Seq(1.0, 9.0, 2.0, 9.0),
      2 -> Seq(1.5, 7.0, 1.0, 7.0), 3 -> Seq(1.5, 6.8, 2.0, 6.8),
      4 -> Seq(4.0, 5.0, 4.0, 5.0), 5 -> Seq(2.0, 4.0, 2.0, 4.0)))
  }

  test("Imputer median over mixed null/NaN double/int/float columns") {
    assert(impute("median") == Map(
      0 -> Seq(1.5, 9.0, 1.0, 9.0), 1 -> Seq(1.0, 9.0, 1.0, 9.0),
      2 -> Seq(1.5, 7.0, 1.0, 7.0), 3 -> Seq(1.5, 7.0, 2.0, 7.0),
      4 -> Seq(4.0, 5.0, 4.0, 5.0), 5 -> Seq(1.5, 4.0, 1.0, 4.0)))
  }

  test("Imputer most_frequent over mixed null/NaN double/int/float columns") {
    assert(impute("most_frequent") == Map(
      0 -> Seq(1.5, 9.0, 1.0, 9.0), 1 -> Seq(1.0, 9.0, 1.0, 9.0),
      2 -> Seq(1.5, 7.0, 1.0, 7.0), 3 -> Seq(1.5, 9.0, 2.0, 9.0),
      4 -> Seq(4.0, 5.0, 4.0, 5.0), 5 -> Seq(1.5, 4.0, 1.0, 4.0)))
  }

  test("Imputer with a custom missingValue treats it (and NaN) as missing") {
    import spark.implicits._
    val df = Seq((0, 0.0), (1, 2.0), (2, 4.0)).toDF("id", "f1")
    val model = new Imputer().setInputCols("f1").setOutputCols("o1")
      .setStrategy("mean").setMissingValue(0.0).fit(df)
    val got = model.transform(df).head.select("id", "o1").collect()
      .map(r => r.getInt(0) -> r.getDouble(1)).toMap
    assert(got == Map(0 -> 3.0, 1 -> 2.0, 2 -> 4.0)) // mean of {2,4}
  }

  // -------------------------------------------------------- VectorAssembler

  // VectorAssemblerTest fixtures: (id, vec dense-2, num, sparseVec size-5)
  import org.apache.spark.ml.linalg.{Vector, Vectors}

  private def assemblerInput(vecOf: Int => Vector, numOf: Int => Double) = {
    import spark.implicits._
    val sparse1 = Vectors.sparse(5, Array(3), Array(1.0))
    val sparse2 = Vectors.sparse(5, Array(1, 2, 3, 4), Array(1.0, 2.0, 3.0, 4.0))
    Seq(
      (0, vecOf(0), numOf(0), sparse1),
      (1, vecOf(1), numOf(1), sparse2),
      (2, vecOf(2), numOf(2), sparse2)).toDF("id", "vec", "num", "sparseVec")
  }
  private val denseA = Vectors.dense(2.1, 3.1)
  private val denseB = Vectors.dense(2.0, 2.1)

  private def assemble(df: org.apache.spark.sql.DataFrame, invalid: String,
      sizes: Seq[Int] = Seq(2, 1, 5)) = new VectorAssembler()
    .setInputCols("vec", "num", "sparseVec").setOutputCol("out")
    .setInputSizes(sizes: _*).setHandleInvalid(invalid)
    .transform(df).head.select("id", "out").collect()
    .map(r => r.getInt(0) -> r.getAs[Vector]("out")).toMap

  test("VectorAssembler keep: null vector column fills its slots with NaN") {
    // VectorAssemblerTest.testKeepInvalidWithNull / EXPECTED_OUTPUT_DATA_4
    val df = assemblerInput(i => if (i == 0) denseA else null, _ => 1.0)
    val got = assemble(df, "keep")
    assert(got(0) == Vectors.sparse(8, Array(0, 1, 2, 6), Array(2.1, 3.1, 1.0, 1.0)))
    val exp4 = Vectors.dense(Double.NaN, Double.NaN, 1.0, 0.0, 1.0, 2.0, 3.0, 4.0)
    Seq(1, 2).foreach { id =>
      assert(got(id).toArray.zip(exp4.toArray).forall {
        case (a, b) => (a.isNaN && b.isNaN) || a == b
      }, s"id=$id: ${got(id)}")
    }
  }

  test("VectorAssembler keep: NaN numeric propagates into the assembled vector") {
    // testKeepInvalidWithNaN / EXPECTED_OUTPUT_DATA_5
    val df = assemblerInput(i => if (i == 2) denseB else denseA,
      i => if (i == 2) Double.NaN else 1.0)
    val got = assemble(df, "keep")
    val exp5 = Vectors.dense(2.0, 2.1, Double.NaN, 0.0, 1.0, 2.0, 3.0, 4.0)
    assert(got(2).toArray.zip(exp5.toArray).forall {
      case (a, b) => (a.isNaN && b.isNaN) || a == b
    }, got(2).toString)
  }

  test("VectorAssembler error: null input raises the reference message") {
    val df = assemblerInput(i => if (i == 0) denseA else null, _ => 1.0)
    val e = intercept[Exception] { assemble(df, "error") }
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Seq.empty else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(e).exists(_.contains("Input column value is null")), msgs(e).mkString(" | "))
  }

  test("VectorAssembler error: declared-size mismatch raises; keep tolerates it") {
    val df = assemblerInput(_ => denseA, _ => 1.0)
    val e = intercept[Exception] { assemble(df, "error", sizes = Seq(2, 1, 4)) }
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Seq.empty else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(e).exists(_.contains("size does not meet")), msgs(e).mkString(" | "))
    assert(assemble(df, "keep", sizes = Seq(2, 1, 4)).size == 3) // rows all kept
  }

  // --------------------------------------------------------- OneHotEncoder

  test("OneHotEncoder rejects non-indexed TRAIN values anywhere, not just the max") {
    // OneHotEncoderTest.testNonIndexedTrainData: {0.5, 1.0, 2.0, 0.0}
    import spark.implicits._
    val df = Seq(0.5, 1.0, 2.0, 0.0).map(Tuple1(_)).toDF("c")
    val e = intercept[IllegalArgumentException] {
      new OneHotEncoder().setInputCols("c").setOutputCols("v").fit(df)
    }
    assert(e.getMessage.contains("0.5 cannot be parsed as indexed integer"), e.getMessage)
  }

  test("OneHotEncoder rejects NaN TRAIN values (NaN = NaN holds in Spark SQL)") {
    // In Spark SQL NaN equals itself and sorts greatest, so without a
    // dedicated isnan arm a NaN train value would flow through the
    // fractional/negative witness into max() and silently truncate to
    // a degenerate 0-size model. The reference throws
    // (OneHotEncoder.java: value != number.doubleValue()).
    import spark.implicits._
    val df = Seq(0.0, 1.0, Double.NaN, 2.0).map(Tuple1(_)).toDF("c")
    val e = intercept[IllegalArgumentException] {
      new OneHotEncoder().setInputCols("c").setOutputCols("v").fit(df)
    }
    assert(e.getMessage.contains("cannot be parsed as indexed integer"), e.getMessage)
  }

  // -------------------------------------------------- StopWordsRemover

  test("StopWordsRemover case sensitivity matrix (reference :226-241)") {
    import spark.implicits._
    val df = Seq(Seq("A"), Seq("The", "the")).map(Tuple1(_)).toDF("raw")
    val insensitive = new StopWordsRemover().setInputCols("raw").setOutputCols("filtered")
      .transform(df).head.select("filtered").collect().map(_.getSeq[String](0))
    assert(insensitive.toSeq == Seq(Seq.empty, Seq.empty))
    val sensitive = new StopWordsRemover().setInputCols("raw").setOutputCols("filtered")
      .setCaseSensitive(true)
      .transform(df).head.select("filtered").collect().map(_.getSeq[String](0))
    assert(sensitive.toSeq == Seq(Seq("A"), Seq("The")))
  }

  test("StopWordsRemover custom lists add and ignore words (reference :283-328)") {
    import spark.implicits._
    val df = Seq(Seq("python", "scala", "a"), Seq("Python", "Scala", "swift"))
      .map(Tuple1(_)).toDF("raw")
    val base = StopWordsRemover.loadDefaultStopWords("english").toSet
    def run(words: Set[String]) = new StopWordsRemover()
      .setInputCols("raw").setOutputCols("filtered").setStopWords(words.toArray)
      .transform(df).head.select("filtered").collect().map(_.getSeq[String](0)).toSeq
    assert(run(base - "a") == Seq(Seq("python", "scala", "a"), Seq("Python", "Scala", "swift")))
    assert(run(base ++ Seq("python", "scala")) == Seq(Seq.empty, Seq("swift")))
  }

  test("default stop words of every supported language are non-empty") {
    Seq("danish", "dutch", "english", "finnish", "french", "german", "hungarian",
      "italian", "norwegian", "portuguese", "russian", "spanish", "swedish", "turkish")
      .foreach { lang =>
        assert(StopWordsRemover.loadDefaultStopWords(lang).nonEmpty, lang)
      }
  }

  test("OneHotEncoder rejects non-indexed PREDICT values at transform") {
    import spark.implicits._
    val train = Seq(0.0, 1.0, 2.0, 0.0).map(Tuple1(_)).toDF("c")
    val model = new OneHotEncoder().setInputCols("c").setOutputCols("v")
      .setDropLast(false).fit(train)
    val bad = Seq(0.5).map(Tuple1(_)).toDF("c")
    val e = intercept[Exception] { model.transform(bad).head.collect() }
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Seq.empty else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(e).exists(_.contains("cannot be parsed as indexed integer")),
      msgs(e).mkString(" | "))
  }
}
