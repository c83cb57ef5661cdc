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
}
