package graft.stats

import org.apache.spark.ml.linalg.Vectors
import graft.SparkSpec
import graft.evaluation.BinaryClassificationEvaluator

/** Expected values mirror the reference ChiSqTestTest / ANOVATestTest /
  * FValueTestTest / BinaryClassificationEvaluatorTest fixtures. */
class StatsSpec extends SparkSpec {

  private val eps = 1e-5

  test("ChiSqTest flatten rows (reference samplesWithDoubleLabel)") {
    import spark.implicits._
    val rows = Seq(
      (0.0, Seq(5.0, 1.0)), (2.0, Seq(6.0, 2.0)), (1.0, Seq(7.0, 2.0)), (1.0, Seq(5.0, 4.0)),
      (0.0, Seq(5.0, 1.0)), (2.0, Seq(6.0, 2.0)), (1.0, Seq(7.0, 2.0)), (1.0, Seq(5.0, 4.0)),
      (2.0, Seq(5.0, 1.0)), (0.0, Seq(5.0, 2.0)), (0.0, Seq(5.0, 2.0)), (1.0, Seq(9.0, 4.0)),
      (1.0, Seq(9.0, 3.0)))
    val df = rows.toDF("label", "arr")
      .select(org.apache.spark.sql.functions.col("label"),
        org.apache.spark.ml.functions.array_to_vector(
          org.apache.spark.sql.functions.col("arr")).as("features"))
    val got = new ChiSqTest().setFlatten(true).transform(df).head
      .orderBy("featureIndex").collect()
      .map(r => (r.getInt(0), r.getDouble(1), r.getLong(2), r.getDouble(3)))
    val expected = Seq(
      (0, 0.03419350755, 6L, 13.61904761905),
      (1, 0.24220177737, 6L, 7.94444444444))
    got.zip(expected).foreach { case ((i, p, d, s), (ei, ep, ed, es)) =>
      assert(i == ei && d == ed)
      assert(math.abs(p - ep) < eps, s"pValue f$i")
      assert(math.abs(s - es) < eps, s"statistic f$i")
    }
  }

  private def anovaInput = {
    import spark.implicits._
    val rows = Seq(
      (3.0, Seq(0.85956061, 0.1645695, 0.48347596, 0.92102727, 0.42855644, 0.05746009)),
      (2.0, Seq(0.92500743, 0.65760154, 0.13295284, 0.53344893, 0.8994776, 0.24836496)),
      (1.0, Seq(0.03017182, 0.07244715, 0.87416449, 0.55843035, 0.91604736, 0.63346045)),
      (5.0, Seq(0.28325261, 0.36536881, 0.09223386, 0.37251258, 0.34742278, 0.70517077)),
      (4.0, Seq(0.64850904, 0.04090877, 0.21173176, 0.00148992, 0.13897166, 0.21182539)),
      (4.0, Seq(0.02609493, 0.44608735, 0.23910531, 0.95449222, 0.90763182, 0.8624905)),
      (5.0, Seq(0.09158744, 0.97745235, 0.41150139, 0.45830467, 0.52590925, 0.29441554)),
      (4.0, Seq(0.97211594, 0.1814442, 0.30340642, 0.17445413, 0.52756958, 0.02069296)),
      (2.0, Seq(0.06354593, 0.63527231, 0.49620335, 0.0141264, 0.62722219, 0.63497507)),
      (1.0, Seq(0.10814149, 0.8296426, 0.51775217, 0.57068344, 0.54633305, 0.12714921)),
      (1.0, Seq(0.72731796, 0.94010124, 0.45007811, 0.87650674, 0.53735565, 0.49568415)),
      (2.0, Seq(0.41827208, 0.85100628, 0.38685271, 0.60689503, 0.21784097, 0.91294433)),
      (3.0, Seq(0.65843656, 0.5880859, 0.18862706, 0.856398, 0.18029327, 0.94851926)),
      (4.0, Seq(0.3841634, 0.25138793, 0.96746644, 0.77048045, 0.44685196, 0.19813854)),
      (5.0, Seq(0.65982267, 0.23024125, 0.13598434, 0.60144265, 0.57848927, 0.85623564)),
      (1.0, Seq(0.35764189, 0.47623815, 0.5459232, 0.79508298, 0.14462443, 0.01802919)),
      (5.0, Seq(0.38532153, 0.90614554, 0.86629571, 0.13988735, 0.32062385, 0.00179492)),
      (3.0, Seq(0.2142368, 0.28306022, 0.59481646, 0.42567028, 0.52207663, 0.78082401)),
      (1.0, Seq(0.20788283, 0.76861782, 0.59595468, 0.62103642, 0.17781246, 0.77655345)),
      (1.0, Seq(0.1751708, 0.4547537, 0.46187865, 0.79781199, 0.05104487, 0.42406092)))
    rows.toDF("label", "arr")
      .select(org.apache.spark.sql.functions.col("label"),
        org.apache.spark.ml.functions.array_to_vector(
          org.apache.spark.sql.functions.col("arr")).as("features"))
  }

  test("ANOVATest dense (reference ANOVATestTest)") {
    val got = new ANOVATest().setFlatten(true).transform(anovaInput).head
      .orderBy("featureIndex").collect()
      .map(r => (r.getInt(0), r.getDouble(1), r.getLong(2), r.getDouble(3)))
    val expP = Seq(0.64137831, 0.14830724, 0.69858474, 0.28038169, 0.86759161, 0.81608606)
    val expF = Seq(0.64110932, 1.98689258, 0.55499714, 1.40340562, 0.30881722, 0.3848595)
    got.zipWithIndex.foreach { case ((i, p, d, f), idx) =>
      assert(i == idx && d == 19L)
      assert(math.abs(p - expP(idx)) < eps, s"pValue f$idx")
      assert(math.abs(f - expF(idx)) < eps, s"fValue f$idx")
    }
  }

  private def fvalueInput = {
    import spark.implicits._
    val rows = Seq(
      (0.19775997, Seq(0.15266373, 0.30235661, 0.06203641, 0.45986034, 0.83525338, 0.92699705)),
      (0.66009772, Seq(0.72698898, 0.76849622, 0.26920507, 0.64402929, 0.09337326, 0.07968589)),
      (0.80865842, Seq(0.58961375, 0.34334054, 0.98887615, 0.62647321, 0.68177928, 0.55225681)),
      (0.34142582, Seq(0.26886006, 0.37325939, 0.2229281, 0.1864426, 0.39064809, 0.19316241)),
      (0.84756607, Seq(0.61091093, 0.88280845, 0.62233882, 0.25311894, 0.17993031, 0.81640447)),
      (0.53360225, Seq(0.22537162, 0.51685714, 0.51849582, 0.60037494, 0.53262048, 0.01331005)),
      (0.90053371, Seq(0.52409726, 0.89588471, 0.76990129, 0.1228517, 0.29587269, 0.61202358)),
      (0.78779561, Seq(0.72613812, 0.46349747, 0.76911037, 0.19163103, 0.55786672, 0.55077816)),
      (0.51604647, Seq(0.47222549, 0.79188496, 0.11524968, 0.6813039, 0.36233361, 0.34420889)),
      (0.35325637, Seq(0.44951875, 0.02694226, 0.41524769, 0.9222317, 0.09120557, 0.31512178)),
      (0.51408926, Seq(0.52802224, 0.32806203, 0.44891554, 0.01633442, 0.0970269, 0.69258857)),
      (0.84489897, Seq(0.83594341, 0.42432199, 0.8487743, 0.54679121, 0.35410346, 0.72724968)),
      (0.55342816, Seq(0.09385168, 0.8928588, 0.33625828, 0.89183268, 0.296849, 0.30164829)),
      (0.89405683, Seq(0.80624061, 0.83760997, 0.63428133, 0.3113273, 0.02944858, 0.39977732)),
      (0.54588131, Seq(0.51817346, 0.00738845, 0.77494778, 0.8544712, 0.13153282, 0.28767364)),
      (0.96038024, Seq(0.32658881, 0.90655956, 0.99955954, 0.77088429, 0.04284752, 0.96525111)),
      (0.71349698, Seq(0.97521246, 0.2025168, 0.67985305, 0.46534506, 0.92001748, 0.72820735)),
      (0.43456735, Seq(0.24585653, 0.01953996, 0.70598881, 0.77448287, 0.4729746, 0.80146736)),
      (0.52462506, Seq(0.17539792, 0.72016934, 0.3678759, 0.53209295, 0.29719397, 0.37429151)),
      (0.43074793, Seq(0.72810013, 0.39850784, 0.1058295, 0.39858265, 0.52196395, 0.1060125)))
    rows.toDF("label", "arr")
      .select(org.apache.spark.sql.functions.col("label"),
        org.apache.spark.ml.functions.array_to_vector(
          org.apache.spark.sql.functions.col("arr")).as("features"))
  }

  test("FValueTest dense (reference FValueTestTest)") {
    val got = new FValueTest().setFlatten(true).transform(fvalueInput).head
      .orderBy("featureIndex").collect()
      .map(r => (r.getInt(0), r.getDouble(1), r.getLong(2), r.getDouble(3)))
    val expP = Seq(1.73658700e-02, 1.49916659e-02, 1.12697153e-04, 4.26990301e-01,
      2.75911201e-01, 1.93549275e-01)
    val expF = Seq(6.86260598, 7.23175589, 24.11424725, 0.6605354, 1.26266286, 1.82421406)
    got.zipWithIndex.foreach { case ((i, p, d, f), idx) =>
      assert(i == idx && d == 18L)
      assert(math.abs(p - expP(idx)) < eps, s"pValue f$idx")
      assert(math.abs(f - expF(idx)) < eps, s"fValue f$idx")
    }
  }

  test("FValueTest perfectly correlated feature yields F = +inf, p = 0 (not NaN)") {
    import spark.implicits._
    val df = Seq.tabulate(10)(i => (i.toDouble, Seq(2.0 * i + 1.0)))
      .toDF("label", "arr")
      .select(org.apache.spark.sql.functions.col("label"),
        org.apache.spark.ml.functions.array_to_vector(
          org.apache.spark.sql.functions.col("arr")).as("features"))
    // float noise may leave r² just below 1 (huge finite F) or push it
    // past 1 (which the clamp maps to +∞); either way F must be a
    // positive non-NaN and p must collapse to 0
    val r = new FValueTest().setFlatten(true).transform(df).head.collect().head
    val f = r.getDouble(3)
    assert(!f.isNaN && f > 1e10, s"F was $f")
    assert(r.getDouble(1) < 1e-12, s"p was ${r.getDouble(1)}")
  }

  test("BinaryClassificationEvaluator PR/KS/ROC (reference INPUT_DATA)") {
    import spark.implicits._
    val rows = Seq(
      (1.0, Seq(0.1, 0.9)), (1.0, Seq(0.2, 0.8)), (1.0, Seq(0.3, 0.7)),
      (0.0, Seq(0.25, 0.75)), (0.0, Seq(0.4, 0.6)), (1.0, Seq(0.35, 0.65)),
      (1.0, Seq(0.45, 0.55)), (0.0, Seq(0.6, 0.4)), (0.0, Seq(0.7, 0.3)),
      (1.0, Seq(0.65, 0.35)), (0.0, Seq(0.8, 0.2)), (1.0, Seq(0.9, 0.1)))
    val df = rows.toDF("label", "arr")
      .select(org.apache.spark.sql.functions.col("label"),
        org.apache.spark.ml.functions.array_to_vector(
          org.apache.spark.sql.functions.col("arr")).as("rawPrediction"))
    val got = new BinaryClassificationEvaluator()
      .setMetricsNames("areaUnderPR", "ks", "areaUnderROC")
      .transform(df).head.collect().head
    assert(math.abs(got.getDouble(0) - 0.7691481137909708) < eps, "areaUnderPR")
    assert(math.abs(got.getDouble(1) - 0.3714285714285714) < eps, "ks")
    assert(math.abs(got.getDouble(2) - 0.6571428571428571) < eps, "areaUnderROC")
  }
}
