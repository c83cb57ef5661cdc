package graft.feature

import org.apache.spark.sql.functions.col
import graft.SparkSpec

/**
 * Selection-mode semantics over the FValueTestTest fixture, whose
 * p-values are pinned in StatsSpec:
 * p = [0.017366, 0.014992, 0.000113, 0.426990, 0.275911, 0.193549].
 */
class UnivariateFeatureSelectorSpec extends SparkSpec {

  private def input = {
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
      .select(col("label"),
        org.apache.spark.ml.functions.array_to_vector(col("arr")).as("features"))
  }

  private def selector = new UnivariateFeatureSelector()
    .setFeatureType("continuous").setLabelType("continuous")

  private def selectedIndices(s: UnivariateFeatureSelector): Seq[Int] =
    s.fit(input).getModelData.head.select("indices").head().getSeq[Int](0)

  test("numTopFeatures picks the lowest p-values") {
    val s = selector.setSelectionMode("numTopFeatures").setSelectionThreshold(2)
    assert(selectedIndices(s).sorted === Seq(1, 2))
  }

  test("percentile picks floor(n*threshold) lowest p-values") {
    val s = selector.setSelectionMode("percentile").setSelectionThreshold(0.5)
    assert(selectedIndices(s).sorted === Seq(0, 1, 2))
  }

  test("fpr keeps p < threshold") {
    val s = selector.setSelectionMode("fpr").setSelectionThreshold(0.05)
    assert(selectedIndices(s).sorted === Seq(0, 1, 2))
  }

  test("fdr applies Benjamini-Hochberg") {
    val s = selector.setSelectionMode("fdr").setSelectionThreshold(0.05)
    assert(selectedIndices(s).sorted === Seq(0, 1, 2))
  }

  test("fwe keeps p < threshold/n") {
    val s = selector.setSelectionMode("fwe").setSelectionThreshold(0.05)
    assert(selectedIndices(s).sorted === Seq(2))
  }

  test("model slices selected dims in ascending index order") {
    val s = selector.setSelectionMode("numTopFeatures").setSelectionThreshold(2)
    val model = s.fit(input)
    val out = model.transform(input).head
    val v = out.select("output").head()
      .getAs[org.apache.spark.ml.linalg.Vector](0)
    val orig = input.select("features").head()
      .getAs[org.apache.spark.ml.linalg.Vector](0)
    assert(v.size == 2)
    assert(v(0) == orig(1) && v(1) == orig(2))
  }

  test("invalid type combination is rejected") {
    intercept[IllegalArgumentException] {
      new UnivariateFeatureSelector()
        .setFeatureType("categorical").setLabelType("continuous").fit(input)
    }
  }
}
