package graft.feature

import org.apache.spark.ml.linalg.{Vector, Vectors}
import graft.SparkSpec

/**
 * Bit-level hash parity with the reference: HashingTF and
 * FeatureHasher must place features at the EXACT indices the
 * reference's guava murmur3_32(0) produces, or a user migrating a
 * fitted downstream model would silently read scrambled features.
 * Fixtures and expected indices are the reference's own
 * (feature/HashingTFTest.java:50-80, feature/FeatureHasherTest.java:
 * 48-53).
 */
class HashParitySpec extends SparkSpec {

  test("HashingTF places terms at the reference's exact murmur3 indices") {
    import spark.implicits._
    val df = Seq(
      Seq("HashingTFTest", "Hashing", "Term", "Frequency", "Test"),
      Seq("HashingTFTest", "Hashing", "Hashing", "Test", "Test")).map(Tuple1(_)).toDF("input")
    val out = new HashingTF().setInputCol("input").setOutputCol("tf")
      .transform(df).head.select("tf").collect().map(_.getAs[Vector](0))
    assert(out(0) == Vectors.sparse(262144,
      Array(67564, 89917, 113827, 131486, 228971), Array(1.0, 1.0, 1.0, 1.0, 1.0)))
    assert(out(1) == Vectors.sparse(262144,
      Array(67564, 131486, 228971), Array(1.0, 2.0, 2.0)))

    val bin = new HashingTF().setInputCol("input").setOutputCol("tf").setBinary(true)
      .transform(df).head.select("tf").collect().map(_.getAs[Vector](0))
    assert(bin(1) == Vectors.sparse(262144,
      Array(67564, 131486, 228971), Array(1.0, 1.0, 1.0)))
  }

  test("FeatureHasher places mixed categorical/numeric/boolean at the reference's indices") {
    import spark.implicits._
    val df = Seq((0, "a", 1.0, true), (1, "c", 1.0, false)).toDF("id", "f0", "f1", "f2")
    val out = new FeatureHasher()
      .setInputCols("f0", "f1", "f2").setOutputCol("vec")
      .setCategoricalCols("f0", "f2").setNumFeatures(1000)
      .transform(df).head.select("id", "vec").collect()
      .map(r => r.getInt(0) -> r.getAs[Vector](1)).toMap
    assert(out(0) == Vectors.sparse(1000, Array(607, 635, 913), Array(1.0, 1.0, 1.0)))
    assert(out(1) == Vectors.sparse(1000, Array(242, 869, 913), Array(1.0, 1.0, 1.0)))
  }
}
