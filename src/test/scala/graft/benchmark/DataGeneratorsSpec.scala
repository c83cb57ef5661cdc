package graft.benchmark

import org.apache.spark.ml.linalg.Vector
import graft.SparkSpec

class DataGeneratorsSpec extends SparkSpec {

  test("denseVectors: shape, range, determinism") {
    val a = DataGenerators.denseVectors(spark, 100, 5, seed = 7L, numPartitions = 4)
    assert(a.count() == 100)
    val rows = a.collect().map(_.getAs[Vector](0))
    assert(rows.forall(v => v.size == 5 && v.toArray.forall(x => x >= 0.0 && x < 1.0)))
    val b = DataGenerators.denseVectors(spark, 100, 5, seed = 7L, numPartitions = 4)
    assert(a.collect().map(_.toString).toSeq == b.collect().map(_.toString).toSeq)
  }

  test("labeledPoints: arity semantics") {
    val df = DataGenerators.labeledPoints(spark, 200, 3,
      featureArity = 4, labelArity = 2, seed = 1L, numPartitions = 2)
    val rows = df.collect()
    assert(rows.forall { r =>
      val v = r.getAs[Vector](0)
      v.toArray.forall(x => x == x.floor && x >= 0 && x < 4) &&
        (r.getDouble(1) == 0.0 || r.getDouble(1) == 1.0) &&
        r.getDouble(2) >= 0.0 && r.getDouble(2) < 1.0
    })
  }

  test("randomStrings and randomSentences draw from bounded pools") {
    val strs = DataGenerators.randomStrings(spark, 500, 10, seed = 3L, numPartitions = 2)
      .collect().map(_.getString(0)).toSet
    assert(strs.size <= 10 && strs.forall(_.startsWith("str_")))
    val sent = DataGenerators.randomSentences(spark, 50, 7, 4, seed = 3L, numPartitions = 2)
      .collect().map(_.getString(0))
    assert(sent.forall(_.split(" ").length == 4))
  }
}
