package graft.linalg

import org.apache.spark.ml.linalg.Vectors
import org.scalatest.funsuite.AnyFunSuite

/**
 * Reference fixture for the distance measures, ported from
 * servable-core common/distance/DistanceMeasureTest.java:33-82.
 */
class DistanceMeasureSpec extends AnyFunSuite {
  private val tol = 1e-7
  private val a = VectorWithNorm(Vectors.sparse(3, Array(1, 2), Array(1.0, 2.0)))
  private val b = VectorWithNorm(Vectors.dense(1, 2, 3))
  private val centroids = Array(
    VectorWithNorm(Vectors.dense(0, 1, 2)),
    VectorWithNorm(Vectors.dense(1, 2, 3)),
    VectorWithNorm(Vectors.dense(2, 3, 4)))

  test("euclidean: distance + findClosest") {
    assert(math.abs(EuclideanDistance.distance(a, b) - math.sqrt(3)) < tol)
    assert(EuclideanDistance.findClosest(centroids, a) == 0)
    assert(EuclideanDistance.findClosest(centroids, b) == 1)
    val v = VectorWithNorm(Vectors.dense(3.0, 3.0))
    assert(EuclideanDistance.distance(v, v) == 0.0)
  }

  test("manhattan: distance + findClosest") {
    assert(math.abs(ManhattanDistance.distance(a, b) - 3.0) < tol)
    assert(ManhattanDistance.findClosest(centroids, a) == 0)
    assert(ManhattanDistance.findClosest(centroids, b) == 1)
  }

  test("cosine: distance + findClosest") {
    assert(math.abs(CosineDistance.distance(a, b) - 0.04381711) < tol)
    assert(CosineDistance.findClosest(centroids, a) == 0)
    assert(CosineDistance.findClosest(centroids, b) == 1)
  }

  test("lookup by name matches the singletons") {
    assert(DistanceMeasure("euclidean") == EuclideanDistance)
    assert(DistanceMeasure("manhattan") == ManhattanDistance)
    assert(DistanceMeasure("cosine") == CosineDistance)
  }
}
