package graft.linalg

import org.apache.spark.ml.linalg.Vectors
import org.scalatest.funsuite.AnyFunSuite

/**
 * Reference fixture for the BLAS kernels, ported from servable-core
 * linalg/BLASTest.java:40-122 (dot variants, axpy, norm, scal).
 */
class BlasSpec extends AnyFunSuite {
  private val tol = 1e-7
  private def inputDense = Vectors.dense(1, -2, 3, 4, -5)

  test("dot: dense/dense, dense/sparse, sparse/dense, sparse/sparse") {
    val anotherDense = Vectors.dense(1, 2, 3, 4, 5)
    val sparse1 = Vectors.sparse(5, Array(1, 2, 4), Array(1.0, 1.0, 4.0))
    val sparse2 = Vectors.sparse(5, Array(1, 3, 4), Array(1.0, 2.0, 1.0))
    assert(math.abs(BLAS.dot(inputDense, anotherDense) - -3.0) < tol)
    assert(math.abs(BLAS.dot(inputDense, sparse1) - -19.0) < tol)
    assert(math.abs(BLAS.dot(sparse2, inputDense) - 1.0) < tol)
    assert(math.abs(BLAS.dot(sparse1, sparse2) - 5.0) < tol)
  }

  test("axpy into a dense accumulator: dense then sparse x") {
    val y = Array(1.0, 2.0, 3.0, 4.0, 5.0)
    BLAS.axpy(1.0, inputDense, y)
    assert(y.toSeq == Seq(2.0, 0.0, 6.0, 8.0, 0.0))
    BLAS.axpy(2.0, Vectors.sparse(5, Array(0, 2, 4), Array(1.0, 3.0, 5.0)), y)
    assert(y.toSeq == Seq(4.0, 0.0, 12.0, 8.0, 10.0))
  }

  test("norm: L2, infinity, p=3 reference values") {
    assert(math.abs(BLAS.norm(inputDense, 2.0) - math.sqrt(55)) < tol)
    val sparse = Vectors.sparse(5, Array(0, 2, 4), Array(1.0, 3.0, 5.0))
    assert(math.abs(BLAS.norm(sparse, 2.0) - math.sqrt(35)) < tol)
    assert(math.abs(BLAS.norm(sparse, Double.PositiveInfinity) - 5.0) < tol)
    assert(math.abs(BLAS.norm(sparse, 3.0) - 5.348481241239363) < tol)
  }

  test("scal in place") {
    val x = Array(1.0, -2.0, 3.0, 4.0, -5.0)
    BLAS.scal(2.0, x)
    assert(x.toSeq == Seq(2.0, -4.0, 6.0, 8.0, -10.0))
  }
}
