package graft.common.optim

import org.scalatest.funsuite.AnyFunSuite

/**
 * Reference fixture for the in-place regularization step, ported from
 * common/optimizer/RegularizationUtilsTest.java:31-47: coefficient
 * (1.0, -2.0, 0), learningRate 0.1, tolerance 1e-7. Covers no-reg,
 * pure L2 (elasticNet 0), pure L1 (elasticNet 1 — the zero coordinate
 * must STAY zero, no subgradient kick), and elastic-net mixing.
 */
class RegularizationFixtureSpec extends AnyFunSuite {

  private val Tol = 1e-7
  private val Lr = 0.1

  private def check(reg: Double, elasticNet: Double, expected: Seq[Double]): Unit = {
    val w = Array(1.0, -2.0, 0.0)
    SGD.regularize(w, reg, elasticNet, Lr)
    w.toSeq.zip(expected).foreach { case (a, e) =>
      assert(math.abs(a - e) < Tol, s"reg=$reg enet=$elasticNet: ${w.toSeq} vs $expected")
    }
  }

  test("reg=0 leaves coefficients untouched for any elasticNet") {
    check(0.0, 0.37, Seq(1.0, -2.0, 0.0))
    check(0.0, 0.0, Seq(1.0, -2.0, 0.0))
    check(0.0, 1.0, Seq(1.0, -2.0, 0.0))
  }

  test("pure L2 (elasticNet=0) scales by 1 - lr*reg") {
    check(0.1, 0.0, Seq(0.99, -1.98, 0.0))
  }

  test("pure L1 (elasticNet=1) shrinks toward zero; exact zero stays zero") {
    check(0.1, 1.0, Seq(0.99, -1.99, 0.0))
  }

  test("elastic-net 0.1 mixes the two penalties") {
    check(0.1, 0.1, Seq(0.99, -1.981, 0.0))
  }
}
