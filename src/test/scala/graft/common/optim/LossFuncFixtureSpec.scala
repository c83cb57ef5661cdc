package graft.common.optim

import org.apache.spark.ml.linalg.Vectors
import org.scalatest.funsuite.AnyFunSuite

/**
 * Reference fixtures for the three loss functions, ported from
 * common/lossfunc/BinaryLogisticLossTest.java:33-52,
 * HingeLossTest.java:33-58 and LeastSquareLossTest.java:33-50 —
 * pinned loss values and cumulative-gradient accumulation (two calls
 * accumulate, not overwrite), tolerance 1e-7.
 */
class LossFuncFixtureSpec extends AnyFunSuite {

  private val Tol = 1e-7

  private def assertArr(actual: Array[Double], expected: Seq[Double]): Unit =
    actual.toSeq.zip(expected).foreach { case (a, e) =>
      assert(math.abs(a - e) < Tol, s"${actual.toSeq} vs $expected")
    }

  test("BinaryLogisticLoss loss and accumulated gradient") {
    val p = LabeledPointWithWeight(Vectors.dense(1.0, 2.0, 3.0), 1.0, 2.0)
    val w = Array(1.0, 1.0, 1.0)
    assert(math.abs(BinaryLogisticLoss.loss(p, w) - 0.0049513) < Tol)

    val cum = Array(0.0, 0.0, 0.0)
    BinaryLogisticLoss.gradient(p, w, cum)
    assertArr(cum, Seq(-0.0049452, -0.0098904, -0.0148357))
    BinaryLogisticLoss.gradient(p, w, cum)
    assertArr(cum, Seq(-0.0098904, -0.0197809, -0.0296714))
  }

  test("HingeLoss loss and accumulated gradient (zero-margin point adds nothing)") {
    val p1 = LabeledPointWithWeight(Vectors.dense(1.0, -1.0, -1.0), 1.0, 2.0)
    val p2 = LabeledPointWithWeight(Vectors.dense(1.0, -1.0, 1.0), 1.0, 2.0)
    val w = Array(1.0, 1.0, 1.0)
    assert(math.abs(HingeLoss.loss(p1, w) - 4.0) < Tol)
    assert(math.abs(HingeLoss.loss(p2, w) - 0.0) < Tol)

    val cum = Array(0.0, 0.0, 0.0)
    HingeLoss.gradient(p1, w, cum)
    assertArr(cum, Seq(-2.0, 2.0, 2.0))
    HingeLoss.gradient(p2, w, cum) // margin exactly 0 → no contribution
    assertArr(cum, Seq(-2.0, 2.0, 2.0))
  }

  test("LeastSquareLoss loss and accumulated gradient") {
    val p = LabeledPointWithWeight(Vectors.dense(1.0, 2.0, 3.0), 1.0, 2.0)
    val w = Array(1.0, 1.0, 1.0)
    assert(math.abs(LeastSquareLoss.loss(p, w) - 25.0) < Tol)

    val cum = Array(0.0, 0.0, 0.0)
    LeastSquareLoss.gradient(p, w, cum)
    assertArr(cum, Seq(10.0, 20.0, 30.0))
    LeastSquareLoss.gradient(p, w, cum)
    assertArr(cum, Seq(20.0, 40.0, 60.0))
  }
}
