package graft.feature

import org.apache.spark.ml.linalg.{Vector, Vectors}
import org.apache.spark.sql.functions._
import graft.SparkSpec

class PCASpec extends SparkSpec {

  private def data = {
    import spark.implicits._
    val rnd = new scala.util.Random(42)
    // anisotropic cloud: dominant direction (3,1,0,0), second (0,0,2,0)
    (0 until 300).map { _ =>
      val a = rnd.nextGaussian() * 3
      val b = rnd.nextGaussian() * 2
      val n = () => rnd.nextGaussian() * 0.1
      Vectors.dense(3 * a / math.sqrt(10) + n(), a / math.sqrt(10) + n(), b + n(), n() + 5.0)
    }.map(Tuple1(_)).toDF("features")
  }

  test("components and explained variance match spark.ml PCA (up to eigenvector sign)") {
    val ours = new PCA().setInputCol("features").setOutputCol("proj").setK(3).fit(data)
    val ref = new org.apache.spark.ml.feature.PCA()
      .setInputCol("features").setOutputCol("proj").setK(3).fit(data)

    val refPc = ref.pc // d x k, column-major
    val d = refPc.numRows
    val ourComps = ours.getModelData.head.select("components").head().getAs[scala.collection.Seq[Double]](0)
    (0 until 3).foreach { c =>
      val refCol = (0 until d).map(i => refPc(i, c))
      val ourCol = (0 until d).map(i => ourComps(c * d + i))
      // eigenvectors defined up to sign: compare |dot| ~ 1
      val dot = refCol.zip(ourCol).map { case (x, y) => x * y }.sum
      assert(math.abs(math.abs(dot) - 1.0) < 1e-8, s"component $c: |dot|=${math.abs(dot)}")
    }

    // spark.ml explainedVariance is proportions of total variance
    val total = ours.getModelData.head.select("eigenvalues").head().getAs[scala.collection.Seq[Double]](0)
    val totalVar = {
      val stats = data.select(org.apache.spark.ml.functions.vector_to_array(col("features")).as("a"))
        .select((0 until 4).map(i => variance(col("a")(i))): _*).head()
      (0 until 4).map(stats.getDouble).sum
    }
    val refProps = ref.explainedVariance.toArray
    total.take(3).zip(refProps).foreach { case (ev, p) =>
      assert(math.abs(ev / totalVar - p) < 1e-8, s"$ev/$totalVar vs $p")
    }
  }

  test("full-rank projection preserves centered norms exactly (orthogonal transform)") {
    val model = new PCA().setInputCol("features").setOutputCol("proj").setK(4).fit(data)
    val mean = model.getModelData.head.select("mean").head().getAs[scala.collection.Seq[Double]](0).toArray
    val rows = model.transform(data).head
      .select("features", "proj").collect()
    rows.foreach { r =>
      val x = r.getAs[Vector](0).toArray
      val y = r.getAs[Vector](1).toArray
      val nx = x.zip(mean).map { case (a, m) => (a - m) * (a - m) }.sum
      val ny = y.map(v => v * v).sum
      assert(math.abs(nx - ny) < 1e-9, s"$nx vs $ny")
    }
  }

  test("eigenvalues sort descending and the dominant direction comes first") {
    val model = new PCA().setInputCol("features").setOutputCol("proj").setK(4).fit(data)
    val evs = model.explainedVariance
    assert(evs.sliding(2).forall(p => p(0) >= p(1)), evs.toSeq)
    assert(evs(0) > 8 && evs(0) < 11) // var of dominant axis ~ 9
    // first component aligns with (3,1,0,0)/sqrt(10)
    val comps = model.getModelData.head.select("components").head().getAs[scala.collection.Seq[Double]](0)
    val c0 = comps.take(4)
    val expected = Array(3, 1, 0, 0).map(_ / math.sqrt(10.0))
    val dot = c0.zip(expected).map { case (a, b) => a * b }.sum
    assert(math.abs(math.abs(dot) - 1.0) < 1e-3, c0)
  }

  test("whitened output has identity sample covariance") {
    val model = new PCA().setInputCol("features").setOutputCol("proj").setK(3)
      .setWhiten(true).fit(data)
    val projs = model.transform(data).head.select("proj").collect().map(_.getAs[Vector](0).toArray)
    val n = projs.length
    (0 until 3).foreach { i =>
      val mi = projs.map(_(i)).sum / n
      (i until 3).foreach { j =>
        val mj = projs.map(_(j)).sum / n
        val cov = projs.map(p => (p(i) - mi) * (p(j) - mj)).sum / (n - 1)
        val want = if (i == j) 1.0 else 0.0
        assert(math.abs(cov - want) < 1e-6, s"cov($i,$j)=$cov")
      }
    }
  }

  test("save/load round-trip transforms identically") {
    import spark.implicits._
    val model = new PCA().setInputCol("features").setOutputCol("proj").setK(2).fit(data)
    val dir = tmpDir()
    model.save(dir)
    val back = PCAModel.load(spark, dir)
    val probe = Seq(Tuple1(Vectors.dense(1.0, 2.0, 3.0, 4.0))).toDF("features")
    val a = model.transform(probe).head.select("proj").head().getAs[Vector](0)
    val b = back.transform(probe).head.select("proj").head().getAs[Vector](0)
    assert(a == b)
  }

  test("guards: ragged vectors, k > dim, and tiny inputs are rejected") {
    import spark.implicits._
    val ragged = Seq(Tuple1(Vectors.dense(1.0, 2.0)), Tuple1(Vectors.dense(1.0, 2.0, 3.0)))
      .toDF("features")
    val e = intercept[Exception] {
      new PCA().setInputCol("features").setK(2).fit(ragged)
    }
    assert(e.getMessage.contains("expected") || e.getCause != null)
    intercept[Exception] {
      new PCA().setInputCol("features").setK(5).fit(
        Seq(Tuple1(Vectors.dense(1.0, 2.0)), Tuple1(Vectors.dense(2.0, 1.0))).toDF("features"))
    }
    intercept[Exception] {
      new PCA().setInputCol("features").setK(1).fit(
        Seq(Tuple1(Vectors.dense(1.0, 2.0))).toDF("features"))
    }
  }
}
