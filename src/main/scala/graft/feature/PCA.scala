package graft.feature

import org.apache.spark.ml.linalg.{Vector, Vectors}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.api.{Estimator, Model, StageLoader}
import graft.linalg.Eigen
import graft.param._
import graft.util.ReadWrite

/**
 * Principal component analysis with optional whitening for the
 * embedding tier: project vectors onto the top-k eigenvectors of the
 * sample covariance (centered; whitened output has identity
 * covariance). The standard preprocessing step before embedding
 * clustering / near-dup / IVF codebook training. No reference
 * counterpart — beyond-reference LLM-data-pipeline tier.
 *
 * Scale shape (100 TB design): fit is ONE `treeAggregate` pass over
 * the vectors building (n, Σx, upper-triangular Σxxᵀ) — O(d²) per
 * partition combiner, O(d²·log partitions) driver traffic, no
 * shuffle of row data (the same pattern spark.ml's own PCA/RowMatrix
 * uses). The d×d eigendecomposition runs on the driver (embedding
 * dims are 10²–10³; d² doubles, microseconds). Transform broadcasts
 * the (d×k) component matrix and projects per-row — no shuffle.
 *
 * Determinism: eigenvalues sort descending; ties broken by the
 * commons-math ordering; each eigenvector's sign is normalized so its
 * largest-magnitude coordinate is positive (the conventional fix —
 * eigenvectors are only defined up to sign).
 */
class PCA extends Estimator[PCA, PCAModel]
    with HasInputCol[PCA] with HasOutputCol[PCA] {

  final val k: Param[Int] =
    param[Int]("k", "Number of principal components.", 2, ParamValidators.gt(0))
  def getK: Int = get(k)
  def setK(v: Int): PCA = set(k, v)

  final val whiten: Param[Boolean] =
    param[Boolean]("whiten", "Scale each component by 1/sqrt(eigenvalue) so the output has identity covariance.", false)
  def getWhiten: Boolean = get(whiten)
  def setWhiten(v: Boolean): PCA = set(whiten, v)

  override def fit(inputs: DataFrame*): PCAModel = {
    require(inputs.size == 1)
    val df = inputs.head
    val spark = df.sparkSession

    // one pass: (count, sum, upper-triangular gram) per partition,
    // merged pairwise — no row ever leaves its executor; the moment
    // arithmetic is graft.linalg.Eigen, shared with OnlinePCA
    val vecs = df.select(col(getInputCol)).rdd.map(_.getAs[Vector](0))
    val d = vecs.first().size
    val zero = (0L, new Array[Double](d), new Array[Double](Eigen.triLen(d)))
    val (n, sum, tri) = vecs.treeAggregate(zero)(
      seqOp = { case ((cnt, s, g), v) =>
        require(v.size == d, s"PCA: vector of size ${v.size}, expected $d")
        Eigen.accumulate(s, g, v.toArray, d)
        (cnt + 1L, s, g)
      },
      combOp = { case ((c1, s1, g1), (c2, s2, g2)) =>
        Eigen.merge(s1, g1, s2, g2)
        (c1 + c2, s1, g1)
      })
    require(n > 1, s"PCA needs at least 2 rows, got $n")
    require(getK <= d, s"k=$getK exceeds vector dimension $d")

    val (mean, cov) = Eigen.covFromMoments(n, sum, tri, d)
    val (eigenvalues, components) = Eigen.topK(cov, getK)

    import spark.implicits._
    val modelData = Seq((d, mean, eigenvalues, components.flatten))
      .toDF("dim", "mean", "eigenvalues", "components")
    val m = new PCAModel().setModelData(modelData)
    copyParamsTo(m)
    m
  }
}
object PCA extends StageLoader[PCA] {
  def load(spark: SparkSession, path: String): PCA =
    ReadWrite.applyParams(new PCA, path)
}

class PCAModel extends Model[PCAModel]
    with HasInputCol[PCAModel] with HasOutputCol[PCAModel] {

  final val k: Param[Int] =
    param[Int]("k", "Number of principal components.", 2, ParamValidators.gt(0))
  def getK: Int = get(k)

  final val whiten: Param[Boolean] =
    param[Boolean]("whiten", "Scale each component by 1/sqrt(eigenvalue) so the output has identity covariance.", false)
  def getWhiten: Boolean = get(whiten)

  private var modelData: DataFrame = _
  override def setModelData(data: DataFrame*): PCAModel = { modelData = data.head; this }
  override def getModelData: Array[DataFrame] = Array(modelData)

  /** Eigenvalues of the kept components (variance each explains). */
  def explainedVariance: Array[Double] =
    modelData.select("eigenvalues").head().getAs[scala.collection.Seq[Double]](0).toArray

  override def transform(inputs: DataFrame*): Array[DataFrame] = {
    require(inputs.size == 1)
    val input = inputs.head
    val row = modelData.select("dim", "mean", "eigenvalues", "components").head()
    val d = row.getInt(0)
    val mean = row.getAs[scala.collection.Seq[Double]](1).toArray
    val eigenvalues = row.getAs[scala.collection.Seq[Double]](2).toArray
    val flat = row.getAs[scala.collection.Seq[Double]](3).toArray
    val kk = eigenvalues.length
    val whitenScale = Eigen.whitenScale(eigenvalues, getWhiten)
    val bc = input.sparkSession.sparkContext.broadcast((d, mean, flat, whitenScale))
    val project = udf { v: Vector =>
      val (dim, mu, comps, ws) = bc.value
      val a = v.toArray
      val out = new Array[Double](ws.length)
      var c = 0
      while (c < ws.length) {
        var s = 0.0
        var i = 0
        val off = c * dim
        while (i < dim) { s += comps(off + i) * (a(i) - mu(i)); i += 1 }
        out(c) = s * ws(c)
        c += 1
      }
      Vectors.dense(out)
    }
    Array(input.withColumn(getOutputCol, project(col(getInputCol))))
  }
}
object PCAModel extends StageLoader[PCAModel] {
  def load(spark: SparkSession, path: String): PCAModel = {
    val m = ReadWrite.applyParams(new PCAModel, path)
    m.setModelData(ReadWrite.loadModelData(spark, path))
  }
}
