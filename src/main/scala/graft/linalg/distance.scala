package graft.linalg

import org.apache.spark.ml.linalg.{DenseVector, SparseVector, Vector, Vectors}

/**
 * Vector with cached L2 norm, used for distance pruning in KMeans
 * (reference servable-core linalg/VectorWithNorm and
 * clustering/kmeans/KMeans.java:286-301).
 */
case class VectorWithNorm(vector: Vector, norm: Double) extends Serializable
object VectorWithNorm {
  def apply(v: Vector): VectorWithNorm = VectorWithNorm(v, Vectors.norm(v, 2.0))
}

/**
 * Distance measures: euclidean | manhattan | cosine
 * (reference servable-core org/apache/flink/ml/common/distance/ *.java).
 */
trait DistanceMeasure extends Serializable {
  def distance(a: VectorWithNorm, b: VectorWithNorm): Double

  /** Index of the closest centroid; norm-based pruning where applicable. */
  def findClosest(centroids: Array[VectorWithNorm], point: VectorWithNorm): Int = {
    var best = 0
    var bestDist = Double.MaxValue
    var i = 0
    while (i < centroids.length) {
      val d = distance(centroids(i), point)
      if (d < bestDist) { bestDist = d; best = i }
      i += 1
    }
    best
  }
}

object DistanceMeasure {
  def apply(name: String): DistanceMeasure = name.toLowerCase match {
    case "euclidean" => EuclideanDistance
    case "manhattan" => ManhattanDistance
    case "cosine"    => CosineDistance
    case other       => sys.error(s"Unsupported distance measure $other")
  }
}

object EuclideanDistance extends DistanceMeasure {
  override def distance(a: VectorWithNorm, b: VectorWithNorm): Double =
    math.sqrt(Vectors.sqdist(a.vector, b.vector))

  /** Triangle-inequality pruning using cached norms. */
  override def findClosest(centroids: Array[VectorWithNorm], point: VectorWithNorm): Int = {
    var best = 0
    var bestDist = Double.MaxValue
    var i = 0
    while (i < centroids.length) {
      val c = centroids(i)
      val lb = c.norm - point.norm
      if (lb * lb < bestDist) {
        val d2 = Vectors.sqdist(c.vector, point.vector)
        if (d2 < bestDist) { bestDist = d2; best = i }
      }
      i += 1
    }
    best
  }
}

object ManhattanDistance extends DistanceMeasure {
  override def distance(a: VectorWithNorm, b: VectorWithNorm): Double = {
    val x = a.vector.toArray; val y = b.vector.toArray
    var s = 0.0; var i = 0
    while (i < x.length) { s += math.abs(x(i) - y(i)); i += 1 }
    s
  }
}

object CosineDistance extends DistanceMeasure {
  override def distance(a: VectorWithNorm, b: VectorWithNorm): Double = {
    require(a.norm > 0 && b.norm > 0, "Cosine distance is undefined for zero vectors")
    1.0 - BLAS.dot(a.vector, b.vector) / (a.norm * b.norm)
  }
}

/**
 * Small dense/sparse BLAS subset (reference servable-core
 * linalg/BLAS.java:26-179). Spark's own BLAS is private[spark]; these
 * loops are JIT-friendly and only used inside row-level closures.
 */
object BLAS extends Serializable {
  def dot(a: Vector, b: Vector): Double = (a, b) match {
    case (x: DenseVector, y: DenseVector) =>
      val xa = x.values; val ya = y.values
      var s = 0.0; var i = 0
      while (i < xa.length) { s += xa(i) * ya(i); i += 1 }
      s
    case (x: SparseVector, y: DenseVector) => sparseDenseDot(x, y)
    case (x: DenseVector, y: SparseVector) => sparseDenseDot(y, x)
    case (x: SparseVector, y: SparseVector) =>
      val xi = x.indices; val xv = x.values
      val yi = y.indices; val yv = y.values
      var s = 0.0; var i = 0; var j = 0
      while (i < xi.length && j < yi.length) {
        if (xi(i) == yi(j)) { s += xv(i) * yv(j); i += 1; j += 1 }
        else if (xi(i) < yi(j)) i += 1
        else j += 1
      }
      s
  }

  private def sparseDenseDot(x: SparseVector, y: DenseVector): Double = {
    val xi = x.indices; val xv = x.values; val ya = y.values
    var s = 0.0; var i = 0
    while (i < xi.length) { s += xv(i) * ya(xi(i)); i += 1 }
    s
  }

  /** y += alpha * x (y dense, in place). */
  def axpy(alpha: Double, x: Vector, y: Array[Double]): Unit = x match {
    case d: DenseVector =>
      val xv = d.values
      var i = 0; while (i < xv.length) { y(i) += alpha * xv(i); i += 1 }
    case s: SparseVector =>
      val xi = s.indices; val xv = s.values
      var i = 0; while (i < xi.length) { y(xi(i)) += alpha * xv(i); i += 1 }
  }

  def scal(alpha: Double, x: Array[Double]): Unit = {
    var i = 0; while (i < x.length) { x(i) *= alpha; i += 1 }
  }

  def norm(v: Vector, p: Double): Double = Vectors.norm(v, p)
}
