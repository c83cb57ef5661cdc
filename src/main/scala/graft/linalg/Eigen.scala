package graft.linalg

import org.apache.commons.math3.linear.{Array2DRowRealMatrix, EigenDecomposition}

/**
 * Second-moment accumulation and eigendecomposition shared by
 * [[graft.feature.PCA]] (one-pass batch fit) and
 * [[graft.streaming.OnlinePCA]] (cumulative per-window fit): both
 * reduce the data to `(n, Σx, packed-upper-triangular Σxxᵀ)` — the
 * O(d²) sufficient statistic for the sample covariance — and
 * eigendecompose on the driver. No reference counterpart
 * (beyond-reference LLM-data-pipeline tier); the moment/treeAggregate
 * shape matches what spark.ml's own RowMatrix.computeCovariance does.
 *
 * Packed layout: row i of the upper triangle starts at
 * `i*d - i*(i-1)/2 - i`, entry (i,j≥i) lives at `start + j`.
 */
object Eigen {

  def triLen(d: Int): Int = d * (d + 1) / 2

  /** Fold one vector into (sum, packed gram) in place. */
  def accumulate(s: Array[Double], g: Array[Double], a: Array[Double], d: Int): Unit = {
    var i = 0
    while (i < d) {
      s(i) += a(i)
      var j = i
      val base = i * d - i * (i - 1) / 2 - i
      while (j < d) { g(base + j) += a(i) * a(j); j += 1 }
      i += 1
    }
  }

  /** Fold (s2, g2) into (s1, g1) in place. */
  def merge(s1: Array[Double], g1: Array[Double],
      s2: Array[Double], g2: Array[Double]): Unit = {
    var i = 0
    while (i < s1.length) { s1(i) += s2(i); i += 1 }
    i = 0
    while (i < g1.length) { g1(i) += g2(i); i += 1 }
  }

  /** (mean, sample covariance) from the packed moments.
    * covariance = (G - n μμᵀ) / (n - 1); requires n > 1. */
  def covFromMoments(n: Long, sum: Array[Double], tri: Array[Double],
      d: Int): (Array[Double], Array[Array[Double]]) = {
    require(n > 1, s"covariance needs at least 2 rows, got $n")
    val mean = sum.map(_ / n)
    val cov = Array.ofDim[Double](d, d)
    var i = 0
    while (i < d) {
      var j = i
      val base = i * d - i * (i - 1) / 2 - i
      while (j < d) {
        val c = (tri(base + j) - n * mean(i) * mean(j)) / (n - 1)
        cov(i)(j) = c; cov(j)(i) = c
        j += 1
      }
      i += 1
    }
    (mean, cov)
  }

  /** Per-component projection scales: all-ones, or 1/sqrt(eigenvalue)
    * when whitening (eigenvalues floored at 1e-12) — ONE copy of the
    * convention shared by batch PCA and OnlinePCA. */
  def whitenScale(eigenvalues: Array[Double], whiten: Boolean): Array[Double] =
    if (whiten) eigenvalues.map(ev => 1.0 / math.sqrt(math.max(ev, 1e-12)))
    else Array.fill(eigenvalues.length)(1.0)

  /** Top-k eigenpairs of a symmetric matrix, eigenvalues descending,
    * each eigenvector's sign normalized so its largest-magnitude
    * coordinate is positive (eigenvectors are only defined up to
    * sign; this is the conventional deterministic fix). */
  def topK(cov: Array[Array[Double]], k: Int): (Array[Double], Array[Array[Double]]) = {
    val eig = new EigenDecomposition(new Array2DRowRealMatrix(cov, false))
    val order = eig.getRealEigenvalues.zipWithIndex.sortBy(-_._1).take(k)
    val eigenvalues = order.map(_._1)
    val components = order.map { case (_, idx) =>
      val v = eig.getEigenvector(idx).toArray
      val m = v.indices.maxBy(ii => math.abs(v(ii)))
      if (v(m) < 0) v.map(-_) else v
    }
    (eigenvalues, components)
  }
}
