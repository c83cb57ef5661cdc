package graft.ann

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.api.{Estimator, Model, StageLoader}
import graft.param._
import graft.util.ReadWrite

/**
 * Product quantization of embedding columns (Jégou et al., "Product
 * Quantization for Nearest Neighbor Search", TPAMI 2011 — the FAISS
 * PQ codec): the d-dim vector splits into `numSubspaces` contiguous
 * subvectors, each encoded as the index of its nearest entry in a
 * per-subspace codebook of `numCodes` centroids. Storage per vector
 * drops from 8·d bytes (float64) to `numSubspaces` bytes — 64× at
 * d=64, M=8 — while distances survive as sums of per-subspace partial
 * dot products (asymmetric distance computation, ADC).
 *
 * `fit` trains the per-subspace codebooks with Lloyd iterations on a
 * driver-side SAMPLE of the corpus (`trainSample` rows — the standard
 * PQ practice; codebooks are O(M·numCodes·d/M) = O(numCodes·d), model
 * data, and k-means on a bounded sample is a driver computation, not
 * a cluster one). The collect is gated by `trainSample`.
 * `setInitialCodebooks` pins codebooks verbatim (for oracle-exact
 * replays and externally-trained codecs).
 *
 * `transform` appends the code array (`outputCol`, array<tinyint>,
 * code − 128) and the reconstruction (`outputCol_dequant`) for
 * distance computation — mirroring [[ScalarQuantizer]]'s surface.
 *
 * Scale shape: encoding is a broadcast-codebook map (no shuffle);
 * at M=8, d=64 each row costs M·numCodes·(d/M) = numCodes·d mults.
 *
 * No reference counterpart — beyond-reference LLM-data-pipeline tier.
 */
class ProductQuantizer extends Estimator[ProductQuantizer, ProductQuantizerModel]
    with HasInputCol[ProductQuantizer] with HasOutputCol[ProductQuantizer]
    with HasSeed[ProductQuantizer] {

  final val numSubspaces: Param[Int] =
    param[Int]("numSubspaces", "Number of subvector blocks (M); dim must divide evenly.", 8,
      ParamValidators.gt(0))
  def getNumSubspaces: Int = get(numSubspaces)
  def setNumSubspaces(v: Int): ProductQuantizer = set(numSubspaces, v)

  final val numCodes: Param[Int] =
    param[Int]("numCodes", "Codebook entries per subspace (≤ 256 — one byte per code).", 256,
      (v: Int) => v > 0 && v <= 256)
  def getNumCodes: Int = get(numCodes)
  def setNumCodes(v: Int): ProductQuantizer = set(numCodes, v)

  final val trainIters: Param[Int] =
    param[Int]("trainIters", "Lloyd iterations per subspace codebook.", 10,
      ParamValidators.gtEq(1))
  def getTrainIters: Int = get(trainIters)
  def setTrainIters(v: Int): ProductQuantizer = set(trainIters, v)

  final val trainSample: Param[Int] =
    param[Int]("trainSample",
      "Max corpus rows collected to the driver for codebook training (the gate on the " +
        "only collect in fit).", 20000, ParamValidators.gt(0))
  def getTrainSample: Int = get(trainSample)
  def setTrainSample(v: Int): ProductQuantizer = set(trainSample, v)

  private var initialCodebooks: Option[DataFrame] = None
  /** Pin codebooks verbatim: (m, code, centroid array<double>) — skips training. */
  def setInitialCodebooks(df: DataFrame): ProductQuantizer = { initialCodebooks = Some(df); this }

  override def fit(inputs: DataFrame*): ProductQuantizerModel = {
    require(inputs.size == 1)
    val data = inputs.head
    val spark = data.sparkSession
    import spark.implicits._

    val codebooksDf = initialCodebooks match {
      case Some(df) => df.select(col("m"), col("code"), col("centroid").cast("array<double>"))
      case None =>
        // gated sample → driver Lloyd per subspace. limit() bounds the
        // collect by construction; sampling is deterministic under seed.
        val sample = data.select(col(getInputCol).cast("array<double>"))
          .where(col(getInputCol).isNotNull)
          .limit(getTrainSample).collect().map(_.getSeq[Double](0).toArray)
        require(sample.nonEmpty, "ProductQuantizer: empty training input")
        val d = sample.head.length
        val m = getNumSubspaces
        require(d % m == 0, s"ProductQuantizer: dim $d not divisible by numSubspaces $m")
        val sub = d / m
        val k = math.min(getNumCodes, sample.length)
        val rnd = new java.util.Random(getSeed)
        val books = (0 until m).flatMap { mi =>
          val subvecs = sample.map(v => java.util.Arrays.copyOfRange(v, mi * sub, (mi + 1) * sub))
          // seeded init: k distinct sample subvectors
          val cents = rnd.ints(0, subvecs.length).distinct().limit(k)
            .toArray.map(i => subvecs(i).clone())
          var it = 0
          while (it < getTrainIters) {
            val sums = Array.fill(k)(new Array[Double](sub))
            val counts = new Array[Long](k)
            subvecs.foreach { v =>
              var best = 0; var bestD = Double.MaxValue
              var c = 0
              while (c < k) {
                var dd = 0.0; var j = 0
                while (j < sub) { val t = v(j) - cents(c)(j); dd += t * t; j += 1 }
                if (dd < bestD) { bestD = dd; best = c }
                c += 1
              }
              counts(best) += 1
              var j = 0
              while (j < sub) { sums(best)(j) += v(j); j += 1 }
            }
            var c = 0
            while (c < k) {
              if (counts(c) > 0) {
                var j = 0
                while (j < sub) { cents(c)(j) = sums(c)(j) / counts(c); j += 1 }
              }
              c += 1
            }
            it += 1
          }
          cents.zipWithIndex.map { case (cv, code) => (mi, code, cv.toSeq) }
        }
        books.toDF("m", "code", "centroid")
    }
    val model = new ProductQuantizerModel().setModelData(codebooksDf)
    copyParamsTo(model)
    model
  }
}
object ProductQuantizer extends StageLoader[ProductQuantizer] {
  def load(spark: SparkSession, path: String): ProductQuantizer =
    ReadWrite.applyParams(new ProductQuantizer, path)
}

/** Applies the fitted codebooks. Model data: (m, code, centroid array<double>). */
class ProductQuantizerModel extends Model[ProductQuantizerModel]
    with HasInputCol[ProductQuantizerModel] with HasOutputCol[ProductQuantizerModel] {

  private var codebooks: DataFrame = _
  override def setModelData(data: DataFrame*): ProductQuantizerModel = {
    codebooks = data.head; this
  }
  override def getModelData: Array[DataFrame] = Array(codebooks)

  /** Driver copy of the codebooks as [m][code][subdim] (O(numCodes·d)). */
  private[ann] def collectBooks(): Array[Array[Array[Double]]] = {
    val rows = codebooks.select(col("m").cast("int"), col("code").cast("int"),
        col("centroid").cast("array<double>")).collect()
    val m = rows.map(_.getInt(0)).max + 1
    val books = Array.ofDim[Array[Array[Double]]](m)
    rows.groupBy(_.getInt(0)).foreach { case (mi, rs) =>
      val sorted = rs.sortBy(_.getInt(1))
      require(sorted.zipWithIndex.forall { case (r, i) => r.getInt(1) == i },
        s"ProductQuantizer: subspace $mi codes are not contiguous from 0")
      books(mi) = sorted.map(_.getSeq[Double](2).toArray)
    }
    books
  }

  override def transform(inputs: DataFrame*): Array[DataFrame] = {
    require(inputs.size == 1)
    val spark = inputs.head.sparkSession
    val bc = spark.sparkContext.broadcast(collectBooks())
    val encode = udf { v: Seq[Double] =>
      if (v == null) null
      else {
      val books = bc.value
      val m = books.length
      val expectDim = m * books(0)(0).length
      if (v.length != expectDim) throw new IllegalArgumentException(
        s"ProductQuantizer: vector dim ${v.length} does not match the codebooks' " +
          s"$m x ${books(0)(0).length} = $expectDim — truncated encoding would be silently wrong")
      val sub = v.length / m
      val arr = v.toArray
      val codes = new Array[Byte](m)
      val recon = new Array[Double](v.length)
      var mi = 0
      while (mi < m) {
        val book = books(mi)
        var best = 0; var bestD = Double.MaxValue
        var c = 0
        while (c < book.length) {
          var dd = 0.0; var j = 0
          while (j < sub) { val t = arr(mi * sub + j) - book(c)(j); dd += t * t; j += 1 }
          if (dd < bestD) { bestD = dd; best = c }
          c += 1
        }
        codes(mi) = (best - 128).toByte
        var j = 0
        while (j < sub) { recon(mi * sub + j) = book(best)(j); j += 1 }
        mi += 1
      }
      // Seq[Byte] -> array<tinyint> (Array[Byte] would map to binary)
      (codes.toSeq: Seq[Byte], recon.toSeq: Seq[Double])
      }
    }
    val enc = encode(col(getInputCol).cast("array<double>"))
    Array(inputs.head
      .withColumn("__pq", enc)
      .withColumn(getOutputCol, col("__pq._1"))
      .withColumn(getOutputCol + "_dequant", col("__pq._2"))
      .drop("__pq"))
  }
}
object ProductQuantizerModel extends StageLoader[ProductQuantizerModel] {
  def load(spark: SparkSession, path: String): ProductQuantizerModel = {
    val m = ReadWrite.applyParams(new ProductQuantizerModel, path)
    m.setModelData(ReadWrite.loadModelData(spark, path))
  }
}
