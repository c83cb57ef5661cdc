package graft.ann

import org.apache.spark.ml.linalg.Vector
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.api.{AlgoOperator, StageLoader}
import graft.param._
import graft.util.ReadWrite

private[ann] object CosineMath {
  /** Query-side rows are collected and broadcast (queries are the
    * SMALL side: a probe batch, a dedup seed set); this cap fails a
    * mistakenly huge probe set fast instead of OOMing the driver —
    * the KnnModel.MaxProbes pattern. 100k dim-1k doubles ≈ 800 MB,
    * the edge of comfortable broadcast. */
  val MaxQueries = 100000

  /** Collect at most MaxQueries+1 rows and reject oversized sets. */
  def collectQueries(ds: org.apache.spark.sql.Dataset[(Long, Vector)]): Array[(Long, Vector)] = {
    val rows = ds.limit(MaxQueries + 1).collect()
    require(rows.length <= MaxQueries,
      s"query side exceeds $MaxQueries rows; broadcast-probe ANN needs a small query side — " +
        "batch the probes, or swap the sides if the data side is the smaller one")
    rows
  }

  def dot(a: Vector, b: Vector): Double = graft.linalg.BLAS.dot(a, b)

  def cosine(a: Vector, aNorm: Double, b: Vector, bNorm: Double): Double = {
    if (aNorm == 0.0 || bNorm == 0.0) 0.0
    else dot(a, b) / (aNorm * bNorm)
  }

  /** Per-partition bounded top-k heaps, one per query — the map-side
    * combine that makes the global top-k a merge of partitions×k rows
    * instead of a full shuffle of rows×queries similarities. */
  def partitionTopK(
      it: Iterator[(Long, Vector)],
      queries: Array[(Long, Vector, Double)],
      k: Int): Iterator[(Long, Long, Double)] = {
    val heaps = queries.map(_ => new java.util.PriorityQueue[(Double, Long)](
      k + 1, (x: (Double, Long), y: (Double, Long)) => java.lang.Double.compare(x._1, y._1)))
    it.foreach { case (id, v) =>
      val vNorm = math.sqrt(dot(v, v))
      var qi = 0
      while (qi < queries.length) {
        val (_, qv, qNorm) = queries(qi)
        val sim = cosine(qv, qNorm, v, vNorm)
        val heap = heaps(qi)
        if (heap.size < k) heap.add((sim, id))
        else if (sim > heap.peek()._1) { heap.poll(); heap.add((sim, id)) }
        qi += 1
      }
    }
    queries.iterator.zip(heaps.iterator).flatMap { case ((qid, _, _), heap) =>
      scala.jdk.CollectionConverters.IteratorHasAsScala(heap.iterator()).asScala
        .map { case (sim, id) => (qid, id, sim) }
    }
  }
}

/**
 * Brute-force cosine top-k neighbor join — the exact baseline for
 * embedding similarity search. transform(data, queries) returns
 * (query_id, neighbor_id, similarity): for each query row, the k data
 * rows with the highest cosine similarity.
 *
 * Scale shape: the query side is broadcast (queries are the small
 * side: a probe batch, a dedup seed set); the data side streams
 * through per-partition bounded heaps (no rows×queries shuffle), and
 * the final exact top-k merges only partitions×queries×k candidates.
 */
class BruteForceCosineKnn extends AlgoOperator[BruteForceCosineKnn] {

  final val idCol: Param[String] = param[String]("idCol", "Id column (long).", "id")
  final val vecCol: Param[String] = param[String]("vecCol", "Vector column.", "vec")
  final val k: Param[Int] = param[Int]("k", "Neighbors per query.", 5, ParamValidators.gt(0))
  def setIdCol(v: String): BruteForceCosineKnn = set(idCol, v)
  def setVecCol(v: String): BruteForceCosineKnn = set(vecCol, v)
  def setK(v: Int): BruteForceCosineKnn = set(k, v)
  def getIdCol: String = get(idCol)
  def getVecCol: String = get(vecCol)
  def getK: Int = get(k)

  override def transform(inputs: DataFrame*): Array[DataFrame] = {
    require(inputs.size == 2, "transform(data, queries)")
    val Seq(data, queries) = inputs.toSeq
    val spark = data.sparkSession
    import spark.implicits._
    val qs = CosineMath.collectQueries(
      queries.select(col(getIdCol).cast("long"), col(getVecCol)).as[(Long, Vector)])
      .map { case (id, v) => (id, v, math.sqrt(CosineMath.dot(v, v))) }
    val bc = spark.sparkContext.broadcast(qs)
    val kk = getK
    val partial = data.select(col(getIdCol).cast("long"), col(getVecCol)).as[(Long, Vector)]
      .mapPartitions(it => CosineMath.partitionTopK(it, bc.value, kk))
      .toDF("query_id", "neighbor_id", "similarity")
    val w = Window.partitionBy("query_id")
      .orderBy(col("similarity").desc, col("neighbor_id").asc)
    Array(partial.withColumn("rank", row_number().over(w)).where(col("rank") <= kk)
      .select("query_id", "neighbor_id", "similarity"))
  }
}
object BruteForceCosineKnn extends StageLoader[BruteForceCosineKnn] {
  def load(spark: SparkSession, path: String): BruteForceCosineKnn =
    ReadWrite.applyParams(new BruteForceCosineKnn, path)
}

/**
 * Random-hyperplane (sign) LSH approximate neighbor join — the scale
 * path when even one streaming pass per probe batch is too much. Each
 * vector's bucket is the sign pattern of `numPlanes` seeded random
 * hyperplane projections; only data rows whose bucket matches some
 * query bucket are scored, so the scored candidate set shrinks
 * exponentially in numPlanes while cosine-close vectors keep
 * colliding (collision probability (1 − θ/π)^numPlanes).
 *
 * Approximate by construction: recall < 1 for non-identical vectors.
 */
class CosineLshKnn extends AlgoOperator[CosineLshKnn] with HasSeed[CosineLshKnn] {

  final val idCol: Param[String] = param[String]("idCol", "Id column (long).", "id")
  final val vecCol: Param[String] = param[String]("vecCol", "Vector column.", "vec")
  final val k: Param[Int] = param[Int]("k", "Neighbors per query.", 5, ParamValidators.gt(0))
  final val numPlanes: Param[Int] =
    param[Int]("numPlanes", "Number of random hyperplanes (bucket bits).", 8,
      ParamValidators.inRange(1, 63))
  def setIdCol(v: String): CosineLshKnn = set(idCol, v)
  def setVecCol(v: String): CosineLshKnn = set(vecCol, v)
  def setK(v: Int): CosineLshKnn = set(k, v)
  def setNumPlanes(v: Int): CosineLshKnn = set(numPlanes, v)
  def getIdCol: String = get(idCol)
  def getVecCol: String = get(vecCol)
  def getK: Int = get(k)
  def getNumPlanes: Int = get(numPlanes)

  override def transform(inputs: DataFrame*): Array[DataFrame] = {
    require(inputs.size == 2, "transform(data, queries)")
    val Seq(data, queries) = inputs.toSeq
    val spark = data.sparkSession
    import spark.implicits._
    val qRows = CosineMath.collectQueries(
      queries.select(col(getIdCol).cast("long"), col(getVecCol)).as[(Long, Vector)])
    require(qRows.nonEmpty, "query side must not be empty")
    val dim = qRows.head._2.size
    // Gaussian hyperplanes from the seed — model-free and reproducible
    val rnd = new java.util.Random(getSeed)
    val planes = Array.fill(getNumPlanes, dim)(rnd.nextGaussian())

    def bucket(v: Vector): Long = {
      var b = 0L
      var p = 0
      while (p < planes.length) {
        var s = 0.0
        var i = 0
        val plane = planes(p)
        while (i < dim) { s += plane(i) * v(i); i += 1 }
        if (s > 0) b |= (1L << p)
        p += 1
      }
      b
    }

    val qs = qRows.map { case (id, v) => (id, v, math.sqrt(CosineMath.dot(v, v)), bucket(v)) }
    val qBuckets = qs.map(_._4).toSet
    val bc = spark.sparkContext.broadcast((qs, qBuckets, planes))
    val kk = getK
    val partial = data.select(col(getIdCol).cast("long"), col(getVecCol)).as[(Long, Vector)]
      .mapPartitions { it =>
        val (queriesB, buckets, _) = bc.value
        // score only candidates sharing a bucket with some query, and
        // within those only against the matching-bucket queries
        val byBucket = queriesB.groupBy(_._4)
        it.flatMap { case (id, v) =>
          val b = bucket(v)
          if (!buckets.contains(b)) Iterator.empty
          else {
            val vNorm = math.sqrt(CosineMath.dot(v, v))
            byBucket(b).iterator.map { case (qid, qv, qNorm, _) =>
              (qid, id, CosineMath.cosine(qv, qNorm, v, vNorm))
            }
          }
        }
      }
      .toDF("query_id", "neighbor_id", "similarity")
    val w = Window.partitionBy("query_id")
      .orderBy(col("similarity").desc, col("neighbor_id").asc)
    Array(partial.withColumn("rank", row_number().over(w)).where(col("rank") <= kk)
      .select("query_id", "neighbor_id", "similarity"))
  }
}
object CosineLshKnn extends StageLoader[CosineLshKnn] {
  def load(spark: SparkSession, path: String): CosineLshKnn =
    ReadWrite.applyParams(new CosineLshKnn, path)
}

/**
 * IVF (inverted-file) approximate neighbor join — the classic
 * coarse-quantizer scale path: a small k-means codebook partitions the
 * corpus into `numLists` cells; each query scores only the rows whose
 * cell is among the query's `nprobe` closest centroids (by cosine,
 * ties to the lower centroid id). Recall grows with nprobe;
 * nprobe = numLists degenerates to exact brute force.
 *
 * The codebook comes from [[graft.clustering.KMeans]] on the data
 * side (euclidean Lloyd — the standard IVF training), or from
 * `setInitialCentroids` with trainIters=0 for a fixed, reproducible
 * codebook.
 *
 * Scale shape (100 TB design): the codebook and the probe batch are
 * both broadcast — O(numLists·dim + queries·dim) per task — and the
 * data side streams through ONE mapPartitions pass that assigns the
 * row's cell and scores it against only the queries probing that
 * cell, feeding per-partition bounded top-k heaps. No shuffle of the
 * corpus, no rows×queries blow-up; the global merge handles
 * partitions×queries×k candidate rows.
 */
class IvfCosineKnn extends AlgoOperator[IvfCosineKnn] with HasSeed[IvfCosineKnn] {

  final val trainIters: Param[Int] =
    param[Int]("trainIters", "Lloyd iterations for the codebook; 0 uses the provided " +
      "initial centroids verbatim.", 10, ParamValidators.gtEq(0))
  def getTrainIters: Int = get(trainIters)
  def setTrainIters(v: Int): IvfCosineKnn = set(trainIters, v)

  final val idCol: Param[String] = param[String]("idCol", "Id column (long).", "id")
  final val vecCol: Param[String] = param[String]("vecCol", "Vector column.", "vec")
  final val k: Param[Int] = param[Int]("k", "Neighbors per query.", 5, ParamValidators.gt(0))
  final val numLists: Param[Int] =
    param[Int]("numLists", "Number of inverted lists (coarse centroids).", 16,
      ParamValidators.gt(1))
  final val nprobe: Param[Int] =
    param[Int]("nprobe", "Number of lists probed per query.", 2, ParamValidators.gt(0))
  def setIdCol(v: String): IvfCosineKnn = set(idCol, v)
  def setVecCol(v: String): IvfCosineKnn = set(vecCol, v)
  def setK(v: Int): IvfCosineKnn = set(k, v)
  def setNumLists(v: Int): IvfCosineKnn = set(numLists, v)
  def setNprobe(v: Int): IvfCosineKnn = set(nprobe, v)
  def getIdCol: String = get(idCol)
  def getVecCol: String = get(vecCol)
  def getK: Int = get(k)
  def getNumLists: Int = get(numLists)
  def getNprobe: Int = get(nprobe)

  // fixed codebook for reproducible runs; with maxIter=0 it is used as-is
  private var initialCentroids: Option[DataFrame] = None
  def setInitialCentroids(df: DataFrame): IvfCosineKnn = { initialCentroids = Some(df); this }

  override def transform(inputs: DataFrame*): Array[DataFrame] = {
    require(inputs.size == 2, "transform(data, queries)")
    val Seq(data, queries) = inputs.toSeq
    val spark = data.sparkSession
    import spark.implicits._

    val centroids: Array[Vector] = (initialCentroids, getTrainIters) match {
      case (Some(init), 0) =>
        init.orderBy("centroidId").collect().map(_.getAs[Vector]("centroid"))
      case (maybeInit, iters) =>
        val km = new graft.clustering.KMeans()
          .setK(getNumLists).setMaxIterK(math.max(iters, 1)).setSeed(getSeed)
          .setFeaturesCol(getVecCol)
        maybeInit.foreach(km.setInitialModelData)
        km.fit(data.select(col(getVecCol)))
          .getModelData.head.orderBy("centroidId").collect()
          .map(_.getAs[Vector]("centroid"))
    }
    require(centroids.length > 0, "empty codebook")
    val cNorms = centroids.map(c => math.sqrt(CosineMath.dot(c, c)))

    val qRows = CosineMath.collectQueries(
      queries.select(col(getIdCol).cast("long"), col(getVecCol)).as[(Long, Vector)])
    require(qRows.nonEmpty, "query side must not be empty")
    val qs = qRows.map { case (id, v) => (id, v, math.sqrt(CosineMath.dot(v, v))) }
    val np = math.min(getNprobe, centroids.length)
    // per query: the nprobe closest centroids (cosine desc, id asc)
    val cellToQueries: Map[Int, Array[Int]] = qs.zipWithIndex.flatMap { case ((_, v, n), qi) =>
      centroids.indices
        .map(ci => (ci, CosineMath.cosine(centroids(ci), cNorms(ci), v, n)))
        .sortBy { case (ci, sim) => (-sim, ci) }
        .take(np)
        .map { case (ci, _) => (ci, qi) }
    }.groupBy(_._1).map { case (ci, arr) => ci -> arr.map(_._2) }

    val bc = spark.sparkContext.broadcast((qs, centroids, cNorms, cellToQueries))
    val kk = getK
    val partial = data.select(col(getIdCol).cast("long"), col(getVecCol)).as[(Long, Vector)]
      .mapPartitions { it =>
        val (queriesB, cents, norms, cellQ) = bc.value
        val heaps = queriesB.map(_ => new java.util.PriorityQueue[(Double, Long)](
          kk + 1, (x: (Double, Long), y: (Double, Long)) => java.lang.Double.compare(x._1, y._1)))
        def cellOf(v: Vector, vNorm: Double): Int = {
          var best = 0; var bestSim = Double.NegativeInfinity
          var i = 0
          while (i < cents.length) {
            val sim = CosineMath.cosine(cents(i), norms(i), v, vNorm)
            if (sim > bestSim) { bestSim = sim; best = i }
            i += 1
          }
          best
        }
        it.foreach { case (id, v) =>
          val vNorm = math.sqrt(CosineMath.dot(v, v))
          val cell = cellOf(v, vNorm)
          cellQ.get(cell).foreach { qids =>
            var j = 0
            while (j < qids.length) {
              val qi = qids(j)
              val (_, qv, qNorm) = queriesB(qi)
              val sim = CosineMath.cosine(qv, qNorm, v, vNorm)
              val heap = heaps(qi)
              if (heap.size < kk) heap.add((sim, id))
              else if (sim > heap.peek()._1) { heap.poll(); heap.add((sim, id)) }
              j += 1
            }
          }
        }
        queriesB.iterator.zip(heaps.iterator).flatMap { case ((qid, _, _), heap) =>
          scala.jdk.CollectionConverters.IteratorHasAsScala(heap.iterator()).asScala
            .map { case (sim, id) => (qid, id, sim) }
        }
      }
      .toDF("query_id", "neighbor_id", "similarity")
    val w = Window.partitionBy("query_id")
      .orderBy(col("similarity").desc, col("neighbor_id").asc)
    Array(partial.withColumn("rank", row_number().over(w)).where(col("rank") <= kk)
      .select("query_id", "neighbor_id", "similarity"))
  }
}
object IvfCosineKnn extends StageLoader[IvfCosineKnn] {
  def load(spark: SparkSession, path: String): IvfCosineKnn =
    ReadWrite.applyParams(new IvfCosineKnn, path)
}
