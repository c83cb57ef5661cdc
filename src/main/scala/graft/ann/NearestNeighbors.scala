package graft.ann

import org.apache.spark.ml.linalg.Vector
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.api.{AlgoOperator, StageLoader}
import graft.param._
import graft.util.ReadWrite

private[ann] object CosineMath {
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
    val qs = queries.select(col(getIdCol).cast("long"), col(getVecCol)).as[(Long, Vector)]
      .collect().map { case (id, v) => (id, v, math.sqrt(CosineMath.dot(v, v))) }
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
    val qRows = queries.select(col(getIdCol).cast("long"), col(getVecCol)).as[(Long, Vector)]
      .collect()
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
