package graft.benchmark

import org.apache.spark.ml.linalg.{Vector, Vectors}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Synthetic workload generators reproducing the reference benchmark
 * inputs (flink-ml-benchmark datagenerator/common: DenseVectorGenerator,
 * LabeledPointWithWeightGenerator, RandomStringGenerator — uniform
 * [0, 1) doubles, integer-arity categories, indexed string pools).
 *
 * Generation is partition-parallel and seed-deterministic: each
 * partition draws from java.util.Random(seed + partitionId), so a
 * 1000-executor cluster generates a 10⁹-row workload with no driver
 * involvement and no shuffle.
 */
object DataGenerators {

  /** numValues rows of a dense `vec` column with uniform [0,1) entries. */
  def denseVectors(spark: SparkSession, numValues: Long, vectorDim: Int, seed: Long,
      numPartitions: Int = 32): DataFrame = {
    import spark.implicits._
    spark.range(0, numValues, 1, numPartitions).rdd
      .mapPartitionsWithIndex { (pid, it) =>
        val rnd = new java.util.Random(seed + pid)
        it.map { _ =>
          val values = Array.fill(vectorDim)(rnd.nextDouble())
          Tuple1(Vectors.dense(values): Vector)
        }
      }.toDF("vec")
  }

  /** (features, label, weight) rows: integer-arity categorical values
    * when arity > 0, continuous uniform [0,1) when arity == 0 —
    * reference LabeledPointWithWeightGenerator semantics. */
  def labeledPoints(spark: SparkSession, numValues: Long, vectorDim: Int,
      featureArity: Int, labelArity: Int, seed: Long,
      numPartitions: Int = 32): DataFrame = {
    import spark.implicits._
    spark.range(0, numValues, 1, numPartitions).rdd
      .mapPartitionsWithIndex { (pid, it) =>
        val rnd = new java.util.Random(seed + pid)
        def draw(arity: Int): Double =
          if (arity > 0) rnd.nextInt(arity).toDouble else rnd.nextDouble()
        it.map { _ =>
          val features = Array.fill(vectorDim)(draw(featureArity))
          (Vectors.dense(features): Vector, draw(labelArity), rnd.nextDouble())
        }
      }.toDF("features", "label", "weight")
  }

  /** numValues rows of a `str` column drawn from numDistinct values. */
  def randomStrings(spark: SparkSession, numValues: Long, numDistinct: Int, seed: Long,
      numPartitions: Int = 32): DataFrame = {
    import spark.implicits._
    spark.range(0, numValues, 1, numPartitions).rdd
      .mapPartitionsWithIndex { (pid, it) =>
        val rnd = new java.util.Random(seed + pid)
        it.map(_ => Tuple1(s"str_${rnd.nextInt(numDistinct)}"))
      }.toDF("str")
  }

  /** numValues rows of `colNames` double columns: continuous uniform
    * [0,1) when arity == 0, else integer categories in [0, arity)
    * (reference DoubleGenerator semantics incl. the ARITY param). */
  def doubles(spark: SparkSession, numValues: Long, colNames: Seq[String], arity: Int,
      seed: Long, numPartitions: Int = 32): DataFrame = {
    val rdd = spark.range(0, numValues, 1, numPartitions).rdd
      .mapPartitionsWithIndex { (pid, it) =>
        val rnd = new java.util.Random(seed + pid)
        def draw(): Double = if (arity > 0) rnd.nextInt(arity).toDouble else rnd.nextDouble()
        it.map(_ => org.apache.spark.sql.Row.fromSeq(colNames.map(_ => draw())))
      }
    val schema = org.apache.spark.sql.types.StructType(colNames.map(c =>
      org.apache.spark.sql.types.StructField(c, org.apache.spark.sql.types.DoubleType)))
    spark.createDataFrame(rdd, schema)
  }

  /** numValues rows of a string-array column with arraySize elements
    * drawn from numDistinct integer-named values (reference
    * RandomStringArrayGenerator). */
  def randomStringArrays(spark: SparkSession, numValues: Long, arraySize: Int,
      numDistinct: Int, seed: Long, numPartitions: Int = 32): DataFrame = {
    import spark.implicits._
    spark.range(0, numValues, 1, numPartitions).rdd
      .mapPartitionsWithIndex { (pid, it) =>
        val rnd = new java.util.Random(seed + pid)
        it.map(_ => Tuple1(Array.fill(arraySize)(Integer.toString(rnd.nextInt(numDistinct)))))
      }.toDF("arr")
  }

  /** One KMeans model-data table of `arraySize` random centroids
    * (reference KMeansModelDataGenerator), shaped for our
    * KMeansModel.setModelData: (centroidId, centroid). */
  def kmeansModelData(spark: SparkSession, arraySize: Int, vectorDim: Int,
      seed: Long): DataFrame = {
    import spark.implicits._
    val rnd = new java.util.Random(seed)
    val rows = (0 until arraySize).map { i =>
      (i, Vectors.dense(Array.fill(vectorDim)(rnd.nextDouble())): Vector)
    }
    spark.createDataFrame(rows).toDF("centroidId", "centroid")
  }

  /** numValues rows of whitespace-joined token sentences. */
  def randomSentences(spark: SparkSession, numValues: Long, numDistinctTokens: Int,
      tokensPerRow: Int, seed: Long, numPartitions: Int = 32): DataFrame = {
    import spark.implicits._
    spark.range(0, numValues, 1, numPartitions).rdd
      .mapPartitionsWithIndex { (pid, it) =>
        val rnd = new java.util.Random(seed + pid)
        it.map { _ =>
          Tuple1(Array.fill(tokensPerRow)(s"tok${rnd.nextInt(numDistinctTokens)}").mkString(" "))
        }
      }.toDF("text")
  }

  private val Stopwords = Array("the", "and", "of", "to", "in", "is", "that", "for", "with", "as")

  /** Deterministic pseudo-word for a vocabulary slot (3–8 lowercase letters). */
  private def word(vocabSeed: Long, slot: Int): String = {
    val r = new java.util.Random(vocabSeed * 7919L + slot)
    val n = 3 + r.nextInt(6)
    val sb = new java.lang.StringBuilder(n)
    var i = 0
    while (i < n) { sb.append(('a' + r.nextInt(26)).toChar); i += 1 }
    sb.toString
  }

  /** Skewed vocabulary draw (quadratic bias toward low slots) with a
    * 30% stopword mix — enough shingle sharing to look like text. */
  private def drawToken(rnd: java.util.Random, vocabSeed: Long, vocabSize: Int): String =
    if (rnd.nextDouble() < 0.3) Stopwords(rnd.nextInt(Stopwords.length))
    else word(vocabSeed, (vocabSize * rnd.nextDouble() * rnd.nextDouble()).toInt)

  /**
   * A documents-like corpus (doc_id, text, source) with PLANTED
   * duplicate structure for dedup scale-up runs: ids are grouped in
   * fives — members 0–2 are unique ~tokensPerDoc-token documents,
   * member 3 is an EXACT duplicate of member 0, member 4 is a
   * NEAR-duplicate of member 0 (every 10th token resubstituted, so
   * 3-gram Jaccard stays well above 0.5). Every row's text is a pure
   * function of (seed, ids): generation is partition-parallel,
   * shuffle-free, and reproducible at any scale.
   */
  def documentsLike(spark: SparkSession, numDocs: Long, tokensPerDoc: Int = 50,
      vocabSize: Int = 20000, seed: Long = 7L, numPartitions: Int = 32): DataFrame = {
    import spark.implicits._
    spark.range(0, numDocs, 1, numPartitions).rdd
      .map { boxedId =>
        val id = boxedId.toLong
        val group = id / 5
        val member = (id % 5).toInt
        val baseId = if (member >= 3) group * 5 else id
        val rnd = new java.util.Random(seed ^ (baseId * 0x9E3779B97F4A7C15L))
        val tokens = Array.fill(tokensPerDoc)(drawToken(rnd, seed, vocabSize))
        if (member == 4) {
          // near-dup: deterministic resubstitution of every 10th token
          val mut = new java.util.Random(seed ^ (id * 0x9E3779B97F4A7C15L))
          var i = 0
          while (i < tokens.length) { tokens(i) = drawToken(mut, seed, vocabSize); i += 10 }
        }
        (id, tokens.mkString(" "), s"src_${group % 5}")
      }.toDF("doc_id", "text", "source")
  }

  /**
   * An embeddings-like table (vec_id, vec) with planted cosine
   * near-duplicates: ids grouped in fours, member 3 = member 0 plus
   * N(0, 0.01) noise (cosine ≈ 0.999 at dim ≥ 32); other members are
   * independent uniform vectors. Same pure-function-of-ids shape as
   * [[documentsLike]].
   */
  def embeddingsLike(spark: SparkSession, numVecs: Long, dim: Int = 64,
      seed: Long = 11L, numPartitions: Int = 32): DataFrame = {
    import spark.implicits._
    spark.range(0, numVecs, 1, numPartitions).rdd
      .map { boxedId =>
        val id = boxedId.toLong
        val group = id / 4
        val member = (id % 4).toInt
        val baseId = if (member == 3) group * 4 else id
        val rnd = new java.util.Random(seed ^ (baseId * 0x9E3779B97F4A7C15L))
        val values = Array.fill(dim)(rnd.nextDouble() - 0.5)
        if (member == 3) {
          val noise = new java.util.Random(seed ^ (id * 0x9E3779B97F4A7C15L))
          var i = 0
          while (i < dim) { values(i) += noise.nextGaussian() * 0.01; i += 1 }
        }
        (id, Vectors.dense(values): Vector)
      }.toDF("vec_id", "vec")
  }

  /**
   * Embeddings with planted COMMUNITY structure — the input shape for
   * measuring the semantic-communities composition (LSH edge graph →
   * label propagation) at scale, vs [[embeddingsLike]]'s isolated
   * near-dup PAIRS: ids are grouped in `clusterSize` blocks, every
   * member = the block's base vector (uniform in [-0.5, 0.5)^dim)
   * plus per-dim N(0, noise²) jitter. Within-block cosine
   * concentrates near 1/(1 + 12·noise²) (≈ 0.971 at noise 0.05);
   * cross-block cosine is ~N(0, 1/dim) (σ ≈ 0.125 at dim 64), so a
   * 0.9 threshold separates the two populations by >5σ. Pure
   * function of (seed, id): partition-parallel, shuffle-free,
   * reproducible.
   */
  def clusteredEmbeddingsLike(spark: SparkSession, numVecs: Long, dim: Int = 64,
      clusterSize: Int = 8, noise: Double = 0.05, seed: Long = 21L,
      numPartitions: Int = 32): DataFrame = {
    import spark.implicits._
    spark.range(0, numVecs, 1, numPartitions).rdd
      .map { boxedId =>
        val id = boxedId.toLong
        val cluster = id / clusterSize
        val rnd = new java.util.Random(seed ^ (cluster * 0x9E3779B97F4A7C15L))
        val values = Array.fill(dim)(rnd.nextDouble() - 0.5)
        val jit = new java.util.Random(seed ^ (id * 0xC2B2AE3D27D4EB4FL))
        var i = 0
        while (i < dim) { values(i) += jit.nextGaussian() * noise; i += 1 }
        (id, Vectors.dense(values): Vector)
      }.toDF("vec_id", "vec")
  }

  /**
   * A (user, item) behavior table with ZIPFIAN item popularity —
   * the catalog shape Swing's maxUserNumPerItem cap exists for
   * (the TPC-H-ish test tables are uniform: max 53 purchasers/item,
   * so the cap never binds there). Items are drawn log-uniformly:
   * item = ⌊exp(U·ln N)⌋, giving count(item x) ∝ 1/x — item 0 is
   * bought by nearly every user while the tail is sparse, so with
   * E events over N items roughly E/(cap·ln N) items exceed a
   * purchaser cap. Users are uniform. Pure function of (seed, row
   * id): partition-parallel, shuffle-free, reproducible.
   */
  def behaviorsLike(spark: SparkSession, numEvents: Long, numUsers: Long,
      numItems: Long, seed: Long = 13L, numPartitions: Int = 32): DataFrame = {
    import spark.implicits._
    val logN = math.log(numItems.toDouble)
    spark.range(0, numEvents, 1, numPartitions).rdd
      .map { boxedId =>
        val id = boxedId.toLong
        val rnd = new java.util.Random(seed ^ (id * 0x9E3779B97F4A7C15L))
        val user = (rnd.nextDouble() * numUsers).toLong
        val item = math.min(numItems - 1, math.exp(rnd.nextDouble() * logN).toLong - 1L)
        (user, math.max(0L, item))
      }.toDF("user", "item")
  }
}
