package graft.ann

import org.apache.spark.ml.linalg.Vector
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.api.{Estimator, Model, StageLoader}
import graft.param._
import graft.util.ReadWrite

/**
 * Persisted IVF index for cosine ANN: [[IvfIndexer.fit]] trains (or
 * accepts) a coarse codebook and assigns every corpus vector to its
 * inverted list ONCE; the resulting [[IvfIndexModel]] answers probe
 * batches of any size, survives save/load, and never re-reads or
 * re-clusters the corpus. The production counterpart of the one-shot
 * [[IvfCosineKnn]] (which bundles codebook training, assignment, and
 * a broadcast-probe pass per call — right for a handful of queries,
 * wasteful when the index is reused or the query side is large).
 *
 * Scale shape (100 TB design): transform is fully DISTRIBUTED — no
 * query collect. Queries pick their `nprobe` closest centroids via a
 * broadcast of the O(numLists·dim) codebook, explode to (query, cell)
 * rows, and EQUI-JOIN the assignments on the cell id (hash-partitioned
 * both sides; candidate work = Σ probed-list sizes, never all-pairs),
 * then window top-k per query. List-size skew is the classic IVF
 * trade-off: bounded by the coarse k-means balance, and `nprobe`
 * recall/cost is the published IVF dial (Johnson et al., IEEE Big
 * Data 2019 — the FAISS design).
 */
class IvfIndexer extends Estimator[IvfIndexer, IvfIndexModel] with HasSeed[IvfIndexer] {

  final val idCol: Param[String] = param[String]("idCol", "Id column (long).", "id")
  final val vecCol: Param[String] = param[String]("vecCol", "Vector column.", "vec")
  final val numLists: Param[Int] =
    param[Int]("numLists", "Number of inverted lists (coarse centroids).", 16,
      ParamValidators.gt(1))
  final val trainIters: Param[Int] =
    param[Int]("trainIters", "Lloyd iterations for the codebook; 0 uses the provided " +
      "initial centroids verbatim.", 10, ParamValidators.gtEq(0))
  final val quantizer: Param[String] =
    param[String]("quantizer", "List-storage codec: none (float64 vectors), int8 " +
      "(FAISS SQ8 — per-dim scalar quantization, ~8x smaller lists), pq (FAISS PQ — " +
      "one byte per subspace, ~dim/subspaces x smaller than int8). Probes always " +
      "score the full-precision query against the RECONSTRUCTED list vector " +
      "(asymmetric distance computation).", "none",
      ParamValidators.inArray("none", "int8", "pq"))
  final val pqSubspaces: Param[Int] =
    param[Int]("pqSubspaces", "PQ subvector blocks (quantizer=pq); dim must divide evenly.", 8,
      ParamValidators.gt(0))
  final val pqCodes: Param[Int] =
    param[Int]("pqCodes", "PQ codebook entries per subspace (quantizer=pq).", 256,
      (v: Int) => v > 0 && v <= 256)
  def setIdCol(v: String): IvfIndexer = set(idCol, v)
  def setVecCol(v: String): IvfIndexer = set(vecCol, v)
  def setNumLists(v: Int): IvfIndexer = set(numLists, v)
  def setTrainIters(v: Int): IvfIndexer = set(trainIters, v)
  def setQuantizer(v: String): IvfIndexer = set(quantizer, v)
  /** Sugar: `true` selects the int8 codec. */
  def setQuantize(v: Boolean): IvfIndexer = set(quantizer, if (v) "int8" else "none")
  def setPqSubspaces(v: Int): IvfIndexer = set(pqSubspaces, v)
  def setPqCodes(v: Int): IvfIndexer = set(pqCodes, v)
  def getIdCol: String = get(idCol)
  def getVecCol: String = get(vecCol)
  def getNumLists: Int = get(numLists)
  def getTrainIters: Int = get(trainIters)
  def getQuantizer: String = get(quantizer)
  def getPqSubspaces: Int = get(pqSubspaces)
  def getPqCodes: Int = get(pqCodes)

  private var initialCentroids: Option[DataFrame] = None
  def setInitialCentroids(df: DataFrame): IvfIndexer = { initialCentroids = Some(df); this }

  private var initialPqCodebooks: Option[DataFrame] = None
  /** Pin the PQ codebooks verbatim: (m, code, centroid array<double>). */
  def setInitialPqCodebooks(df: DataFrame): IvfIndexer = { initialPqCodebooks = Some(df); this }

  override def fit(inputs: DataFrame*): IvfIndexModel = {
    require(inputs.size == 1)
    val data = inputs.head
    val spark = data.sparkSession

    val centroidsDf: DataFrame = (initialCentroids, getTrainIters) match {
      case (Some(init), 0) => init.select("centroidId", "centroid")
      case (maybeInit, iters) =>
        val km = new graft.clustering.KMeans()
          .setK(getNumLists).setMaxIterK(math.max(iters, 1)).setSeed(getSeed)
          .setFeaturesCol(getVecCol)
        maybeInit.foreach(km.setInitialModelData)
        km.fit(data.select(col(getVecCol)))
          .getModelData.head.select("centroidId", "centroid")
    }
    val centroids = centroidsDf.orderBy("centroidId").collect()
      .map(r => (r.getAs[Number](0).intValue(), r.getAs[Vector]("centroid")))
    require(centroids.nonEmpty, "empty codebook")
    val bc = spark.sparkContext.broadcast(
      centroids.map { case (cid, c) => (cid, c, math.sqrt(CosineMath.dot(c, c))) })
    // emits the ACTUAL centroidId (not the array position): transform's
    // probeCells joins on centroidId, and user-supplied codebooks
    // (setInitialCentroids + trainIters=0) may be non-contiguous
    val cellOf = udf { v: Vector =>
      val cents = bc.value
      val vNorm = math.sqrt(CosineMath.dot(v, v))
      var best = 0; var bestSim = Double.NegativeInfinity
      var i = 0
      while (i < cents.length) {
        val (_, c, n) = cents(i)
        val sim = CosineMath.cosine(c, n, v, vNorm)
        if (sim > bestSim) { bestSim = sim; best = i }
        i += 1
      }
      cents(best)._1
    }
    val norm = udf { v: Vector => math.sqrt(CosineMath.dot(v, v)) }
    val slim = data
      .select(col(getIdCol).cast("long").as("id"), col(getVecCol).as("vec"))
      // cell assignment always uses the FULL-precision vector — the
      // codebook routing is cheap to keep exact; only list storage is
      // compressed
      .withColumn("cell", cellOf(col("vec")))

    val m = if (getQuantizer == "none") {
      val assignments = slim
        .withColumn("vnorm", norm(col("vec"))) // probe-time pairs pay ONE dot, not three
      new IvfIndexModel().setModelData(centroidsDf, assignments)
    } else if (getQuantizer == "pq") {
      // PQ codec: one byte per subspace. The codebooks (third model
      // frame) are O(pqCodes·dim) model data; vnorm is the
      // RECONSTRUCTION's norm so probe-time cosine is exact wrt the
      // stored codes.
      import org.apache.spark.sql.Column
      val pq = new ProductQuantizer()
        .setInputCol("varr").setOutputCol("codes")
        .setNumSubspaces(getPqSubspaces).setNumCodes(getPqCodes).setSeed(getSeed)
      initialPqCodebooks.foreach(pq.setInitialCodebooks)
      val withArr = slim.withColumn("varr",
        org.apache.spark.ml.functions.vector_to_array(col("vec")).cast("array<double>"))
      val pqm = pq.fit(withArr.select("varr"))
      val encoded = pqm.transform(withArr).head
      val assignments = encoded
        .withColumn("vnorm", sqrt(aggregate(col("codes_dequant"), lit(0.0),
          (acc: Column, e: Column) => acc + e * e)))
        .select("id", "cell", "codes", "vnorm")
      new IvfIndexModel().setModelData(centroidsDf, assignments, pqm.getModelData.head)
    } else {
      // int8 codec: COMPOSE ScalarQuantizer (one codec implementation,
      // not two that could drift) — its materialized (dim, lo, hi)
      // frame becomes the model's codec frame. vnorm is the
      // DEQUANTIZED vector's norm so probe-time cosine is exact with
      // respect to the stored (reconstructed) values.
      import org.apache.spark.sql.Column
      val withArr = slim.withColumn("varr",
        org.apache.spark.ml.functions.vector_to_array(col("vec")).cast("array<double>"))
      val sq = new ScalarQuantizer().setInputCol("varr").setOutputCol("codes")
        .fit(withArr.select("varr"))
      val assignments = sq.transform(withArr).head
        .withColumn("vnorm", sqrt(aggregate(col("codes_dequant"), lit(0.0),
          (acc: Column, e: Column) => acc + e * e)))
        .select("id", "cell", "codes", "vnorm")
      new IvfIndexModel().setModelData(centroidsDf, assignments, sq.getModelData.head)
    }
    copyParamsTo(m)
    m
  }
}
object IvfIndexer extends StageLoader[IvfIndexer] {
  def load(spark: SparkSession, path: String): IvfIndexer =
    ReadWrite.applyParams(new IvfIndexer, path)
}

/** Model data: (0) the codebook `(centroidId, centroid)`, (1) the
  * inverted lists `(id, vec, cell)` — or, for a quantized index,
  * `(id, cell, codes: array<tinyint>, vnorm)` plus (2) the codec's
  * model frame: per-dim ranges `(dim, lo, hi)` for int8, or PQ
  * codebooks `(m, code, centroid)` for pq. */
class IvfIndexModel extends Model[IvfIndexModel] {

  final val idCol: Param[String] = param[String]("idCol", "Id column (long).", "id")
  final val vecCol: Param[String] = param[String]("vecCol", "Vector column.", "vec")
  final val k: Param[Int] = param[Int]("k", "Neighbors per query.", 5, ParamValidators.gt(0))
  final val nprobe: Param[Int] =
    param[Int]("nprobe", "Number of inverted lists probed per query.", 2, ParamValidators.gt(0))
  def setK(v: Int): IvfIndexModel = set(k, v)
  def setNprobe(v: Int): IvfIndexModel = set(nprobe, v)
  def getIdCol: String = get(idCol)
  def getVecCol: String = get(vecCol)
  def getK: Int = get(k)
  def getNprobe: Int = get(nprobe)

  private var centroids: DataFrame = _
  private var assignments: DataFrame = _
  private var codec: DataFrame = _
  override def setModelData(data: DataFrame*): IvfIndexModel = {
    require(data.size == 2 || data.size == 3,
      "IvfIndexModel expects (centroids, assignments[, codecFrame])")
    centroids = data(0); assignments = data(1)
    codec = if (data.size == 3) data(2) else null
    this
  }
  override def getModelData: Array[DataFrame] =
    if (codec == null) Array(centroids, assignments)
    else Array(centroids, assignments, codec)

  // codec frame schema identifies the codec: (dim, lo, hi) = int8
  // scalar ranges; (m, code, centroid) = PQ codebooks
  private def codecKind: String =
    if (codec == null) "none"
    else if (codec.columns.contains("code")) "pq"
    else "int8"

  /** Probe: top-k cosine neighbors from the `nprobe` closest lists of
    * each query. Output: (query_id, neighbor_id, similarity). */
  override def transform(inputs: DataFrame*): Array[DataFrame] = {
    require(inputs.size == 1, "transform(queries)")
    val queries = inputs.head
    val spark = queries.sparkSession

    val cents = centroids.orderBy("centroidId").collect()
      .map(r => (r.getAs[Number](0).intValue(), r.getAs[Vector]("centroid")))
    val bc = spark.sparkContext.broadcast(
      cents.map { case (cid, c) => (cid, c, math.sqrt(CosineMath.dot(c, c))) })
    val np = math.min(getNprobe, cents.length)
    val probeCells = udf { v: Vector =>
      val cs = bc.value
      val vNorm = math.sqrt(CosineMath.dot(v, v))
      cs.map { case (cid, c, n) => (cid, CosineMath.cosine(c, n, v, vNorm)) }
        .sortBy { case (cid, sim) => (-sim, cid) }
        .take(np).map(_._1)
    }
    val norm = udf { v: Vector => math.sqrt(CosineMath.dot(v, v)) }
    val probes = queries
      .select(col(getIdCol).cast("long").as("query_id"), col(getVecCol).as("qvec"))
      .withColumn("qnorm", norm(col("qvec")))
      .withColumn("cell", explode(probeCells(col("qvec"))))

    // Cell-at-a-time scorer shared by both list layouts: per-query
    // top-k heaps over (similarity, id) with deterministic ties
    // (equal sim -> lower id wins).
    val kk = getK
    def scoreCell(qIt: Iterator[(Int, Long, Vector, Double)],
        dIt: Iterator[(Long, Array[Double], Double)]): Iterator[(Long, Long, Double)] = {
      val qs = qIt.map { case (_, qid, qv, qn) => (qid, qv.toArray, qn) }.toArray
      if (qs.isEmpty) Iterator.empty
      else {
        val ord = new java.util.Comparator[(Double, Long)] {
          override def compare(x: (Double, Long), y: (Double, Long)): Int = {
            val c = java.lang.Double.compare(x._1, y._1)
            if (c != 0) c else java.lang.Long.compare(y._2, x._2) // worst: low sim, HIGH id
          }
        }
        val heaps = qs.map(_ => new java.util.PriorityQueue[(Double, Long)](kk + 1, ord))
        dIt.foreach { case (id, a, vn) =>
          var qi = 0
          while (qi < qs.length) {
            val (_, qa, qn) = qs(qi)
            var s = 0.0
            var i = 0
            while (i < qa.length) { s += qa(i) * a(i); i += 1 }
            val sim = s / (qn * vn)
            val heap = heaps(qi)
            if (heap.size < kk) heap.add((sim, id))
            else {
              val worst = heap.peek()
              if (sim > worst._1 || (sim == worst._1 && id < worst._2)) {
                heap.poll(); heap.add((sim, id))
              }
            }
            qi += 1
          }
        }
        qs.iterator.zip(heaps.iterator).flatMap { case ((qid, _, _), heap) =>
          scala.jdk.CollectionConverters.IteratorHasAsScala(heap.iterator()).asScala
            .map { case (sim, id) => (qid, id, sim) }
        }
      }
    }

    // candidate generation is an EQUI-JOIN (cogroup) on the cell id —
    // work is bounded by the probed list sizes, never
    // |queries| x |corpus|. Pair scoring runs cell-at-a-time: each
    // vector is deserialized ONCE per cell (a flat join would
    // materialize+deserialize both vectors per PAIR — measured 4x
    // slower at 50k x 150k), then the inner loop is primitive-array
    // math into per-query heaps; only <= nprobe x k rows per query
    // reach the final shuffle, never the candidate relation
    import spark.implicits._
    val probesDs = probes.select(col("cell"), col("query_id"), col("qvec"), col("qnorm"))
      .as[(Int, Long, Vector, Double)]
    val partial = (if (codecKind == "none") {
      // older persisted indexes predate the vnorm column — derive it
      val asg =
        if (assignments.columns.contains("vnorm")) assignments
        else assignments.withColumn("vnorm", norm(col("vec")))
      val asgDs = asg.select(col("cell"), col("id"), col("vec"), col("vnorm"))
        .as[(Int, Long, Vector, Double)]
      probesDs.groupByKey(_._1).cogroup(asgDs.groupByKey(_._1)) { (_, qIt, dIt) =>
        scoreCell(qIt, dIt.map { case (_, id, v, vn) => (id, v.toArray, vn) })
      }
    } else if (codecKind == "pq") {
      // PQ lists: asymmetric distance computation — per (query, cell)
      // a [subspaces][codes] table of partial dot products is built
      // ONCE, and each list vector costs `subspaces` table lookups
      // instead of a d-wide dot. The candidate payload is one byte per
      // subspace.
      val books = new ProductQuantizerModel().setModelData(codec).collectBooks()
      val bBooks = spark.sparkContext.broadcast(books)
      val asgDs = assignments.select(col("cell"), col("id"), col("codes"), col("vnorm"))
        .as[(Int, Long, Seq[Byte], Double)]
      probesDs.groupByKey(_._1).cogroup(asgDs.groupByKey(_._1)) { (_, qIt, dIt) =>
        val bks = bBooks.value
        val m = bks.length
        val qs = qIt.map { case (_, qid, qv, qn) => (qid, qv.toArray, qn) }.toArray
        if (qs.isEmpty) Iterator.empty
        else {
          val expectDim = m * bks(0)(0).length
          qs.foreach { case (qid, qa, _) =>
            if (qa.length != expectDim) throw new IllegalArgumentException(
              s"IvfIndexModel: query $qid dim ${qa.length} does not match the PQ " +
                s"codebooks' $expectDim — an ADC score over a prefix would be silently wrong")
          }
          val sub = qs.head._2.length / m
          // ADC tables: tables(qi)(mi)(code) = dot(query subvector, centroid)
          val tables = qs.map { case (_, qa, _) =>
            Array.tabulate(m) { mi =>
              val book = bks(mi)
              Array.tabulate(book.length) { c =>
                var s = 0.0; var j = 0
                while (j < sub) { s += qa(mi * sub + j) * book(c)(j); j += 1 }
                s
              }
            }
          }
          val ord = new java.util.Comparator[(Double, Long)] {
            override def compare(x: (Double, Long), y: (Double, Long)): Int = {
              val c = java.lang.Double.compare(x._1, y._1)
              if (c != 0) c else java.lang.Long.compare(y._2, x._2)
            }
          }
          val kk2 = kk
          val heaps = qs.map(_ => new java.util.PriorityQueue[(Double, Long)](kk2 + 1, ord))
          dIt.foreach { case (_, id, codesSeq, vn) =>
            val codes = codesSeq.toArray
            var qi = 0
            while (qi < qs.length) {
              val t = tables(qi)
              var s = 0.0
              var mi = 0
              while (mi < m) { s += t(mi)(codes(mi) + 128); mi += 1 }
              val sim = s / (qs(qi)._3 * vn)
              val heap = heaps(qi)
              if (heap.size < kk2) heap.add((sim, id))
              else {
                val worst = heap.peek()
                if (sim > worst._1 || (sim == worst._1 && id < worst._2)) {
                  heap.poll(); heap.add((sim, id))
                }
              }
              qi += 1
            }
          }
          qs.iterator.zip(heaps.iterator).flatMap { case ((qid, _, _), heap) =>
            scala.jdk.CollectionConverters.IteratorHasAsScala(heap.iterator()).asScala
              .map { case (sim, id) => (qid, id, sim) }
          }
        }
      }
    } else {
      // int8 lists: the asymmetric-distance pass (full-precision query
      // vs DEQUANTIZED list vector, FAISS SQ8 style). Each list vector
      // is decoded ONCE per cell against the broadcast per-dim ranges —
      // the shuffled list payload is the 1-byte-per-dim code array.
      val rng = codec.orderBy("dim").collect()
        .map(r => (r.getDouble(1), r.getDouble(2)))
      val bLo = spark.sparkContext.broadcast(rng.map(_._1))
      val bHi = spark.sparkContext.broadcast(rng.map(_._2))
      val asgDs = assignments.select(col("cell"), col("id"), col("codes"), col("vnorm"))
        .as[(Int, Long, Seq[Byte], Double)]
      probesDs.groupByKey(_._1).cogroup(asgDs.groupByKey(_._1)) { (_, qIt, dIt) =>
        val lo = bLo.value; val hi = bHi.value
        scoreCell(qIt, dIt.map { case (_, id, qSeq, vn) =>
          val q = qSeq.toArray
          val a = new Array[Double](q.length)
          var j = 0
          while (j < q.length) {
            a(j) = if (hi(j) == lo(j)) lo(j)
            else (q(j).toDouble + 128.0) * (hi(j) - lo(j)) / 255.0 + lo(j)
            j += 1
          }
          (id, a, vn)
        })
      }
    }).toDF("query_id", "neighbor_id", "similarity")
    val w = Window.partitionBy("query_id")
      .orderBy(col("similarity").desc, col("neighbor_id").asc)
    Array(partial.withColumn("rank", row_number().over(w))
      .where(col("rank") <= kk)
      .select("query_id", "neighbor_id", "similarity"))
  }
}
object IvfIndexModel extends StageLoader[IvfIndexModel] {
  def load(spark: SparkSession, path: String): IvfIndexModel = {
    val m = ReadWrite.applyParams(new IvfIndexModel, path)
    val frames = (0 until ReadWrite.numModelDataTables(path))
      .map(i => ReadWrite.loadModelData(spark, path, i))
    m.setModelData(frames: _*)
  }
}
