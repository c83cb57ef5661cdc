package graft.feature

import org.apache.spark.ml.linalg.{DenseVector, SparseVector, Vector, Vectors}
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import graft.api._
import graft.param._
import graft.util.ReadWrite

// ---------------------------------------------------------------------------
// Imputer
// ---------------------------------------------------------------------------

object ImputerStrategy {
  val MEAN = "mean"
  val MEDIAN = "median"
  val MOST_FREQUENT = "most_frequent"
}

/**
 * Imputer: fill missing values (missingValue or NaN or null) in numeric
 * columns with the column mean / median / most frequent value.
 * Reference: feature/imputer/Imputer.java:63 (strategy aggregators).
 */
class Imputer extends Estimator[Imputer, ImputerModel]
    with HasInputCols[Imputer] with HasOutputCols[Imputer]
    with HasRelativeError[Imputer] {

  final val strategy: Param[String] =
    param[String]("strategy", "Imputation strategy: mean|median|most_frequent",
      ImputerStrategy.MEAN,
      ParamValidators.inArray(ImputerStrategy.MEAN, ImputerStrategy.MEDIAN, ImputerStrategy.MOST_FREQUENT))
  final val missingValue: Param[Double] =
    param[Double]("missingValue", "The placeholder for missing values", Double.NaN)
  def setStrategy(v: String): Imputer = set(strategy, v)
  def setMissingValue(v: Double): Imputer = set(missingValue, v)
  def getStrategy: String = get(strategy)
  def getMissingValue: Double = get(missingValue)

  override def fit(inputs: DataFrame*): ImputerModel = {
    require(inputs.size == 1)
    require(getInputCols.length == getOutputCols.length)
    val df = inputs.head
    val miss = getMissingValue
    val cols = getInputCols

    def valid(c: String) = {
      val base = col(c).cast("double")
      val notMissing = if (miss.isNaN) !isnan(base) else base =!= miss && !isnan(base)
      when(base.isNotNull && notMissing, base)
    }

    def requireComputable(i: Int, ok: Boolean): Unit = require(ok,
      s"Imputer surrogate cannot be computed: input column '${cols(i)}' contains no valid values")

    val surrogates: Array[Double] = getStrategy match {
      case ImputerStrategy.MEAN =>
        val row = df.select(cols.map(c => avg(valid(c)).as(c)).toIndexedSeq: _*).head()
        cols.indices.map { i => requireComputable(i, !row.isNullAt(i)); row.getDouble(i) }.toArray
      case ImputerStrategy.MEDIAN =>
        val acc = math.max(1, (1.0 / getRelativeError).toInt)
        val row = df.select(cols.map(c =>
          percentile_approx(valid(c), lit(0.5), lit(acc)).as(c)).toIndexedSeq: _*).head()
        cols.indices.map { i => requireComputable(i, !row.isNullAt(i)); row.getDouble(i) }.toArray
      case ImputerStrategy.MOST_FREQUENT =>
        // one shuffle for all cols: (colIdx, value) counts; tie → smallest value
        val counts = df.select(posexplode(array(cols.map(valid).toIndexedSeq: _*)).as(Seq("ci", "v")))
          .where(col("v").isNotNull)
          .groupBy("ci", "v").agg(count(lit(1)).as("cnt"))
          .collect()
        val byCol = counts.groupBy(_.getInt(0))
        cols.indices.map { i =>
          requireComputable(i, byCol.contains(i))
          byCol(i).map(r => (r.getDouble(1), r.getLong(2))).minBy { case (v, c) => (-c, v) }._1
        }.toArray
    }

    val spark = df.sparkSession
    import spark.implicits._
    val modelDf = cols.zip(surrogates).toSeq.toDF("columnName", "surrogate")
    val m = new ImputerModel().setModelData(modelDf)
    copyParamsTo(m)
    m
  }
}
object Imputer extends StageLoader[Imputer] {
  def load(spark: SparkSession, path: String): Imputer = ReadWrite.applyParams(new Imputer, path)
}

class ImputerModel extends Model[ImputerModel]
    with HasInputCols[ImputerModel] with HasOutputCols[ImputerModel] {

  final val missingValue: Param[Double] =
    param[Double]("missingValue", "The placeholder for missing values", Double.NaN)
  def getMissingValue: Double = get(missingValue)

  private var modelData: DataFrame = _
  override def setModelData(data: DataFrame*): ImputerModel = { modelData = data.head; this }
  override def getModelData: Array[DataFrame] = Array(modelData)

  override def transform(inputs: DataFrame*): Array[DataFrame] = {
    require(inputs.size == 1)
    val surrogates = modelData.select("columnName", "surrogate").collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    val miss = getMissingValue
    var out = inputs.head
    getInputCols.zip(getOutputCols).foreach { case (in, o) =>
      val s = surrogates(in)
      val base = col(in).cast("double")
      val isMissing =
        if (miss.isNaN) base.isNull || isnan(base)
        else base.isNull || isnan(base) || base === miss
      out = out.withColumn(o, when(isMissing, lit(s)).otherwise(base))
    }
    Array(out)
  }
}
object ImputerModel extends StageLoader[ImputerModel] {
  def load(spark: SparkSession, path: String): ImputerModel = {
    val m = ReadWrite.applyParams(new ImputerModel, path)
    m.setModelData(ReadWrite.loadModelData(spark, path))
  }
}

// ---------------------------------------------------------------------------
// OneHotEncoder
// ---------------------------------------------------------------------------

/**
 * OneHotEncoder: category index columns → sparse indicator vectors.
 * Model data = (colIdx, maxIndex); output vector size = maxIndex +
 * (dropLast ? 0 : 1); an index equal to the vector size yields the
 * all-zero vector. Reference: feature/onehotencoder/OneHotEncoder.java:74,
 * OneHotEncoderModel.java (GenerateOutputsFunction).
 */
class OneHotEncoder extends Estimator[OneHotEncoder, OneHotEncoderModel]
    with HasInputCols[OneHotEncoder] with HasOutputCols[OneHotEncoder] {

  final val dropLast: Param[Boolean] =
    param[Boolean]("dropLast", "Whether to drop the last category", true)
  def setDropLast(v: Boolean): OneHotEncoder = set(dropLast, v)
  def getDropLast: Boolean = get(dropLast)

  override def fit(inputs: DataFrame*): OneHotEncoderModel = {
    require(inputs.size == 1)
    val df = inputs.head
    val cols = getInputCols
    // one aggregation pass per fit: the max index AND a witness of any
    // non-indexed value (fractional, negative, or NaN) per column —
    // checking only the max would let an interior 0.5 through, where
    // the reference rejects any non-indexed train value
    // (OneHotEncoderTest.java testNonIndexedTrainData). NaN needs its
    // own arm: NaN = NaN holds in Spark SQL, so `d =!= floor(d)` is
    // false for NaN and it would otherwise flow into max() (where NaN
    // sorts greatest) and silently truncate to 0.
    val row = df.select(cols.flatMap { c =>
      val d = col(c).cast("double")
      Seq(max(when(!isnan(d), d)).as(s"max_$c"),
        max(when(d =!= floor(d) || d < 0 || isnan(d), d)).as(s"bad_$c"))
    }.toIndexedSeq: _*).head()
    val maxIndices = cols.indices.map { i =>
      require(row.isNullAt(2 * i + 1),
        s"Value ${row.getDouble(2 * i + 1)} cannot be parsed as indexed integer.")
      val m = row.getDouble(2 * i)
      (i, m.toInt)
    }
    val spark = df.sparkSession
    import spark.implicits._
    val modelDf = maxIndices.toDF("colIdx", "maxIndex")
    val m = new OneHotEncoderModel().setModelData(modelDf)
    copyParamsTo(m)
    m
  }
}
object OneHotEncoder extends StageLoader[OneHotEncoder] {
  def load(spark: SparkSession, path: String): OneHotEncoder =
    ReadWrite.applyParams(new OneHotEncoder, path)
}

class OneHotEncoderModel extends Model[OneHotEncoderModel]
    with HasInputCols[OneHotEncoderModel] with HasOutputCols[OneHotEncoderModel] {

  final val dropLast: Param[Boolean] =
    param[Boolean]("dropLast", "Whether to drop the last category", true)
  def getDropLast: Boolean = get(dropLast)

  private var modelData: DataFrame = _
  override def setModelData(data: DataFrame*): OneHotEncoderModel = { modelData = data.head; this }
  override def getModelData: Array[DataFrame] = Array(modelData)

  override def transform(inputs: DataFrame*): Array[DataFrame] = {
    require(inputs.size == 1)
    val maxIdx = modelData.select("colIdx", "maxIndex").collect()
      .map(r => r.getInt(0) -> r.getInt(1)).toMap
    val offset = if (getDropLast) 0 else 1
    var out = inputs.head
    getInputCols.zip(getOutputCols).zipWithIndex.foreach { case ((in, o), i) =>
      val max = maxIdx(i)
      val size = max + offset
      val enc = udf { n: java.lang.Double =>
        if (n == null) null
        else {
          require(n.doubleValue() == n.intValue().toDouble,
            s"Value $n cannot be parsed as indexed integer.")
          val idx = n.intValue()
          // only the dropped-last category (dropLast=true, idx == max ==
          // size) maps to the all-zero vector; anything past the fitted
          // range is an unseen category and fails loudly
          require(idx >= 0 && idx <= max,
            s"Index $idx is out of the fitted range [0, $max] for column '$in'.")
          if (idx == size) Vectors.sparse(size, Array.empty[Int], Array.empty[Double])
          else Vectors.sparse(size, Array(idx), Array(1.0))
        }
      }
      out = out.withColumn(o, enc(col(in).cast("double")))
    }
    Array(out)
  }
}
object OneHotEncoderModel extends StageLoader[OneHotEncoderModel] {
  def load(spark: SparkSession, path: String): OneHotEncoderModel = {
    val m = ReadWrite.applyParams(new OneHotEncoderModel, path)
    m.setModelData(ReadWrite.loadModelData(spark, path))
  }
}

// ---------------------------------------------------------------------------
// VectorIndexer
// ---------------------------------------------------------------------------

/**
 * VectorIndexer: per-dimension categorical detection — dims with at
 * most maxCategories distinct values are mapped to indices (ascending
 * order, except 0.0 always maps to index 0 for sparsity); other dims
 * pass through. Reference: feature/vectorindexer/VectorIndexer.java:91.
 */
class VectorIndexer extends Estimator[VectorIndexer, VectorIndexerModel]
    with HasInputCol[VectorIndexer] with HasOutputCol[VectorIndexer]
    with HasHandleInvalid[VectorIndexer] {

  final val maxCategories: Param[Int] =
    param[Int]("maxCategories", "Max distinct values for a categorical dim", 20, ParamValidators.gtEq(2))
  def setMaxCategories(v: Int): VectorIndexer = set(maxCategories, v)
  def getMaxCategories: Int = get(maxCategories)

  override def fit(inputs: DataFrame*): VectorIndexerModel = {
    require(inputs.size == 1)
    val df = inputs.head
    val maxCat = getMaxCategories
    // capped per-partition distinct tracking: a dim stops collecting
    // the moment it exceeds maxCategories (size == maxCat+1 is the
    // "continuous" marker), so a continuous dimension costs maxCat+1
    // entries instead of its full value set. Decision-equivalent to an
    // uncapped distinct: a truly-categorical dim (≤ maxCat distinct)
    // never hits the cap in any partition, so its exact value set
    // survives the union. The old posexplode → collect_set shape
    // hauled every distinct double of every continuous dim through
    // the shuffle — 57 s on the 10M×dim-10 uniform reference
    // workload; this pass runs in scan time (~2 s).
    val agg = df.select(col(getInputCol)).rdd
      .map(_.getAs[Vector](0)).filter(_ != null)
      .treeAggregate(Array.empty[scala.collection.mutable.HashSet[Double]])(
        (acc, v) => {
          val a = if (acc.isEmpty)
            Array.fill(v.size)(new scala.collection.mutable.HashSet[Double]) else acc
          require(v.size == a.length,
            s"VectorIndexer.fit: inconsistent vector dimensions (${v.size} vs ${a.length})")
          var i = 0
          while (i < a.length) {
            if (a(i).size <= maxCat) a(i) += v(i)
            i += 1
          }
          a
        },
        (a, b) =>
          if (a.isEmpty) b
          else if (b.isEmpty) a
          else {
            require(a.length == b.length,
              s"VectorIndexer.fit: inconsistent vector dimensions (${a.length} vs ${b.length})")
            var i = 0
            while (i < a.length) {
              if (a(i).size <= maxCat) {
                val it = b(i).iterator
                while (it.hasNext && a(i).size <= maxCat) a(i) += it.next()
              }
              i += 1
            }
            a
          })
    val distincts = agg.zipWithIndex.map { case (s, dim) => (dim, s.toArray) }

    val entries = distincts.flatMap { case (dim, values) =>
      if (values.length <= maxCat) {
        java.util.Arrays.sort(values)
        // 0.0 (if present) moves to index 0; others keep ascending order
        val zeroAt = java.util.Arrays.binarySearch(values, 0.0)
        val ordered =
          if (zeroAt >= 0) 0.0 +: (values.take(zeroAt) ++ values.drop(zeroAt + 1))
          else values
        ordered.zipWithIndex.map { case (v, i) => (dim, v, i) }
      } else Array.empty[(Int, Double, Int)]
    }

    val spark = df.sparkSession
    import spark.implicits._
    val modelDf = entries.toSeq.toDF("dim", "value", "index")
    val m = new VectorIndexerModel().setModelData(modelDf)
    copyParamsTo(m)
    m
  }
}
object VectorIndexer extends StageLoader[VectorIndexer] {
  def load(spark: SparkSession, path: String): VectorIndexer =
    ReadWrite.applyParams(new VectorIndexer, path)
}

class VectorIndexerModel extends Model[VectorIndexerModel]
    with HasInputCol[VectorIndexerModel] with HasOutputCol[VectorIndexerModel]
    with HasHandleInvalid[VectorIndexerModel] {

  private var modelData: DataFrame = _
  override def setModelData(data: DataFrame*): VectorIndexerModel = { modelData = data.head; this }
  override def getModelData: Array[DataFrame] = Array(modelData)

  override def transform(inputs: DataFrame*): Array[DataFrame] = {
    require(inputs.size == 1)
    val df = inputs.head
    val maps: Map[Int, Map[Double, Int]] = modelData.select("dim", "value", "index").collect()
      .groupBy(_.getInt(0))
      .map { case (d, rows) => d -> rows.map(r => r.getDouble(1) -> r.getInt(2)).toMap }
    val bc = df.sparkSession.sparkContext.broadcast(maps)
    val invalid = getHandleInvalid
    // A sparse input can skip its implicit zeros only when every
    // categorical dim maps 0.0 -> 0 (fit pins 0.0 to index 0 whenever it
    // was seen, so this is the common case); an unseen 0.0 must take the
    // keep/skip/error action for every implicit zero, which needs the
    // dense walk. Preserving sparsity here is what keeps dim-10^6
    // one-hot-style vectors from exploding 10^6-wide in the output.
    val zeroSafe: Boolean = maps.valuesIterator.forall(_.get(0.0).contains(0))
    def indexOf(cat: Map[Double, Int], x: Double, bad: () => Unit): Double =
      cat.get(x) match {
        case Some(idx) => idx.toDouble
        case None => invalid match {
          case HandleInvalid.KEEP => cat.size.toDouble
          case HandleInvalid.SKIP => bad(); 0.0
          case _ => throw new RuntimeException(
            s"The input contains unseen double: $x. See handleInvalid parameter for more options.")
        }
      }
    val f = udf { v: Vector =>
      if (v == null) null
      else {
        val m = bc.value
        var bad = false
        val markBad = () => { bad = true }
        v match {
          case sv: SparseVector if zeroSafe =>
            val out = new Array[Double](sv.indices.length)
            var j = 0
            while (j < sv.indices.length) {
              out(j) = m.get(sv.indices(j)) match {
                case Some(cat) => indexOf(cat, sv.values(j), markBad)
                case None      => sv.values(j) // continuous dim passes through
              }
              j += 1
            }
            if (bad) null else Vectors.sparse(sv.size, sv.indices, out)
          case _ =>
            val a = v.toArray
            val out = new Array[Double](a.length)
            var i = 0
            while (i < a.length) {
              out(i) = m.get(i) match {
                case Some(cat) => indexOf(cat, a(i), markBad)
                case None      => a(i)
              }
              i += 1
            }
            if (bad) null else Vectors.dense(out)
        }
      }
    }
    var out = df.withColumn(getOutputCol, f(col(getInputCol)))
    if (invalid == HandleInvalid.SKIP)
      out = out.filter(col(getOutputCol).isNotNull || col(getInputCol).isNull)
    Array(out)
  }
}
object VectorIndexerModel extends StageLoader[VectorIndexerModel] {
  def load(spark: SparkSession, path: String): VectorIndexerModel = {
    val m = ReadWrite.applyParams(new VectorIndexerModel, path)
    m.setModelData(ReadWrite.loadModelData(spark, path))
  }
}

// ---------------------------------------------------------------------------
// VarianceThresholdSelector
// ---------------------------------------------------------------------------

/**
 * VarianceThresholdSelector: drop vector dims whose sample variance is
 * <= varianceThreshold (strictly greater survive).
 * Reference: feature/variancethresholdselector/VarianceThresholdSelector.java:65.
 */
class VarianceThresholdSelector
    extends Estimator[VarianceThresholdSelector, VarianceThresholdSelectorModel]
    with HasInputCol[VarianceThresholdSelector] with HasOutputCol[VarianceThresholdSelector] {

  final val varianceThreshold: Param[Double] =
    param[Double]("varianceThreshold", "Dims with variance <= threshold are removed", 0.0,
      ParamValidators.gtEq(0))
  def setVarianceThreshold(v: Double): VarianceThresholdSelector = set(varianceThreshold, v)
  def getVarianceThreshold: Double = get(varianceThreshold)

  override def fit(inputs: DataFrame*): VarianceThresholdSelectorModel = {
    require(inputs.size == 1)
    val df = inputs.head
    val stats = VectorStats.compute(df, getInputCol)
    val std = stats.std
    val keep = std.indices.filter(i => std(i) * std(i) > getVarianceThreshold).toArray
    val spark = df.sparkSession
    import spark.implicits._
    val modelDf = Seq((stats.sum.length, keep)).toDF("numFeatures", "indices")
    val m = new VarianceThresholdSelectorModel().setModelData(modelDf)
    copyParamsTo(m)
    m
  }
}
object VarianceThresholdSelector extends StageLoader[VarianceThresholdSelector] {
  def load(spark: SparkSession, path: String): VarianceThresholdSelector =
    ReadWrite.applyParams(new VarianceThresholdSelector, path)
}

class VarianceThresholdSelectorModel extends Model[VarianceThresholdSelectorModel]
    with HasInputCol[VarianceThresholdSelectorModel] with HasOutputCol[VarianceThresholdSelectorModel] {

  private var modelData: DataFrame = _
  override def setModelData(data: DataFrame*): VarianceThresholdSelectorModel = { modelData = data.head; this }
  override def getModelData: Array[DataFrame] = Array(modelData)

  override def transform(inputs: DataFrame*): Array[DataFrame] = {
    require(inputs.size == 1)
    val keep = modelData.select("indices").head().getSeq[Int](0).toArray
    val slicer = udf { v: Vector =>
      v match {
        case null => null
        case d: DenseVector => Vectors.dense(keep.map(d.apply))
        case s: SparseVector =>
          val pairs = keep.zipWithIndex.flatMap { case (orig, ni) =>
            val x = s(orig); if (x != 0.0) Some((ni, x)) else None
          }
          Vectors.sparse(keep.length, pairs.map(_._1), pairs.map(_._2))
      }
    }
    Array(inputs.head.withColumn(getOutputCol, slicer(col(getInputCol))))
  }
}
object VarianceThresholdSelectorModel extends StageLoader[VarianceThresholdSelectorModel] {
  def load(spark: SparkSession, path: String): VarianceThresholdSelectorModel = {
    val m = ReadWrite.applyParams(new VarianceThresholdSelectorModel, path)
    m.setModelData(ReadWrite.loadModelData(spark, path))
  }
}

// ---------------------------------------------------------------------------
// KBinsDiscretizer
// ---------------------------------------------------------------------------

object KBinsStrategy {
  val UNIFORM = "uniform"
  val QUANTILE = "quantile"
  val KMEANS = "kmeans"
}

/**
 * KBinsDiscretizer: bin each vector dimension into numBins buckets;
 * strategy uniform (min/max widths), quantile (evenly spaced ranks on
 * a subsample), kmeans (1-D k-means on a subsample). Constant dims get
 * edges (-inf, +inf) → all zero. Duplicate bin edges are collapsed.
 * Reference: feature/kbinsdiscretizer/KBinsDiscretizer.java:87.
 */
class KBinsDiscretizer extends Estimator[KBinsDiscretizer, KBinsDiscretizerModel]
    with HasInputCol[KBinsDiscretizer] with HasOutputCol[KBinsDiscretizer]
    with HasSeed[KBinsDiscretizer] {

  final val numBins: Param[Int] =
    param[Int]("numBins", "Number of bins to produce", 5, ParamValidators.gtEq(2))
  final val strategy: Param[String] =
    param[String]("strategy", "Bin width strategy: uniform|quantile|kmeans",
      KBinsStrategy.QUANTILE,
      ParamValidators.inArray(KBinsStrategy.UNIFORM, KBinsStrategy.QUANTILE, KBinsStrategy.KMEANS))
  final val subSamples: Param[Int] =
    param[Int]("subSamples", "Max samples used for quantile/kmeans strategies", 200000, ParamValidators.gtEq(2))
  def setNumBins(v: Int): KBinsDiscretizer = set(numBins, v)
  def setStrategy(v: String): KBinsDiscretizer = set(strategy, v)
  def setSubSamples(v: Int): KBinsDiscretizer = set(subSamples, v)
  def getNumBins: Int = get(numBins)
  def getStrategy: String = get(strategy)
  def getSubSamples: Int = get(subSamples)

  override def fit(inputs: DataFrame*): KBinsDiscretizerModel = {
    require(inputs.size == 1)
    val df = inputs.head
    val k = getNumBins

    val binEdges: Array[Array[Double]] = getStrategy match {
      case KBinsStrategy.UNIFORM =>
        val stats = VectorStats.compute(df, getInputCol)
        stats.min.indices.map { d =>
          val (lo, hi) = (stats.min(d), stats.max(d))
          if (lo == hi) Array(Double.NegativeInfinity, Double.PositiveInfinity)
          else {
            val width = (hi - lo) / k
            val e = new Array[Double](k + 1)
            e(0) = lo
            var i = 1; while (i <= k) { e(i) = e(i - 1) + width; i += 1 }
            e
          }
        }.toArray
      case s =>
        val sample = df.select(col(getInputCol)).rdd
          .map(_.getAs[Vector](0)).filter(_ != null)
          .takeSample(withReplacement = false, getSubSamples, getSeed)
        require(sample.nonEmpty, "The training set is empty.")
        val dims = sample.head.size
        Array.tabulate(dims) { d =>
          val feats = sample.map(_(d)).sorted
          if (feats.head == feats.last) Array(Double.NegativeInfinity, Double.PositiveInfinity)
          else if (s == KBinsStrategy.QUANTILE) {
            val raw =
              if (feats.length > k) {
                val width = feats.length.toDouble / k
                Array.tabulate(k)(i => feats((i * width).toInt)) :+ feats.last
              } else feats
            KBinsDiscretizer.mergeZeroWidthBins(raw)
          } else { // kmeans on 1-D sample
            // the reference switches to UNIFORM when a column has at
            // most numBins distinct values — k-means on fewer points
            // than clusters is degenerate (KBinsDiscretizer.java
            // findBinEdgesWithKMeansStrategy distinct check)
            val distinctCount = {
              var c = 1; var i = 1
              while (i < feats.length && c <= k) {
                if (feats(i) != feats(i - 1)) c += 1
                i += 1
              }
              c
            }
            if (distinctCount <= k) {
              val (lo, hi) = (feats.head, feats.last)
              val width = (hi - lo) / k
              val e = new Array[Double](k + 1)
              e(0) = lo
              var i = 1; while (i <= k) { e(i) = e(i - 1) + width; i += 1 }
              e
            } else KBinsDiscretizer.kmeans1D(feats, k)
          }
        }
    }

    val spark = df.sparkSession
    import spark.implicits._
    val modelDf = binEdges.zipWithIndex.map { case (e, d) => (d, e) }.toSeq.toDF("dim", "edges")
    val m = new KBinsDiscretizerModel().setModelData(modelDf)
    copyParamsTo(m)
    m
  }
}
object KBinsDiscretizer extends StageLoader[KBinsDiscretizer] {
  def load(spark: SparkSession, path: String): KBinsDiscretizer =
    ReadWrite.applyParams(new KBinsDiscretizer, path)

  /** The reference's zero-width-bin repair for quantile edges
    * (KBinsDiscretizer.java findBinEdgesWithQuantileStrategy): an edge
    * value that appears more than once keeps exactly TWO copies, and
    * each consecutive-equal pair is then split by replacing the right
    * copy with the average of its neighbors (the last pair splits its
    * LEFT copy) — so a duplicated quantile edge preserves its bin
    * instead of collapsing, which a plain .distinct (our pre-round-7
    * behavior) silently lost: train [1,1,1,4,...] at numBins=10 must
    * produce edges [1, 2.5, 4, ...], not [1, 4, ...]. */
  private[feature] def mergeZeroWidthBins(raw: Array[Double]): Array[Double] = {
    val counts = scala.collection.mutable.LinkedHashMap.empty[Double, Int]
    raw.foreach(e => counts(e) = counts.getOrElse(e, 0) + 1)
    val edges = counts.iterator
      .flatMap { case (e, c) => if (c > 1) Iterator(e, e) else Iterator.single(e) }
      .toArray
    java.util.Arrays.sort(edges)
    if (edges.length == 1) return Array(edges(0), edges(0))
    var i = 1
    while (i < edges.length - 1) {
      if (edges(i) == edges(i - 1)) edges(i) = (edges(i + 1) + edges(i - 1)) / 2
      i += 1
    }
    if (edges(i) == edges(i - 1)) edges(i - 1) = (edges(i) + edges(i - 2)) / 2
    edges
  }

  /** Lloyd's k-means on sorted 1-D data; bin edges = midpoints between
    * adjacent final centroids (reference findBinEdgesWithKMeansStrategy).
    * Init picks sorted((i·n/k)) — the reference's rank-based seeding —
    * and iterates to the membership fixed point (the reference stops
    * at |Δloss| ≤ 1e-4, which at the fixed point is 0, so the fixed
    * point is a superset-faithful stop rule the SQL oracle can unroll). */
  private[feature] def kmeans1D(sorted: Array[Double], k: Int): Array[Double] = {
    val n = sorted.length
    // (i * (n/k as double)).toInt — the reference's exact index
    // arithmetic, kept bit-for-bit (integer division can differ by one
    // when n/k rounds below an exact multiple)
    var centroids = Array.tabulate(k)(i => sorted((i * (n.toDouble / k)).toInt.min(n - 1)))
    var iter = 0
    var moved = true
    while (iter < 100 && moved) {
      val sums = new Array[Double](k); val counts = new Array[Long](k)
      sorted.foreach { x =>
        var best = 0; var bestD = math.abs(x - centroids(0))
        var j = 1
        while (j < k) { val d = math.abs(x - centroids(j)); if (d < bestD) { bestD = d; best = j }; j += 1 }
        sums(best) += x; counts(best) += 1
      }
      val next = Array.tabulate(k)(j => if (counts(j) > 0) sums(j) / counts(j) else centroids(j))
      moved = next.zip(centroids).exists { case (a, b) => math.abs(a - b) > 1e-12 }
      centroids = next
      iter += 1
    }
    java.util.Arrays.sort(centroids)
    val mids = (0 until k - 1).map(j => (centroids(j) + centroids(j + 1)) / 2).toArray
    (sorted.head +: mids :+ sorted.last).distinct
  }
}

class KBinsDiscretizerModel extends Model[KBinsDiscretizerModel]
    with HasInputCol[KBinsDiscretizerModel] with HasOutputCol[KBinsDiscretizerModel] {

  private var modelData: DataFrame = _
  override def setModelData(data: DataFrame*): KBinsDiscretizerModel = { modelData = data.head; this }
  override def getModelData: Array[DataFrame] = Array(modelData)

  override def transform(inputs: DataFrame*): Array[DataFrame] = {
    require(inputs.size == 1)
    val df = inputs.head
    val edges = modelData.select("dim", "edges").collect()
      .sortBy(_.getInt(0)).map(_.getSeq[Double](1).toArray)
    val bc = df.sparkSession.sparkContext.broadcast(edges)
    val f = udf { v: Vector =>
      if (v == null) null
      else {
        val e = bc.value
        val a = v.toArray
        val out = new Array[Double](a.length)
        var d = 0
        while (d < a.length) {
          val ed = e(d)
          var i = java.util.Arrays.binarySearch(ed, a(d))
          if (i < 0) i = -i - 1 else if (i < ed.length) i += 1
          // clamp into [1, len-1] then shift to bucket id
          val bucket = math.min(math.max(i, 1), ed.length - 1) - 1
          out(d) = bucket.toDouble
          d += 1
        }
        Vectors.dense(out)
      }
    }
    Array(df.withColumn(getOutputCol, f(col(getInputCol))))
  }
}
object KBinsDiscretizerModel extends StageLoader[KBinsDiscretizerModel] {
  def load(spark: SparkSession, path: String): KBinsDiscretizerModel = {
    val m = ReadWrite.applyParams(new KBinsDiscretizerModel, path)
    m.setModelData(ReadWrite.loadModelData(spark, path))
  }
}
