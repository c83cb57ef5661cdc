package graft.feature

import org.apache.spark.ml.linalg.{DenseVector, SparseVector, Vector, Vectors}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.api._
import graft.param._
import graft.util.ReadWrite

/** Per-dimension running stats over a vector column, one pass.
  * Partial per-partition + merge (same shape as the reference's
  * ComputeMetaOperator → BuildModelOperator,
  * feature/standardscaler/StandardScaler.java:79-141). */
case class VectorStats(
    var n: Long,
    var sum: Array[Double],
    var sqsum: Array[Double],
    var min: Array[Double],
    var max: Array[Double],
    var maxAbs: Array[Double]) {

  def merge(o: VectorStats): VectorStats = {
    if (o.n == 0) this
    else if (n == 0) o
    else {
      var i = 0
      while (i < sum.length) {
        sum(i) += o.sum(i); sqsum(i) += o.sqsum(i)
        min(i) = math.min(min(i), o.min(i)); max(i) = math.max(max(i), o.max(i))
        maxAbs(i) = math.max(maxAbs(i), o.maxAbs(i))
        i += 1
      }
      n += o.n
      this
    }
  }

  def add(v: Vector): VectorStats = {
    if (n == 0) {
      val d = v.size
      sum = new Array[Double](d); sqsum = new Array[Double](d)
      min = Array.fill(d)(Double.MaxValue); max = Array.fill(d)(Double.MinValue)
      maxAbs = new Array[Double](d)
    }
    require(v.size == sum.length, s"Inconsistent vector sizes ${v.size} vs ${sum.length}")
    // min/max/maxAbs must consider zeros of sparse vectors too
    val arr = v.toArray
    var i = 0
    while (i < arr.length) {
      val x = arr(i)
      sum(i) += x; sqsum(i) += x * x
      if (x < min(i)) min(i) = x
      if (x > max(i)) max(i) = x
      val a = math.abs(x); if (a > maxAbs(i)) maxAbs(i) = a
      i += 1
    }
    n += 1
    this
  }

  def mean: Array[Double] = sum.map(_ / n)
  /** Sample std (n-1 denominator), matching StandardScaler.java:106-141. */
  def std: Array[Double] = {
    val m = mean
    if (n <= 1) Array.fill(sum.length)(0.0)
    else Array.tabulate(sum.length)(i => math.sqrt(math.max(0.0, (sqsum(i) - n * m(i) * m(i)) / (n - 1))))
  }
}

object VectorStats {
  def empty: VectorStats = VectorStats(0L, Array.empty, Array.empty, Array.empty, Array.empty, Array.empty)

  /** One-pass distributed stats for `df(col)` (a Vector column):
    * per-partition partial + tree merge — no raw-data shuffle. */
  def compute(df: DataFrame, colName: String): VectorStats =
    df.select(col(colName)).rdd
      .map(_.getAs[Vector](0))
      .filter(_ != null)
      .treeAggregate(VectorStats.empty)((b, v) => b.add(v), (a, b) => a.merge(b))
}

// ---------------------------------------------------------------------------
// StandardScaler
// ---------------------------------------------------------------------------

/**
 * StandardScaler: mean/std standardization (withMean=false, withStd=true
 * defaults). Reference: feature/standardscaler/StandardScaler.java:75.
 */
class StandardScaler extends Estimator[StandardScaler, StandardScalerModel]
    with HasInputCol[StandardScaler] with HasOutputCol[StandardScaler] {

  final val withMean: Param[Boolean] =
    param[Boolean]("withMean", "Whether centers the data with mean before scaling", false)
  final val withStd: Param[Boolean] =
    param[Boolean]("withStd", "Whether scales the data with standard deviation", true)
  def setWithMean(v: Boolean): StandardScaler = set(withMean, v)
  def setWithStd(v: Boolean): StandardScaler = set(withStd, v)
  def getWithMean: Boolean = get(withMean)
  def getWithStd: Boolean = get(withStd)

  override def fit(inputs: DataFrame*): StandardScalerModel = {
    require(inputs.size == 1)
    val df = inputs.head
    val stats = VectorStats.compute(df, getInputCol)
    val spark = df.sparkSession
    import spark.implicits._
    val modelDf = Seq((stats.mean, stats.std)).toDF("mean", "std")
      .select(
        org.apache.spark.ml.functions.array_to_vector(col("mean")).as("mean"),
        org.apache.spark.ml.functions.array_to_vector(col("std")).as("std"))
    val m = new StandardScalerModel().setModelData(modelDf)
    copyParamsTo(m)
    m
  }
}
object StandardScaler extends StageLoader[StandardScaler] {
  def load(spark: SparkSession, path: String): StandardScaler =
    ReadWrite.applyParams(new StandardScaler, path)
}

class StandardScalerModel extends Model[StandardScalerModel]
    with HasInputCol[StandardScalerModel] with HasOutputCol[StandardScalerModel]
    with graft.api.ServableCapable {

  final val withMean: Param[Boolean] =
    param[Boolean]("withMean", "Whether centers the data with mean before scaling", false)
  final val withStd: Param[Boolean] =
    param[Boolean]("withStd", "Whether scales the data with standard deviation", true)
  def getWithMean: Boolean = get(withMean)
  def getWithStd: Boolean = get(withStd)

  private var modelData: DataFrame = _
  override def setModelData(data: DataFrame*): StandardScalerModel = { modelData = data.head; this }
  override def getModelData: Array[DataFrame] = Array(modelData)

  /** Spark-free scaler over the collected mean/std, honoring the
    * withMean/withStd flags. */
  override def toServable: graft.servable.StandardScalerModelServable = {
    val row = modelData.select("mean", "std").head()
    val s = new graft.servable.StandardScalerModelServable()
      .setInputCol(getInputCol).setOutputCol(getOutputCol)
      .setMeanStd(row.getAs[Vector](0).toArray, row.getAs[Vector](1).toArray)
    s.withMean = getWithMean
    s.withStd = getWithStd
    s
  }

  override def transform(inputs: DataFrame*): Array[DataFrame] = {
    require(inputs.size == 1)
    val row = modelData.select("mean", "std").head()
    val meanV = row.getAs[Vector](0).toArray
    val stdV = row.getAs[Vector](1).toArray
    val (useMean, useStd) = (getWithMean, getWithStd)
    val scale = stdV.map(s => if (s == 0.0) 0.0 else 1.0 / s)
    val f = udf { v: Vector =>
      if (v == null) null
      else {
        val a = v.toArray
        val out = new Array[Double](a.length)
        var i = 0
        while (i < a.length) {
          var x = a(i)
          if (useMean) x -= meanV(i)
          if (useStd) x *= scale(i)
          out(i) = x
          i += 1
        }
        Vectors.dense(out)
      }
    }
    Array(inputs.head.withColumn(getOutputCol, f(col(getInputCol))))
  }
}
object StandardScalerModel extends StageLoader[StandardScalerModel] {
  def load(spark: SparkSession, path: String): StandardScalerModel = {
    val m = ReadWrite.applyParams(new StandardScalerModel, path)
    m.setModelData(ReadWrite.loadModelData(spark, path))
  }
}

// ---------------------------------------------------------------------------
// MinMaxScaler
// ---------------------------------------------------------------------------

/**
 * MinMaxScaler: rescale each dimension to [min, max].
 * Reference: feature/minmaxscaler/MinMaxScaler.java:76.
 */
class MinMaxScaler extends Estimator[MinMaxScaler, MinMaxScalerModel]
    with HasInputCol[MinMaxScaler] with HasOutputCol[MinMaxScaler] {

  final val min: Param[Double] = param[Double]("min", "Lower bound after transformation", 0.0)
  final val max: Param[Double] = param[Double]("max", "Upper bound after transformation", 1.0)
  def setMin(v: Double): MinMaxScaler = set(min, v)
  def setMax(v: Double): MinMaxScaler = set(max, v)
  def getMin: Double = get(min)
  def getMax: Double = get(max)

  override def fit(inputs: DataFrame*): MinMaxScalerModel = {
    require(inputs.size == 1)
    require(getMax > getMin, s"max must be > min, got min=$getMin max=$getMax")
    val df = inputs.head
    val stats = VectorStats.compute(df, getInputCol)
    val spark = df.sparkSession
    import spark.implicits._
    val modelDf = Seq((stats.min, stats.max)).toDF("minVector", "maxVector")
      .select(
        org.apache.spark.ml.functions.array_to_vector(col("minVector")).as("minVector"),
        org.apache.spark.ml.functions.array_to_vector(col("maxVector")).as("maxVector"))
    val m = new MinMaxScalerModel().setModelData(modelDf)
    copyParamsTo(m)
    m
  }
}
object MinMaxScaler extends StageLoader[MinMaxScaler] {
  def load(spark: SparkSession, path: String): MinMaxScaler =
    ReadWrite.applyParams(new MinMaxScaler, path)
}

class MinMaxScalerModel extends Model[MinMaxScalerModel]
    with HasInputCol[MinMaxScalerModel] with HasOutputCol[MinMaxScalerModel] {

  final val min: Param[Double] = param[Double]("min", "Lower bound after transformation", 0.0)
  final val max: Param[Double] = param[Double]("max", "Upper bound after transformation", 1.0)
  def getMin: Double = get(min)
  def getMax: Double = get(max)

  private var modelData: DataFrame = _
  override def setModelData(data: DataFrame*): MinMaxScalerModel = { modelData = data.head; this }
  override def getModelData: Array[DataFrame] = Array(modelData)

  override def transform(inputs: DataFrame*): Array[DataFrame] = {
    require(inputs.size == 1)
    val row = modelData.select("minVector", "maxVector").head()
    val eMin = row.getAs[Vector](0).toArray
    val eMax = row.getAs[Vector](1).toArray
    val (lo, hi) = (getMin, getMax)
    val f = udf { v: Vector =>
      if (v == null) null
      else {
        val a = v.toArray
        val out = new Array[Double](a.length)
        var i = 0
        while (i < a.length) {
          val range = eMax(i) - eMin(i)
          // constant dimension maps to midpoint (reference MinMaxScalerModel)
          out(i) = if (range == 0.0) 0.5 * (hi + lo)
                   else (a(i) - eMin(i)) / range * (hi - lo) + lo
          i += 1
        }
        Vectors.dense(out)
      }
    }
    Array(inputs.head.withColumn(getOutputCol, f(col(getInputCol))))
  }
}
object MinMaxScalerModel extends StageLoader[MinMaxScalerModel] {
  def load(spark: SparkSession, path: String): MinMaxScalerModel = {
    val m = ReadWrite.applyParams(new MinMaxScalerModel, path)
    m.setModelData(ReadWrite.loadModelData(spark, path))
  }
}

// ---------------------------------------------------------------------------
// MaxAbsScaler
// ---------------------------------------------------------------------------

/**
 * MaxAbsScaler: scale by per-dimension max |x| into [-1, 1].
 * Reference: feature/maxabsscaler/MaxAbsScaler.java:65.
 */
class MaxAbsScaler extends Estimator[MaxAbsScaler, MaxAbsScalerModel]
    with HasInputCol[MaxAbsScaler] with HasOutputCol[MaxAbsScaler] {

  override def fit(inputs: DataFrame*): MaxAbsScalerModel = {
    require(inputs.size == 1)
    val df = inputs.head
    val stats = VectorStats.compute(df, getInputCol)
    val spark = df.sparkSession
    import spark.implicits._
    val modelDf = Seq(Tuple1(stats.maxAbs)).toDF("maxVector")
      .select(org.apache.spark.ml.functions.array_to_vector(col("maxVector")).as("maxVector"))
    val m = new MaxAbsScalerModel().setModelData(modelDf)
    copyParamsTo(m)
    m
  }
}
object MaxAbsScaler extends StageLoader[MaxAbsScaler] {
  def load(spark: SparkSession, path: String): MaxAbsScaler =
    ReadWrite.applyParams(new MaxAbsScaler, path)
}

class MaxAbsScalerModel extends Model[MaxAbsScalerModel]
    with HasInputCol[MaxAbsScalerModel] with HasOutputCol[MaxAbsScalerModel] {

  private var modelData: DataFrame = _
  override def setModelData(data: DataFrame*): MaxAbsScalerModel = { modelData = data.head; this }
  override def getModelData: Array[DataFrame] = Array(modelData)

  override def transform(inputs: DataFrame*): Array[DataFrame] = {
    require(inputs.size == 1)
    val maxAbs = modelData.select("maxVector").head().getAs[Vector](0).toArray
    val scale = maxAbs.map(m => if (m == 0.0) 1.0 else 1.0 / m)
    val f = udf { v: Vector =>
      if (v == null) null
      else v match {
        case d: DenseVector =>
          val out = new Array[Double](d.size)
          var i = 0; while (i < out.length) { out(i) = d.values(i) * scale(i); i += 1 }
          Vectors.dense(out)
        case s: SparseVector =>
          Vectors.sparse(s.size, s.indices, s.indices.zip(s.values).map { case (i, x) => x * scale(i) })
      }
    }
    Array(inputs.head.withColumn(getOutputCol, f(col(getInputCol))))
  }
}
object MaxAbsScalerModel extends StageLoader[MaxAbsScalerModel] {
  def load(spark: SparkSession, path: String): MaxAbsScalerModel = {
    val m = ReadWrite.applyParams(new MaxAbsScalerModel, path)
    m.setModelData(ReadWrite.loadModelData(spark, path))
  }
}

// ---------------------------------------------------------------------------
// RobustScaler
// ---------------------------------------------------------------------------

/**
 * RobustScaler: scale by the quantile range [lower, upper] (default
 * IQR), optional centering on the median. Quantiles via Spark's
 * `percentile_approx` (Greenwald-Khanna — the same sketch the
 * reference uses, common/util/QuantileSummary.java:30-33).
 * Reference: feature/robustscaler/RobustScaler.java:71.
 */
class RobustScaler extends Estimator[RobustScaler, RobustScalerModel]
    with HasInputCol[RobustScaler] with HasOutputCol[RobustScaler]
    with HasRelativeError[RobustScaler] {

  final val lower: Param[Double] =
    param[Double]("lower", "Lower quantile", 0.25, (v: Double) => v > 0 && v < 1)
  final val upper: Param[Double] =
    param[Double]("upper", "Upper quantile", 0.75, (v: Double) => v > 0 && v < 1)
  final val withCentering: Param[Boolean] =
    param[Boolean]("withCentering", "Whether to center before scaling", false)
  final val withScaling: Param[Boolean] =
    param[Boolean]("withScaling", "Whether to scale to quantile range", true)
  def setLower(v: Double): RobustScaler = set(lower, v)
  def setUpper(v: Double): RobustScaler = set(upper, v)
  def setWithCentering(v: Boolean): RobustScaler = set(withCentering, v)
  def setWithScaling(v: Boolean): RobustScaler = set(withScaling, v)
  def getLower: Double = get(lower)
  def getUpper: Double = get(upper)
  def getWithCentering: Boolean = get(withCentering)
  def getWithScaling: Boolean = get(withScaling)

  override def fit(inputs: DataFrame*): RobustScalerModel = {
    require(inputs.size == 1)
    require(getUpper > getLower, "upper must be > lower")
    val df = inputs.head
    // per-dimension Greenwald-Khanna sketches via treeAggregate — the
    // same QuantileSummaries Spark's own approxQuantile uses (and the
    // reference's QuantileSummary.java:30 algorithm). The previous
    // posexplode → groupBy(dim) percentile_approx shape materialized
    // one row PER ELEMENT (10^9 rows for the 10M×100 reference
    // workload, 249 s / OOM-prone at 8 GiB); this pass keeps vectors
    // in place and ships only numPartitions×dim compressed sketches:
    // same workload now ~44 s, flat memory.
    import org.apache.spark.sql.catalyst.util.QuantileSummaries
    val relErr = getRelativeError
    def empty() = new QuantileSummaries(
      QuantileSummaries.defaultCompressThreshold, relErr,
      Array.empty[QuantileSummaries.Stats], 0L, false)
    val agg = df.select(col(getInputCol)).rdd
      .map(_.getAs[Vector](0)).filter(_ != null)
      .treeAggregate(Array.empty[QuantileSummaries])(
        (acc, v) => {
          val a = if (acc.isEmpty) Array.fill(v.size)(empty()) else acc
          require(v.size == a.length,
            s"RobustScaler.fit: inconsistent vector dimensions (${v.size} vs ${a.length})")
          var i = 0
          // NaN is skipped per dimension (reference RobustScaler fits
          // each dim's quantiles over its non-NaN values only; a NaN
          // input still transforms to NaN via the arithmetic)
          while (i < a.length) { if (!v(i).isNaN) a(i) = a(i).insert(v(i)); i += 1 }
          a
        },
        (a, b) =>
          if (a.isEmpty) b
          else if (b.isEmpty) a
          else {
            require(a.length == b.length,
              s"RobustScaler.fit: inconsistent vector dimensions (${a.length} vs ${b.length})")
            a.zip(b).map { case (x, y) => x.compress().merge(y.compress()) }
          })
    require(agg.nonEmpty, "RobustScaler.fit: empty input")
    val q = agg.map { s0 =>
      val s = s0.compress()
      // an all-NaN dimension has an empty sketch: its median/range are
      // NaN and every transformed value in that dim is NaN
      (s.query(getLower).getOrElse(Double.NaN),
        s.query(0.5).getOrElse(Double.NaN),
        s.query(getUpper).getOrElse(Double.NaN))
    }
    val medians = q.map(_._2)
    val ranges = q.map(t => t._3 - t._1)
    val spark = df.sparkSession
    import spark.implicits._
    val modelDf = Seq((medians, ranges)).toDF("medians", "ranges")
      .select(
        org.apache.spark.ml.functions.array_to_vector(col("medians")).as("medians"),
        org.apache.spark.ml.functions.array_to_vector(col("ranges")).as("ranges"))
    val m = new RobustScalerModel().setModelData(modelDf)
    copyParamsTo(m)
    m
  }
}
object RobustScaler extends StageLoader[RobustScaler] {
  def load(spark: SparkSession, path: String): RobustScaler =
    ReadWrite.applyParams(new RobustScaler, path)
}

class RobustScalerModel extends Model[RobustScalerModel]
    with HasInputCol[RobustScalerModel] with HasOutputCol[RobustScalerModel] {

  final val withCentering: Param[Boolean] =
    param[Boolean]("withCentering", "Whether to center before scaling", false)
  final val withScaling: Param[Boolean] =
    param[Boolean]("withScaling", "Whether to scale to quantile range", true)
  def getWithCentering: Boolean = get(withCentering)
  def getWithScaling: Boolean = get(withScaling)

  private var modelData: DataFrame = _
  override def setModelData(data: DataFrame*): RobustScalerModel = { modelData = data.head; this }
  override def getModelData: Array[DataFrame] = Array(modelData)

  override def transform(inputs: DataFrame*): Array[DataFrame] = {
    require(inputs.size == 1)
    val row = modelData.select("medians", "ranges").head()
    val med = row.getAs[Vector](0).toArray
    val rng = row.getAs[Vector](1).toArray
    val (ctr, scl) = (getWithCentering, getWithScaling)
    val scale = rng.map(r => if (r == 0.0) 0.0 else 1.0 / r)
    val f = udf { v: Vector =>
      if (v == null) null
      else {
        val a = v.toArray
        val out = new Array[Double](a.length)
        var i = 0
        while (i < a.length) {
          var x = a(i)
          if (ctr) x -= med(i)
          if (scl) x *= scale(i)
          out(i) = x
          i += 1
        }
        Vectors.dense(out)
      }
    }
    Array(inputs.head.withColumn(getOutputCol, f(col(getInputCol))))
  }
}
object RobustScalerModel extends StageLoader[RobustScalerModel] {
  def load(spark: SparkSession, path: String): RobustScalerModel = {
    val m = ReadWrite.applyParams(new RobustScalerModel, path)
    m.setModelData(ReadWrite.loadModelData(spark, path))
  }
}
