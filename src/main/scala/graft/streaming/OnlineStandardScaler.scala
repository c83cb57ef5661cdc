package graft.streaming

import org.apache.spark.ml.linalg.{Vector, Vectors}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.api._
import graft.param._
import graft.util.ReadWrite

/**
 * Standard scaling with a model STREAM: the input is split into
 * windows (see [[Windows]]); for each window the estimator emits one
 * model version holding the mean/std of ALL data seen up to and
 * including that window (cumulative, like the reference).
 * Reference: feature/standardscaler/OnlineStandardScaler.java:87,
 * OnlineStandardScalerParams (windows/model-version semantics).
 *
 * Model data: one row per version —
 * (version, windowEndMs, count, mean vector, std vector).
 *
 * Scale shape: one shuffle computes per-window partial moments
 * (count/sum/sumsq per dimension); the cumulative pass runs over the
 * tiny per-window summary table, never over rows. In Structured
 * Streaming the same update arrives via foreachBatch on a
 * micro-batch: treat each micro-batch as one count window.
 */
class OnlineStandardScaler extends Estimator[OnlineStandardScaler, OnlineStandardScalerModel]
    with HasInputCol[OnlineStandardScaler] with HasOutputCol[OnlineStandardScaler]
    with HasWindows[OnlineStandardScaler] {

  final val timeCol: Param[String] =
    param[String]("timeCol", "Event-time column (milliseconds, long) for event-time windows.", "ts")
  def getTimeCol: String = get(timeCol)
  def setTimeCol(v: String): OnlineStandardScaler = set(timeCol, v)

  override def fit(inputs: DataFrame*): OnlineStandardScalerModel = {
    require(inputs.size == 1)
    val df = inputs.head
    val spark = df.sparkSession

    // (windowId, windowEndMs, dim, value) exploded per dimension
    val perWindow = getWindows match {
      case GlobalWindows =>
        df.select(lit(0L).as("win"), lit(Long.MaxValue).as("winEnd"), col(getInputCol))
      case CountTumblingWindows(size) =>
        val rdd = df.select(col(getInputCol)).rdd.zipWithIndex()
          .map { case (r, i) => (i / size, r.getAs[Vector](0)) }
        import spark.implicits._
        rdd.toDF("win", "vec").select(col("win"), col("win").as("winEnd"),
          col("vec").as(getInputCol))
      case EventTimeTumblingWindows(sizeMs) =>
        df.select((col(getTimeCol).cast("long") / sizeMs).cast("long").as("win"),
          (((col(getTimeCol).cast("long") / sizeMs).cast("long") + 1) * sizeMs).as("winEnd"),
          col(getInputCol))
      case EventTimeSessionWindows(gapMs) =>
        // session ids: gap-split over the distinct sorted event times —
        // the single-task sort runs over the (small) distinct-timestamp
        // table, then broadcasts back onto the rows
        val w = Window.orderBy("t")
        val sessions = df.select(col(getTimeCol).cast("long").as("t")).distinct()
          .withColumn("newSession",
            when(lag("t", 1).over(w).isNull || col("t") - lag("t", 1).over(w) > gapMs, 1L)
              .otherwise(0L))
          .withColumn("win", sum("newSession").over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
          .select("t", "win")
        df.select(col(getTimeCol).cast("long").as("t"), col(getInputCol))
          .join(broadcast(sessions), "t")
          .withColumn("winEnd", max("t").over(Window.partitionBy("win")) + gapMs)
          .select(col("win"), col("winEnd"), col(getInputCol))
    }

    val exploded = perWindow.select(col("win"), col("winEnd"),
      posexplode(org.apache.spark.ml.functions.vector_to_array(col(getInputCol)))
        .as(Seq("dim", "value")))
    val partials = exploded.groupBy("win", "dim")
      .agg(max("winEnd").as("winEnd"), count(lit(1)).as("n"),
        sum("value").as("s"), sum(col("value") * col("value")).as("ss"))
    // cumulative moments over window order — per dimension
    val byDim = Window.partitionBy("dim").orderBy("win")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cumulative = partials
      .withColumn("cn", sum("n").over(byDim))
      .withColumn("cs", sum("s").over(byDim))
      .withColumn("css", sum("ss").over(byDim))
      .withColumn("mean", col("cs") / col("cn"))
      .withColumn("variance",
        when(col("cn") > 1,
          (col("css") - col("cn") * col("mean") * col("mean")) / (col("cn") - 1))
          .otherwise(0.0))
      .withColumn("std", sqrt(greatest(col("variance"), lit(0.0))))

    val versions = cumulative.groupBy("win")
      .agg(max("winEnd").as("windowEndMs"), max("cn").as("count"),
        sort_array(collect_list(struct(col("dim"), col("mean")))).as("means"),
        sort_array(collect_list(struct(col("dim"), col("std")))).as("stds"))
      .orderBy("win")
    val toVec = udf { arr: Seq[org.apache.spark.sql.Row] =>
      Vectors.dense(arr.sortBy(_.getInt(0)).map(_.getDouble(1)).toArray): Vector
    }
    val modelStream = versions
      .withColumn("version", row_number().over(Window.orderBy("win")) - 1)
      .select(col("version").cast("long").as("version"), col("windowEndMs"), col("count"),
        toVec(col("means")).as("mean"), toVec(col("stds")).as("std"))

    val m = new OnlineStandardScalerModel().setModelData(modelStream)
    copyParamsTo(m)
    m
  }
}
object OnlineStandardScaler extends StageLoader[OnlineStandardScaler] {
  def load(spark: SparkSession, path: String): OnlineStandardScaler =
    ReadWrite.applyParams(new OnlineStandardScaler, path)
}

/**
 * Scales rows with the latest model version (batch analog of "always
 * use the freshest model"); `modelVersionCol` records the version
 * applied. Reference OnlineStandardScalerModel.java.
 */
class OnlineStandardScalerModel extends Model[OnlineStandardScalerModel]
    with HasInputCol[OnlineStandardScalerModel] with HasOutputCol[OnlineStandardScalerModel] {

  final val modelVersionCol: Param[String] =
    param[String]("modelVersionCol", "Output column holding the model version used.", "version")
  def getModelVersionCol: String = get(modelVersionCol)
  def setModelVersionCol(v: String): OnlineStandardScalerModel = set(modelVersionCol, v)

  private var modelData: DataFrame = _
  override def setModelData(data: DataFrame*): OnlineStandardScalerModel = {
    modelData = data.head; this
  }
  override def getModelData: Array[DataFrame] = Array(modelData)

  override def transform(inputs: DataFrame*): Array[DataFrame] = {
    require(inputs.size == 1)
    val latest = modelData.orderBy(col("version").desc).head()
    val version = latest.getLong(0)
    val mean = latest.getAs[Vector]("mean").toArray
    val std = latest.getAs[Vector]("std").toArray
    val scale = udf { v: Vector =>
      if (v == null) null
      else {
        val a = v.toArray
        val out = new Array[Double](a.length)
        var i = 0
        while (i < a.length) {
          out(i) = if (std(i) == 0.0) 0.0 else (a(i) - mean(i)) / std(i)
          i += 1
        }
        Vectors.dense(out): Vector
      }
    }
    Array(inputs.head
      .withColumn(getOutputCol, scale(col(getInputCol)))
      .withColumn(getModelVersionCol, lit(version)))
  }
}
object OnlineStandardScalerModel extends StageLoader[OnlineStandardScalerModel] {
  def load(spark: SparkSession, path: String): OnlineStandardScalerModel = {
    val m = ReadWrite.applyParams(new OnlineStandardScalerModel, path)
    m.setModelData(ReadWrite.loadModelData(spark, path))
  }
}
