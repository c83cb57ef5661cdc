package graft.servable

import java.io.{InputStream, OutputStream}
import org.json4s._
import org.json4s.jackson.JsonMethods

/**
 * Spark-free in-process serving layer, mirroring the reference
 * servable API (flink-ml-servable-core servable/api/DataFrame.java:43-119,
 * TransformerServable.java:38, ModelServable.java:32,
 * builder/PipelineModelServable.java; flink-ml-servable-lib
 * LogisticRegressionModelServable).
 *
 * The intended shape: train distributed with the Spark estimators,
 * export the (small) model data once with [[ServableExport]], then
 * score single rows or micro-batches inside any JVM — a web service,
 * a stream processor — with no SparkSession anywhere.
 */

/** Minimal in-memory table: named columns over rows of values. */
final class LocalDataFrame(
    val columnNames: scala.collection.mutable.ArrayBuffer[String],
    val rows: scala.collection.mutable.ArrayBuffer[scala.collection.mutable.ArrayBuffer[Any]]) {

  def getIndex(name: String): Int = {
    val i = columnNames.indexOf(name)
    require(i >= 0, s"Failed to find the column with the name $name.")
    i
  }

  def addColumn(columnName: String, values: Seq[Any]): LocalDataFrame = {
    require(values.size == rows.size,
      s"The number of values ${values.size} is different from the number of rows ${rows.size}.")
    columnNames += columnName
    rows.zip(values).foreach { case (row, v) => row += v }
    this
  }

  def column(name: String): Seq[Any] = { val i = getIndex(name); rows.map(_(i)).toSeq }
}
object LocalDataFrame {
  def apply(names: Seq[String], data: Seq[Seq[Any]]): LocalDataFrame = {
    data.foreach(r => require(r.size == names.size,
      s"The row size ${r.size} is different from the number of column names ${names.size}."))
    new LocalDataFrame(
      scala.collection.mutable.ArrayBuffer(names: _*),
      scala.collection.mutable.ArrayBuffer(data.map(r =>
        scala.collection.mutable.ArrayBuffer(r: _*)): _*))
  }
}

trait TransformerServable {
  def transform(input: LocalDataFrame): LocalDataFrame
}

trait ModelServable extends TransformerServable {
  /** Load the exported model data (JSON, written by [[ServableExport]]). */
  def setModelData(in: InputStream): this.type
}

/** Chain of servables acting as one (reference PipelineModelServable). */
final class PipelineModelServable(stages: Seq[TransformerServable]) extends TransformerServable {
  override def transform(input: LocalDataFrame): LocalDataFrame =
    stages.foldLeft(input)((df, s) => s.transform(df))
}

/** Binary logistic regression scoring: margin = w·x, p = σ(margin). */
final class LogisticRegressionModelServable extends ModelServable {
  var featuresCol: String = "features"
  var predictionCol: String = "prediction"
  var rawPredictionCol: String = "rawPrediction"
  private var coefficient: Array[Double] = _

  def setFeaturesCol(v: String): this.type = { featuresCol = v; this }
  def setCoefficient(v: Array[Double]): this.type = { coefficient = v; this }

  override def setModelData(in: InputStream): this.type = {
    coefficient = ServableExport.readDoubleArray(in, "coefficient")
    this
  }

  override def transform(input: LocalDataFrame): LocalDataFrame = {
    require(coefficient != null, "model data has not been set")
    val idx = input.getIndex(featuresCol)
    val preds = scala.collection.mutable.ArrayBuffer.empty[Any]
    val raws = scala.collection.mutable.ArrayBuffer.empty[Any]
    input.rows.foreach { row =>
      val x = row(idx).asInstanceOf[Array[Double]]
      var margin = 0.0
      var i = 0
      while (i < coefficient.length) { margin += coefficient(i) * x(i); i += 1 }
      val p = 1.0 / (1.0 + math.exp(-margin))
      preds += (if (p >= 0.5) 1.0 else 0.0)
      raws += Array(1.0 - p, p)
    }
    input.addColumn(predictionCol, preds.toSeq)
    input.addColumn(rawPredictionCol, raws.toSeq)
    input
  }
}

/** Standard scaling: (x − mean) / std per dimension. The withMean /
  * withStd flags mirror StandardScalerModel; both default true here
  * (the historical servable behavior for hand-built scorers). */
final class StandardScalerModelServable extends ModelServable {
  var inputCol: String = "input"
  var outputCol: String = "output"
  var withMean: Boolean = true
  var withStd: Boolean = true
  private var mean: Array[Double] = _
  private var std: Array[Double] = _

  def setInputCol(v: String): this.type = { inputCol = v; this }
  def setOutputCol(v: String): this.type = { outputCol = v; this }
  def setMeanStd(m: Array[Double], s: Array[Double]): this.type = { mean = m; std = s; this }

  override def setModelData(in: InputStream): this.type = {
    val json = JsonMethods.parse(in)
    mean = ServableExport.doubles(json \ "mean")
    std = ServableExport.doubles(json \ "std")
    this
  }

  override def transform(input: LocalDataFrame): LocalDataFrame = {
    require(mean != null && std != null, "model data has not been set")
    val idx = input.getIndex(inputCol)
    val out = input.rows.map { row =>
      val x = row(idx).asInstanceOf[Array[Double]]
      Array.tabulate(x.length) { i =>
        var v = x(i)
        if (withMean) v -= mean(i)
        if (withStd) v = if (std(i) == 0.0) 0.0 else v / std(i)
        v
      }: Any
    }
    input.addColumn(outputCol, out.toSeq)
    input
  }
}

/** Exports fitted Spark models into the servables' JSON model format. */
object ServableExport {
  import org.apache.spark.ml.linalg.Vector

  /** LogisticRegressionModel / LinearSVCModel / LinearRegressionModel →
    * {"coefficient": [...]}. */
  def exportLinearModel(modelData: org.apache.spark.sql.DataFrame, out: OutputStream): Unit = {
    val coeff = modelData.select("coefficient").head().getAs[Vector](0).toArray
    write(out, JObject("coefficient" -> JArray(coeff.map(JDouble(_)).toList)))
  }

  /** StandardScalerModel → {"mean": [...], "std": [...]}. */
  def exportStandardScaler(modelData: org.apache.spark.sql.DataFrame, out: OutputStream): Unit = {
    val row = modelData.select("mean", "std").head()
    write(out, JObject(
      "mean" -> JArray(row.getAs[Vector](0).toArray.map(JDouble(_)).toList),
      "std" -> JArray(row.getAs[Vector](1).toArray.map(JDouble(_)).toList)))
  }

  private def write(out: OutputStream, json: JValue): Unit = {
    val w = new java.io.OutputStreamWriter(out, java.nio.charset.StandardCharsets.UTF_8)
    w.write(JsonMethods.compact(JsonMethods.render(json)))
    w.flush()
  }

  private[servable] def doubles(j: JValue): Array[Double] = j match {
    case JArray(xs) => xs.map {
      case JDouble(d) => d
      case JInt(i) => i.toDouble
      case JLong(l) => l.toDouble
      case x => sys.error(s"bad number $x")
    }.toArray
    case x => sys.error(s"expected array, got $x")
  }

  private[servable] def readDoubleArray(in: InputStream, field: String): Array[Double] =
    doubles(JsonMethods.parse(in) \ field)
}
