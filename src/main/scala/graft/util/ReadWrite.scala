package graft.util

import java.nio.file.{Files, Paths, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.json4s._
import org.json4s.jackson.JsonMethods
import graft.api.Stage

/**
 * Stage persistence: JSON metadata + parquet model data.
 *
 * Layout mirrors the reference (flink-ml-core
 * org/apache/flink/ml/util/ReadWriteUtils.java:89-148,298-317):
 *   path/metadata            JSON {className, timestamp, paramMap, extra}
 *   path/data/<i>/           parquet model-data table i (ours: parquet,
 *                            the reference uses custom encoder streams)
 *   path/stages/<i>/         nested stages (Pipeline/Graph)
 */
object ReadWrite {

  def saveMetadata(stage: Stage[_], path: String, extra: Map[String, JValue] = Map.empty): Unit = {
    val dir = Paths.get(path)
    Files.createDirectories(dir)
    val meta = JObject(List(
      "className" -> JString(stage.getClass.getName),
      "timestamp" -> JLong(System.currentTimeMillis()),
      "paramMap" -> stage.paramMapJson) ++ extra.toList)
    Files.writeString(dir.resolve("metadata"), JsonMethods.compact(JsonMethods.render(meta)))
  }

  def loadMetadata(path: String): JObject =
    JsonMethods.parse(Files.readString(Paths.get(path).resolve("metadata"))).asInstanceOf[JObject]

  def metadataClassName(meta: JObject): String =
    (meta \ "className") match { case JString(s) => s; case _ => sys.error("metadata missing className") }

  def saveModelData(tables: Array[DataFrame], path: String): Unit =
    tables.zipWithIndex.foreach { case (df, i) =>
      df.write.mode("overwrite").parquet(dataPath(path, i))
    }

  def loadModelData(spark: SparkSession, path: String, i: Int = 0): DataFrame =
    spark.read.parquet(dataPath(path, i))

  def numModelDataTables(path: String): Int = {
    val base = Paths.get(path, "data")
    if (!Files.exists(base)) 0
    else Files.list(base).filter(Files.isDirectory(_)).count().toInt
  }

  private def dataPath(path: String, i: Int): String =
    Paths.get(path, "data", i.toString).toString

  def stagePath(path: String, i: Int): String =
    Paths.get(path, "stages", f"$i%09d").toString

  /**
   * Reflectively load a stage by the className recorded in its metadata.
   * Looks for a companion object implementing `load(SparkSession, String)`
   * (our StageLoader contract), mirroring ReadWriteUtils.java:248-296.
   */
  def loadStage(spark: SparkSession, path: String): Stage[_] = {
    val meta = loadMetadata(path)
    val className = metadataClassName(meta)
    val companion = Class.forName(className + "$")
    val module = companion.getField("MODULE$").get(null)
    val m = companion.getMethod("load", classOf[SparkSession], classOf[String])
    m.invoke(module, spark, path).asInstanceOf[Stage[_]]
  }

  /** Restore a param-only stage: instantiate className and apply paramMap. */
  def loadParamsOnly[T <: Stage[T]](path: String): T = {
    val meta = loadMetadata(path)
    val stage = Class.forName(metadataClassName(meta))
      .getDeclaredConstructor().newInstance().asInstanceOf[T]
    stage.setParamsFromJson(meta \ "paramMap")
    stage
  }

  /** Restore params onto a freshly-constructed instance. */
  def applyParams[T <: Stage[T]](stage: T, path: String): T = {
    stage.setParamsFromJson(loadMetadata(path) \ "paramMap")
    stage
  }

  def deleteRecursively(path: String): Unit = {
    val p = Paths.get(path)
    if (Files.exists(p)) {
      Files.walk(p).sorted(java.util.Comparator.reverseOrder[Path]())
        .forEach(f => Files.delete(f))
    }
  }
}
