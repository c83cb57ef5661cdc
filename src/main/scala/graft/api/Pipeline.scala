package graft.api

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.json4s._
import graft.util.ReadWrite

/**
 * Ordered stage list acting as a single Estimator.
 *
 * Fit semantics mirror the reference exactly
 * (flink-ml-core org/apache/flink/ml/builder/Pipeline.java:79-107):
 * scan for the last Estimator; every stage before it transforms the
 * (single) intermediate table; estimators before the last one are fit
 * then their model transforms; stages after the last estimator are
 * used as-is.
 */
class Pipeline(val stages: Seq[Stage[_]]) extends Estimator[Pipeline, PipelineModel] {

  def this() = this(Seq.empty)

  override def fit(inputs: DataFrame*): PipelineModel = {
    require(inputs.size == 1, "Pipeline.fit expects exactly one input table")
    var df = inputs.head
    val lastEstimatorIdx = stages.lastIndexWhere(_.isInstanceOf[Estimator[_, _]])
    val modelStages = stages.zipWithIndex.map { case (stage, i) =>
      val s: Stage[_] =
        if (i <= lastEstimatorIdx) stage match {
          case e: Estimator[_, _] => e.fit(df)
          case t => t
        } else stage
      if (i < lastEstimatorIdx) s match {
        case a: AlgoOperator[_] => df = a.transform(df).head
        case _ =>
      }
      s
    }
    new PipelineModel(modelStages)
  }

  override def save(path: String): Unit = Pipeline.saveStages(this, stages, path)
}

object Pipeline extends StageLoader[Pipeline] {
  def load(spark: SparkSession, path: String): Pipeline =
    new Pipeline(loadStages(spark, path))

  private[api] def saveStages(self: Stage[_], stages: Seq[Stage[_]], path: String): Unit = {
    ReadWrite.saveMetadata(self, path, Map("numStages" -> JInt(stages.size)))
    stages.zipWithIndex.foreach { case (s, i) => s.save(ReadWrite.stagePath(path, i)) }
  }

  private[api] def loadStages(spark: SparkSession, path: String): Seq[Stage[_]] = {
    val meta = ReadWrite.loadMetadata(path)
    val n = (meta \ "numStages") match {
      case JInt(i) => i.toInt; case JLong(l) => l.toInt; case _ => sys.error("missing numStages")
    }
    (0 until n).map(i => ReadWrite.loadStage(spark, ReadWrite.stagePath(path, i)))
  }
}

/**
 * Chain of fitted/stateless stages acting as one Model
 * (reference builder/PipelineModel.java:66-71).
 */
class PipelineModel(val stages: Seq[Stage[_]]) extends Model[PipelineModel] {

  def this() = this(Seq.empty)

  override def transform(inputs: DataFrame*): Array[DataFrame] = {
    require(inputs.size == 1, "PipelineModel.transform expects exactly one input table")
    var df = inputs.head
    stages.foreach {
      case a: AlgoOperator[_] => df = a.transform(df).head
      case s => sys.error(s"PipelineModel stage $s is not an AlgoOperator")
    }
    Array(df)
  }

  override def setModelData(data: DataFrame*): PipelineModel =
    sys.error("PipelineModel does not accept direct model data; set it on member stages")
  override def getModelData: Array[DataFrame] =
    stages.collect { case m: Model[_] => m.getModelData }.flatten.toArray

  /** True iff every stage is a fitted transformer with a Spark-free
    * servable (reference builder/PipelineModel.java:99-113: each stage
    * must be a Transformer exposing loadServable). */
  def supportServable: Boolean =
    stages.forall(s => s.isInstanceOf[AlgoOperator[_]] && s.isInstanceOf[ServableCapable])

  /** Chain of the member servables (reference PipelineModelServable). */
  def toServable: graft.servable.PipelineModelServable = {
    require(supportServable,
      s"PipelineModel.toServable: every stage must be a ServableCapable transformer; " +
        s"got ${stages.map(_.getClass.getSimpleName).mkString(", ")}")
    new graft.servable.PipelineModelServable(
      stages.map(_.asInstanceOf[ServableCapable].toServable))
  }

  override def save(path: String): Unit = Pipeline.saveStages(this, stages, path)
}

object PipelineModel extends StageLoader[PipelineModel] {
  def load(spark: SparkSession, path: String): PipelineModel =
    new PipelineModel(Pipeline.loadStages(spark, path))
}
