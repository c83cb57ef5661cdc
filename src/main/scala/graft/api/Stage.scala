package graft.api

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.param.WithParams
import graft.util.ReadWrite

/**
 * Core stage hierarchy, mirroring the reference's API shape
 * (flink-ml-core org/apache/flink/ml/api/{Stage,AlgoOperator,Transformer,
 * Model,Estimator}.java) re-expressed on Spark DataFrames.
 *
 * Multi-input / multi-output: `transform(inputs: DataFrame*): Array[DataFrame]`
 * keeps the reference's varargs-in / array-out signature (richer than
 * spark.ml's single-Dataset transform — e.g. RandomSplitter emits N tables).
 */
trait Stage[T <: Stage[T]] extends WithParams[T] {
  /** Persist stage metadata (and model data, for models) under `path`. */
  def save(path: String): Unit = ReadWrite.saveMetadata(this, path)
}

/** Transform-only operator: relational/analytics ops with no fitted state. */
trait AlgoOperator[T <: AlgoOperator[T]] extends Stage[T] {
  def transform(inputs: DataFrame*): Array[DataFrame]
}

/** Marker for stateless feature transformers (reference Transformer.java). */
trait Transformer[T <: Transformer[T]] extends AlgoOperator[T]

/**
 * A fitted transformer whose state ("model data") is itself a DataFrame —
 * first-class, inspectable, settable (reference Model.java:38-50).
 */
trait Model[T <: Model[T]] extends Transformer[T] {
  def setModelData(data: DataFrame*): T
  def getModelData: Array[DataFrame]

  override def save(path: String): Unit = {
    ReadWrite.saveMetadata(this, path)
    ReadWrite.saveModelData(getModelData, path)
  }
}

/** Fits a Model from one or more input tables (reference Estimator.java:38). */
trait Estimator[E <: Estimator[E, M], M <: Model[M]] extends Stage[E] {
  def fit(inputs: DataFrame*): M
}

/** Companion-object loader contract so Pipeline.load can restore stages. */
trait StageLoader[T <: Stage[T]] {
  def load(spark: SparkSession, path: String): T
}

/**
 * Marker for fitted stages that can produce a Spark-free servable
 * (the reference gates this per stage by the presence of a
 * `loadServable(String)` method — builder/PipelineModel.java:99-113;
 * we make the capability a trait so `PipelineModel.supportServable`
 * is a plain instance check instead of reflection).
 */
trait ServableCapable {
  /** Spark-free servable equivalent of this fitted stage (collects the
    * model-sized state to the driver). */
  def toServable: graft.servable.TransformerServable
}
