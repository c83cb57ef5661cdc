package graft.api

import org.apache.spark.sql.DataFrame

/** Convenience for single-input single-output AlgoOperators. */
trait OneToOne[T <: AlgoOperator[T]] extends AlgoOperator[T] {
  protected def transformOne(df: DataFrame): DataFrame
  override def transform(inputs: DataFrame*): Array[DataFrame] = {
    require(inputs.size == 1, s"${getClass.getSimpleName} expects exactly one input table")
    Array(transformOne(inputs.head))
  }
}
