package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.functions.udf
import org.apache.spark.ml.linalg.{Vector, Vectors}
import org.apache.spark.ml.{functions => mlF}

/**
 * SQL-callable scalar functions, mirroring the reference's Functions
 * (flink-ml-lib org/apache/flink/ml/Functions.java:41-79 —
 * vectorToArray / arrayToVector registered for Table API/SQL).
 *
 * Column API delegates to Spark's codegen'd ml.functions; the SQL
 * registration uses equivalent UDFs so `spark.sql` queries can call
 * `vectorToArray(v)` / `arrayToVector(a)` by name.
 */
object Functions {

  def vectorToArray(c: Column): Column = mlF.vector_to_array(c)
  def arrayToVector(c: Column): Column = mlF.array_to_vector(c)

  private val vectorToArrayUdf = udf { v: Vector => if (v == null) null else v.toArray }
  private val arrayToVectorUdf = udf { a: Seq[Double] => if (a == null) null else Vectors.dense(a.toArray) }

  /** Register SQL names on a session (idempotent). */
  def register(spark: SparkSession): Unit = {
    spark.udf.register("vectorToArray", vectorToArrayUdf)
    spark.udf.register("arrayToVector", arrayToVectorUdf)
  }
}
