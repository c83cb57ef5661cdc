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

  /** Accepts array<double|float|int|long|short|byte> like the reference
    * (Functions.java arrayToVector works on any numeric array); the cast
    * to array<double> is a no-op for double input and unlocks the long
    * case Spark's array_to_vector rejects. */
  def arrayToVector(c: Column): Column = mlF.array_to_vector(c.cast("array<double>"))

  /** Codegen'd cosine similarity of two array<double> columns (native
    * Catalyst expression, fuses into whole-stage codegen — see
    * [[CosineSimilarity]]). Requires `register(spark)` (or the
    * [[GraftExtensions]] session extension) on the session first. */
  def cosineSimilarity(a: Column, b: Column): Column =
    org.apache.spark.sql.functions.call_function("cosineSimilarity", a, b)

  private val vectorToArrayUdf = udf { v: Vector => if (v == null) null else v.toArray }
  private val arrayToVectorUdf = udf { a: Seq[Double] => if (a == null) null else Vectors.dense(a.toArray) }

  /** Register SQL names on a session (idempotent). */
  def register(spark: SparkSession): Unit = {
    spark.udf.register("vectorToArray", vectorToArrayUdf)
    spark.udf.register("arrayToVector", arrayToVectorUdf)
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "cosineSimilarity", exprs => CosineSimilarity(exprs(0), exprs(1)), "built-in")
  }
}

/**
 * Session extension registering the native functions at session build
 * time — the no-code-change route:
 * `--conf spark.sql.extensions=graft.functions.GraftExtensions`.
 */
class GraftExtensions extends (org.apache.spark.sql.SparkSessionExtensions => Unit) {
  override def apply(ext: org.apache.spark.sql.SparkSessionExtensions): Unit = {
    ext.injectFunction((
      org.apache.spark.sql.catalyst.FunctionIdentifier("cosineSimilarity"),
      new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
        classOf[CosineSimilarity].getName, "cosineSimilarity"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        CosineSimilarity(exprs(0), exprs(1))))
  }
}
