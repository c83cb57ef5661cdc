package graft.feature

import java.util.UUID
import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.api.{OneToOne, StageLoader, Transformer}
import graft.param.{Param, ParamValidators}
import graft.util.ReadWrite

/**
 * SQLTransformer: run a SQL statement against the input table, with
 * `__THIS__` standing for the input. Gives the engine the full Spark
 * SQL surface (joins, aggregations, window functions, every scalar
 * function) in one operator.
 * Reference: feature/sqltransformer/SQLTransformer.java:49-90
 * (placeholder replace + sqlQuery).
 */
class SQLTransformer extends Transformer[SQLTransformer] with OneToOne[SQLTransformer] {

  final val statement: Param[String] =
    paramNoDefault[String]("statement", "SQL statement with __THIS__ placeholder",
      (s: String) => s != null && s.contains(SQLTransformer.TABLE_IDENTIFIER))
  def setStatement(v: String): SQLTransformer = set(statement, v)
  def getStatement: String = get(statement)

  override protected def transformOne(df: DataFrame): DataFrame = {
    val tableName = "graft_sql_transformer_" + UUID.randomUUID().toString.replace("-", "")
    df.createOrReplaceTempView(tableName)
    val sql = getStatement.replace(SQLTransformer.TABLE_IDENTIFIER, tableName)
    val result = df.sparkSession.sql(sql)
    // Defer the temp-view drop: the result plan is resolved eagerly, so
    // dropping now is safe for execution and avoids catalog leaks.
    df.sparkSession.catalog.dropTempView(tableName)
    result
  }
}
object SQLTransformer extends StageLoader[SQLTransformer] {
  val TABLE_IDENTIFIER = "__THIS__"
  def load(spark: SparkSession, path: String): SQLTransformer =
    ReadWrite.applyParams(new SQLTransformer, path)
}
