package graft.join

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.api.{AlgoOperator, StageLoader}
import graft.param._
import graft.util.ReadWrite

/**
 * Build a type-2 slowly-changing-dimension history from a change log:
 * each (key, change-time, attributes...) row becomes a VALIDITY
 * INTERVAL — `valid_from` = its change time, `valid_to` = the key's
 * next change time (null while current), plus an `is_current` flag.
 * The output is exactly what [[AsOfJoiner]] (or a BETWEEN predicate /
 * [[IntervalJoiner]]) needs for point-in-time-correct training
 * features: "what did this dimension look like when the event
 * happened", with no leakage from later updates.
 *
 * `collapseUnchanged` drops a change row whose tracked attributes
 * equal the key's previous row, BEFORE intervals are computed — a
 * no-op update then extends the previous interval instead of
 * splitting it (the standard SCD2 compaction). Attribute equality is
 * null-safe and covers every non-key, non-order column.
 *
 * Scale shape: ONE shuffle on the key columns + one in-partition sort
 * on the change time carries everything (the duplicate-collapse lag
 * and the interval lead ride the same window spec). Ties on (key,
 * change time) make intervals ambiguous — the operator REFUSES them
 * (fail loudly beats silently emitting zero-length intervals).
 */
class Scd2Builder extends AlgoOperator[Scd2Builder] {

  final val keyCols: Param[Array[String]] = paramNoDefault[Array[String]](
    "keyCols", "Dimension key columns", ParamValidators.nonEmptyArray)
  def getKeyCols: Array[String] = get(keyCols)
  def setKeyCols(v: String*): Scd2Builder = set(keyCols, v.toArray)

  final val orderCol: Param[String] = param[String](
    "orderCol", "Change-time column (any orderable type)", "ts",
    ParamValidators.notNull)
  def getOrderCol: String = get(orderCol)
  def setOrderCol(v: String): Scd2Builder = set(orderCol, v)

  final val collapseUnchanged: Param[Boolean] = param[Boolean](
    "collapseUnchanged", "Drop no-op updates so unchanged attributes extend the previous interval",
    true)
  def getCollapseUnchanged: Boolean = get(collapseUnchanged)
  def setCollapseUnchanged(v: Boolean): Scd2Builder = set(collapseUnchanged, v)

  override def transform(inputs: DataFrame*): Array[DataFrame] = {
    require(inputs.size == 1)
    val df = inputs.head
    val keys = getKeyCols
    val ord = getOrderCol
    val w = Window.partitionBy(keys.map(col): _*).orderBy(col(ord))

    val dupTs = df.groupBy((keys :+ ord).map(col): _*)
      .agg(count(lit(1)).as("__n")).where(col("__n") > 1).limit(1).collect()
    require(dupTs.isEmpty,
      s"Scd2Builder: duplicate (${keys.mkString(",")}, $ord) rows make intervals ambiguous — " +
        s"first offender: ${dupTs.headOption.getOrElse("")}")

    val attrs = df.columns.filterNot(c => keys.contains(c) || c == ord)
    val compacted =
      if (getCollapseUnchanged && attrs.nonEmpty) {
        // null-safe change detector against the key's previous row
        val changed = attrs
          .map(a => !(col(a) <=> lag(col(a), 1).over(w)))
          .reduce(_ || _) || lag(col(ord), 1).over(w).isNull
        df.withColumn("__chg", changed).where(col("__chg")).drop("__chg")
      } else df

    val out = compacted
      .withColumn("valid_from", col(ord))
      .withColumn("valid_to", lead(col(ord), 1).over(w))
      .withColumn("is_current", col("valid_to").isNull)
      .drop(ord)
    Array(out)
  }
}

object Scd2Builder extends StageLoader[Scd2Builder] {
  def load(spark: SparkSession, path: String): Scd2Builder =
    ReadWrite.applyParams(new Scd2Builder, path)
}
