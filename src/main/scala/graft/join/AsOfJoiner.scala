package graft.join

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.api.{AlgoOperator, StageLoader}
import graft.param._
import graft.util.ReadWrite

/**
 * Point-in-time ("as-of") left join: for each left row, attach the
 * single right row with the same key whose timestamp is the latest
 * at-or-before the left row's timestamp (`backward`, the default) or
 * the earliest at-or-after it (`forward`) — the feature-store
 * primitive that keeps training joins leakage-free (a training
 * example must only see feature values that existed at event time).
 * `toleranceMs >= 0` additionally voids matches further than the
 * tolerance away (the reference's `maxAllowedModelDelayMs` rule,
 * servable-lib .../param/HasMaxAllowedModelDelayMs.java, generalized
 * from its model stream to arbitrary tables).
 *
 * Scale shape (100 TB design): Spark has no native as-of join, and
 * the naive range-join (`l.ts >= r.ts` + windowed max) explodes into
 * O(|L|·|R|/key) intermediate rows. This operator instead UNIONS the
 * two sides tagged, shuffles ONCE on the key, and per key runs an
 * ordered window where `last(value, ignoreNulls)` carries the most
 * recent right row forward onto each left row — O(|L|+|R|) rows
 * through one exchange, whole-stage-codegen window, no join node at
 * all. Right rows at exactly the left timestamp sort before the left
 * row, so equal-time matches are included (DuckDB ASOF semantics).
 *
 * Output: all left columns, the requested right value columns
 * (null when no match within tolerance), and `matchedTimeCol` with
 * the matched right timestamp.
 */
class AsOfJoiner extends AlgoOperator[AsOfJoiner] {

  final val onCols: Param[Array[String]] =
    param[Array[String]]("onCols", "Equality-join key columns present in both inputs.",
      Array.empty[String], (a: Array[String]) => a != null)
  def getOnCols: Array[String] = get(onCols)
  def setOnCols(v: String*): AsOfJoiner = set(onCols, v.toArray)

  final val leftTimeCol: Param[String] =
    param[String]("leftTimeCol", "Left event-time column (numeric, e.g. epoch ms).", "ts")
  def getLeftTimeCol: String = get(leftTimeCol)
  def setLeftTimeCol(v: String): AsOfJoiner = set(leftTimeCol, v)

  final val rightTimeCol: Param[String] =
    param[String]("rightTimeCol", "Right event-time column (numeric, e.g. epoch ms).", "ts")
  def getRightTimeCol: String = get(rightTimeCol)
  def setRightTimeCol(v: String): AsOfJoiner = set(rightTimeCol, v)

  final val valueCols: Param[Array[String]] =
    param[Array[String]]("valueCols", "Right columns to attach to each left row.",
      Array.empty[String], (a: Array[String]) => a != null)
  def getValueCols: Array[String] = get(valueCols)
  def setValueCols(v: String*): AsOfJoiner = set(valueCols, v.toArray)

  final val direction: Param[String] =
    param[String]("direction", "backward = latest right at-or-before; forward = earliest at-or-after.",
      AsOfJoiner.Backward, ParamValidators.inArray(AsOfJoiner.Backward, AsOfJoiner.Forward))
  def getDirection: String = get(direction)
  def setDirection(v: String): AsOfJoiner = set(direction, v)

  final val toleranceMs: Param[Long] =
    param[Long]("toleranceMs",
      "If >= 0, a match further than this from the left timestamp is voided (nulls).", -1L)
  def getToleranceMs: Long = get(toleranceMs)
  def setToleranceMs(v: Long): AsOfJoiner = set(toleranceMs, v)

  final val matchedTimeCol: Param[String] =
    param[String]("matchedTimeCol", "Output column holding the matched right timestamp.", "matched_ts")
  def getMatchedTimeCol: String = get(matchedTimeCol)
  def setMatchedTimeCol(v: String): AsOfJoiner = set(matchedTimeCol, v)

  override def transform(inputs: DataFrame*): Array[DataFrame] = {
    require(inputs.size == 2, "AsOfJoiner expects (left, right) input tables")
    val (left, right) = (inputs(0), inputs(1))
    require(getOnCols.nonEmpty, "onCols must be set")
    require(getValueCols.nonEmpty, "valueCols must be set")
    val collisions = getValueCols.toSet.intersect(left.columns.toSet)
    require(collisions.isEmpty, s"valueCols collide with left columns: ${collisions.mkString(", ")}")
    val backward = getDirection == AsOfJoiner.Backward
    // forward = backward on the negated time axis (equal-time still inclusive)
    def axis(c: Column): Column = if (backward) c.cast("long") else -c.cast("long")

    val keys = getOnCols.toSeq
    val l2 = left
      .withColumn("__aoj_ts", axis(col(getLeftTimeCol)))
      .withColumn("__aoj_tag", lit(1))
    val r2 = right
      .where(col(getRightTimeCol).isNotNull)
      .select(keys.map(col) ++ Seq(
        axis(col(getRightTimeCol)).as("__aoj_ts"),
        lit(0).as("__aoj_tag"),
        struct(getValueCols.toSeq.map(col): _*).as("__aoj_rv")): _*)
    val unioned = l2.unionByName(r2, allowMissingColumns = true)

    // one exchange on the key; right rows (tag 0) sort before left rows
    // at equal timestamps, so last() sees them
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("__aoj_ts").asc, col("__aoj_tag").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = unioned
      .withColumn("__aoj_mrv", last(col("__aoj_rv"), ignoreNulls = true).over(w))
      .withColumn("__aoj_mts",
        last(when(col("__aoj_tag") === 0, col("__aoj_ts")), ignoreNulls = true).over(w))
      .where(col("__aoj_tag") === 1)

    val matchedTs = if (backward) col("__aoj_mts") else -col("__aoj_mts")
    val distance = col("__aoj_ts") - col("__aoj_mts") // >= 0 on the unified axis
    val valid =
      if (getToleranceMs >= 0L)
        col("__aoj_mts").isNotNull && distance <= getToleranceMs
      else col("__aoj_mts").isNotNull

    val out = getValueCols.toSeq.foldLeft(
        carried.withColumn(getMatchedTimeCol, when(valid, matchedTs))) {
        (d, vc) => d.withColumn(vc, when(valid, col(s"__aoj_mrv.$vc")))
      }
      .drop("__aoj_ts", "__aoj_tag", "__aoj_rv", "__aoj_mrv", "__aoj_mts")
    Array(out)
  }
}
object AsOfJoiner extends StageLoader[AsOfJoiner] {
  val Backward = "backward"
  val Forward = "forward"

  def load(spark: SparkSession, path: String): AsOfJoiner =
    ReadWrite.applyParams(new AsOfJoiner, path)
}
