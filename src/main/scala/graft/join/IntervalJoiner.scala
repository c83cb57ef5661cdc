package graft.join

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.api.{AlgoOperator, StageLoader}
import graft.param._
import graft.util.ReadWrite

/**
 * Binned point-in-interval join: for each left row with a point
 * `leftTimeCol` = t, attach every right row (same equality keys)
 * whose interval [`rightStartCol`, `rightEndCol`] contains t — the
 * session-attribution / validity-window / range-lookup primitive
 * (events→sessions, prices with validity ranges, IP→block lookups).
 *
 * Scale shape (100 TB design): Spark executes a raw range predicate
 * (`t BETWEEN s AND e`) as BroadcastNestedLoopJoin — O(|L|·|R|) per
 * key. This operator instead quantizes time into `binWidthMs` bins:
 * each right interval explodes to the bins it spans, the left point
 * computes its single bin, and the join becomes an EQUI-JOIN on
 * (keys, bin) followed by the exact range filter. Work is
 * O(|L| + |R|·span/binWidth + candidates); a point lands in exactly
 * one bin, so no post-join dedup is needed. Pick `binWidthMs` near
 * the typical interval length: wider bins → fewer replicas but more
 * false candidates, narrower → the reverse (the standard spatial
 * grid-join dial). `maxBinsPerInterval` fails fast on intervals that
 * would replicate pathologically (an open-ended validity range
 * belongs in [[AsOfJoiner]], not here).
 */
class IntervalJoiner extends AlgoOperator[IntervalJoiner] {

  final val onCols: Param[Array[String]] =
    param[Array[String]]("onCols", "Equality-join key columns present in both inputs.",
      Array.empty[String], (a: Array[String]) => a != null)
  def getOnCols: Array[String] = get(onCols)
  def setOnCols(v: String*): IntervalJoiner = set(onCols, v.toArray)

  final val leftTimeCol: Param[String] =
    param[String]("leftTimeCol", "Left point column (numeric, e.g. epoch ms).", "ts")
  def getLeftTimeCol: String = get(leftTimeCol)
  def setLeftTimeCol(v: String): IntervalJoiner = set(leftTimeCol, v)

  final val rightStartCol: Param[String] =
    param[String]("rightStartCol", "Right interval start (inclusive).", "start")
  def getRightStartCol: String = get(rightStartCol)
  def setRightStartCol(v: String): IntervalJoiner = set(rightStartCol, v)

  final val rightEndCol: Param[String] =
    param[String]("rightEndCol", "Right interval end (inclusive).", "end")
  def getRightEndCol: String = get(rightEndCol)
  def setRightEndCol(v: String): IntervalJoiner = set(rightEndCol, v)

  final val valueCols: Param[Array[String]] =
    param[Array[String]]("valueCols", "Right columns to attach to each matching left row.",
      Array.empty[String], (a: Array[String]) => a != null && a.nonEmpty)
  def getValueCols: Array[String] = get(valueCols)
  def setValueCols(v: String*): IntervalJoiner = set(valueCols, v.toArray)

  final val binWidthMs: Param[Long] =
    param[Long]("binWidthMs", "Time-bin width for the equi-join grid.", 3600L * 1000,
      ParamValidators.gt(0L))
  def getBinWidthMs: Long = get(binWidthMs)
  def setBinWidthMs(v: Long): IntervalJoiner = set(binWidthMs, v)

  final val maxBinsPerInterval: Param[Int] =
    param[Int]("maxBinsPerInterval",
      "Fail fast if any right interval spans more than this many bins (replication guard).", 1000,
      ParamValidators.gt(0))
  def getMaxBinsPerInterval: Int = get(maxBinsPerInterval)
  def setMaxBinsPerInterval(v: Int): IntervalJoiner = set(maxBinsPerInterval, v)

  /** inputs = (left points, right intervals); inner-join semantics —
    * one output row per (point, containing interval) pair. */
  override def transform(inputs: DataFrame*): Array[DataFrame] = {
    require(inputs.size == 2, "IntervalJoiner expects (left, right)")
    val Seq(left, right) = inputs.toSeq
    require(getValueCols.nonEmpty, "valueCols must be set")
    // the output restores rightStartCol/rightEndCol and appends
    // valueCols next to every left column — a collision would yield
    // duplicate column names that break any downstream select()
    val leftCols = left.columns.toSet
    val appended = (getValueCols.toSeq :+ getRightStartCol :+ getRightEndCol).distinct
    val clash = appended.filter(c => leftCols.contains(c) && !getOnCols.contains(c))
    require(clash.isEmpty,
      s"IntervalJoiner: right columns ${clash.mkString(", ")} collide with left columns; " +
        "rename one side before joining")
    require(!getValueCols.contains(getRightStartCol) && !getValueCols.contains(getRightEndCol),
      "IntervalJoiner: valueCols must not include rightStartCol/rightEndCol " +
        "(they are attached automatically)")
    // a valueCol (or interval bound) that is ALSO a join key would be
    // selected twice on the right side → ambiguous-reference error
    val keyClash = (getValueCols.toSeq :+ getRightStartCol :+ getRightEndCol)
      .filter(getOnCols.contains)
    require(keyClash.isEmpty,
      s"IntervalJoiner: ${keyClash.mkString(", ")} cannot be both a join key (onCols) " +
        "and an attached right column")
    val w = getBinWidthMs
    val maxBins = getMaxBinsPerInterval
    val keys = getOnCols.toSeq

    val t = col(getLeftTimeCol).cast("long")
    val s = col(getRightStartCol).cast("long")
    val e = col(getRightEndCol).cast("long")

    // bins the interval spans; validity enforced inside the plan (a
    // degenerate or over-replicated interval fails the job fast)
    val startCol = getRightStartCol; val endCol = getRightEndCol
    val binsOf = udf { (s: Long, e: Long) =>
      if (e < s) throw new IllegalArgumentException(
        s"IntervalJoiner: interval end before start in $startCol/$endCol")
      val b0 = Math.floorDiv(s, w); val b1 = Math.floorDiv(e, w)
      if (b1 - b0 + 1 > maxBins) throw new IllegalArgumentException(
        s"IntervalJoiner: interval spans more than $maxBins bins of $w ms; " +
          "widen binWidthMs or use AsOfJoiner for open-ended validity")
      (b0 to b1).toArray
    }

    val rightBinned = right
      .withColumn("__ij_bin", explode(binsOf(s, e)))
      .select((keys.map(col) :+ col("__ij_bin") :+ s.as("__ij_s") :+ e.as("__ij_e")) ++
        getValueCols.toSeq.map(col): _*)
    val leftBinned = left.withColumn("__ij_bin", floor(t / w).cast("long"))

    // matched interval bounds ride along under their original names
    val matched = leftBinned.join(rightBinned, keys :+ "__ij_bin")
      .where(t >= col("__ij_s") && t <= col("__ij_e"))
      .drop("__ij_bin")
      .withColumnRenamed("__ij_s", getRightStartCol)
      .withColumnRenamed("__ij_e", getRightEndCol)
    Array(matched)
  }
}
object IntervalJoiner extends StageLoader[IntervalJoiner] {
  def load(spark: SparkSession, path: String): IntervalJoiner =
    ReadWrite.applyParams(new IntervalJoiner, path)
}
