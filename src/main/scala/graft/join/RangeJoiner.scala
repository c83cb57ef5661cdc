package graft.join

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.api.{AlgoOperator, StageLoader}
import graft.param._
import graft.util.ReadWrite

/**
 * Binned interval-OVERLAP join: attach every right interval that
 * overlaps each left interval (same equality keys) — the
 * session-vs-campaign / downtime-vs-deploy / coverage-analysis
 * primitive. [[IntervalJoiner]] handles the point-in-interval case;
 * this is its two-interval sibling (overlap: `lStart ≤ rEnd AND
 * rStart ≤ lEnd`, both bounds inclusive).
 *
 * Scale shape (100 TB design): a raw overlap predicate compiles to
 * BroadcastNestedLoopJoin — O(|L|·|R|) per key. Both sides instead
 * explode to the `binWidthMs` grid bins they span, the join becomes
 * an EQUI-JOIN on (keys, bin) plus the exact overlap filter, and
 * each overlapping pair is emitted exactly ONCE by keeping only the
 * FIRST grid bin the two intervals share (`bin ==
 * max(floor(lStart/w), floor(rStart/w))` — the standard spatial
 * grid-join dedup, no post-join distinct). `maxBinsPerInterval`
 * fails fast on intervals that would replicate pathologically.
 */
class RangeJoiner extends AlgoOperator[RangeJoiner] {

  final val onCols: Param[Array[String]] =
    param[Array[String]]("onCols", "Equality-join key columns present in both inputs.",
      Array.empty[String], (a: Array[String]) => a != null)
  def getOnCols: Array[String] = get(onCols)
  def setOnCols(v: String*): RangeJoiner = set(onCols, v.toArray)

  final val leftStartCol: Param[String] =
    param[String]("leftStartCol", "Left interval start (inclusive, numeric).", "start")
  def getLeftStartCol: String = get(leftStartCol)
  def setLeftStartCol(v: String): RangeJoiner = set(leftStartCol, v)

  final val leftEndCol: Param[String] =
    param[String]("leftEndCol", "Left interval end (inclusive).", "end")
  def getLeftEndCol: String = get(leftEndCol)
  def setLeftEndCol(v: String): RangeJoiner = set(leftEndCol, v)

  final val rightStartCol: Param[String] =
    param[String]("rightStartCol", "Right interval start (inclusive).", "r_start")
  def getRightStartCol: String = get(rightStartCol)
  def setRightStartCol(v: String): RangeJoiner = set(rightStartCol, v)

  final val rightEndCol: Param[String] =
    param[String]("rightEndCol", "Right interval end (inclusive).", "r_end")
  def getRightEndCol: String = get(rightEndCol)
  def setRightEndCol(v: String): RangeJoiner = set(rightEndCol, v)

  final val valueCols: Param[Array[String]] =
    param[Array[String]]("valueCols", "Right columns to attach to each matching left row.",
      Array.empty[String], (a: Array[String]) => a != null && a.nonEmpty)
  def getValueCols: Array[String] = get(valueCols)
  def setValueCols(v: String*): RangeJoiner = set(valueCols, v.toArray)

  final val binWidthMs: Param[Long] =
    param[Long]("binWidthMs", "Grid-bin width for the equi-join.", 3600L * 1000,
      ParamValidators.gt(0L))
  def getBinWidthMs: Long = get(binWidthMs)
  def setBinWidthMs(v: Long): RangeJoiner = set(binWidthMs, v)

  final val maxBinsPerInterval: Param[Int] =
    param[Int]("maxBinsPerInterval",
      "Fail fast if any interval spans more than this many bins (replication guard).", 1000,
      ParamValidators.gt(0))
  def getMaxBinsPerInterval: Int = get(maxBinsPerInterval)
  def setMaxBinsPerInterval(v: Int): RangeJoiner = set(maxBinsPerInterval, v)

  /** inputs = (left intervals, right intervals); inner-join semantics —
    * one output row per overlapping (left, right) pair. */
  override def transform(inputs: DataFrame*): Array[DataFrame] = {
    require(inputs.size == 2, "RangeJoiner expects (left, right)")
    val Seq(left, right) = inputs.toSeq
    require(getValueCols.nonEmpty, "valueCols must be set")
    val leftCols = left.columns.toSet
    val appended = (getValueCols.toSeq :+ getRightStartCol :+ getRightEndCol).distinct
    val clash = appended.filter(c => leftCols.contains(c) && !getOnCols.contains(c))
    require(clash.isEmpty,
      s"RangeJoiner: right columns ${clash.mkString(", ")} collide with left columns; " +
        "rename one side before joining")
    require(!getValueCols.contains(getRightStartCol) && !getValueCols.contains(getRightEndCol),
      "RangeJoiner: valueCols must not include rightStartCol/rightEndCol " +
        "(they are attached automatically)")
    val keyClash = (getValueCols.toSeq :+ getRightStartCol :+ getRightEndCol)
      .filter(getOnCols.contains)
    require(keyClash.isEmpty,
      s"RangeJoiner: ${keyClash.mkString(", ")} cannot be both a join key (onCols) " +
        "and an attached right column")
    val w = getBinWidthMs
    val maxBins = getMaxBinsPerInterval
    val keys = getOnCols.toSeq

    def binsOf(startName: String, endName: String) = udf { (s: Long, e: Long) =>
      if (e < s) throw new IllegalArgumentException(
        s"RangeJoiner: interval end before start in $startName/$endName")
      val b0 = Math.floorDiv(s, w); val b1 = Math.floorDiv(e, w)
      if (b1 - b0 + 1 > maxBins) throw new IllegalArgumentException(
        s"RangeJoiner: interval spans more than $maxBins bins of $w ms; " +
          "widen binWidthMs")
      (b0 to b1).toArray
    }

    // exact long floorDiv — the explode side uses Math.floorDiv, so the
    // dedup filter must match it bit-for-bit; floor(x / w) via double
    // division disagrees for |x| near 2^52 (a pair silently emitted
    // twice or dropped). x - pmod(x, w) is the largest multiple of
    // w <= x, so the integral divide below is exact.
    def floorDivCol(x: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
      call_function("div", x - pmod(x, lit(w)), lit(w))

    val ls = col(getLeftStartCol).cast("long")
    val le = col(getLeftEndCol).cast("long")
    val rs = col(getRightStartCol).cast("long")
    val re = col(getRightEndCol).cast("long")

    // Null bounds: dropped EXPLICITLY, not by accident. Under SQL
    // three-valued logic a null-bounded interval can't satisfy the
    // plain overlap predicate this operator is exact against, and the
    // optimizer's constraint inference would filter such rows below
    // the explode anyway (so an in-plan fail-fast guard is
    // unreachable; deterministic fail-fast would cost a dedicated
    // validation scan — enforce upstream with DataValidator.addNotNull
    // if nulls should be an error).
    val leftBinned = left
      .where(ls.isNotNull && le.isNotNull)
      .withColumn("__rj_bin", explode(binsOf(getLeftStartCol, getLeftEndCol)(ls, le)))
    val rightBinned = right
      .where(rs.isNotNull && re.isNotNull)
      .withColumn("__rj_bin", explode(binsOf(getRightStartCol, getRightEndCol)(rs, re)))
      .select((keys.map(col) :+ col("__rj_bin") :+ rs.as("__rj_s") :+ re.as("__rj_e")) ++
        getValueCols.toSeq.map(col): _*)

    // overlap + first-common-bin dedup: the pair's smallest shared bin
    // is max(firstBin(left), firstBin(right)) — emit it there only
    val matched = leftBinned.join(rightBinned, keys :+ "__rj_bin")
      .where(ls <= col("__rj_e") && col("__rj_s") <= le)
      .where(col("__rj_bin") ===
        greatest(floorDivCol(ls), floorDivCol(col("__rj_s"))))
      .drop("__rj_bin")
      .withColumnRenamed("__rj_s", getRightStartCol)
      .withColumnRenamed("__rj_e", getRightEndCol)
    Array(matched)
  }
}
object RangeJoiner extends StageLoader[RangeJoiner] {
  def load(spark: SparkSession, path: String): RangeJoiner =
    ReadWrite.applyParams(new RangeJoiner, path)
}
