package graft.feature

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.api.{StageLoader, Transformer}
import graft.param._
import graft.util.ReadWrite

/**
 * Per-key time-series feature generation: lag columns, gap-to-previous
 * time delta, and rolling statistics over the N preceding rows —
 * the standard featurization pass that turns an event log into
 * training rows (churn/forecast/anomaly models all start here). The
 * reference has windowed AGGREGATION (its Windows ADT, mirrored in
 * streaming/Windows.scala) but no per-ROW lag/rolling featurizer —
 * beyond-reference addition.
 *
 * Emitted columns for value column v with `numLags` L and
 * `rollingWindow` W: `<v>_lag1..<v>_lagL` (null where history is
 * short), `<order>_delta` (order-col difference to the previous row,
 * null on each key's first row; seconds when the order column is a
 * timestamp), and `<v>_roll_mean/min/max/count/std` over the W rows
 * STRICTLY BEFORE the current row (leakage-safe: the current value
 * never feeds its own features; count 0 and null stats on first rows;
 * std is the sample deviation, null until the frame holds 2 values).
 *
 * Scale shape: everything rides ONE window spec — one shuffle on the
 * key columns, one in-partition sort on the order columns, all
 * features computed in that single pass (Catalyst collapses same-spec
 * window functions into one Window node). Per-key state is the W-row
 * sliding frame, never the whole key's history. Hot keys skew this
 * shuffle like any keyed op — salt upstream or split the key if one
 * entity dominates.
 *
 * Determinism: ties in the order columns make lag/rolling values
 * ambiguous — pass tie-breaking columns (e.g. an event id) as the
 * tail of `orderCols`.
 */
class LagFeaturizer extends Transformer[LagFeaturizer]
    with HasInputCol[LagFeaturizer] {

  final val partitionCols: Param[Array[String]] = paramNoDefault[Array[String]](
    "partitionCols", "Key columns: features are computed independently per key",
    ParamValidators.nonEmptyArray)
  def getPartitionCols: Array[String] = get(partitionCols)
  def setPartitionCols(v: String*): LagFeaturizer = set(partitionCols, v.toArray)

  final val orderCols: Param[Array[String]] = paramNoDefault[Array[String]](
    "orderCols", "Ordering columns within a key (add a unique tail column to break ties)",
    ParamValidators.nonEmptyArray)
  def getOrderCols: Array[String] = get(orderCols)
  def setOrderCols(v: String*): LagFeaturizer = set(orderCols, v.toArray)

  final val numLags: Param[Int] = param[Int](
    "numLags", "How many lag columns of the input value to emit", 1,
    ParamValidators.gtEq(0.0))
  def getNumLags: Int = get(numLags)
  def setNumLags(v: Int): LagFeaturizer = set(numLags, v)

  final val rollingWindow: Param[Int] = param[Int](
    "rollingWindow", "Rolling-stat frame: this many rows strictly before the current row (0 disables)",
    10, ParamValidators.gtEq(0.0))
  def getRollingWindow: Int = get(rollingWindow)
  def setRollingWindow(v: Int): LagFeaturizer = set(rollingWindow, v)

  override def transform(inputs: DataFrame*): Array[DataFrame] = {
    require(inputs.size == 1)
    val df = inputs.head
    val v = getInputCol
    val orderHead = getOrderCols.head
    val w = Window.partitionBy(getPartitionCols.map(col): _*)
      .orderBy(getOrderCols.map(col): _*)

    var out = df
    (1 to getNumLags).foreach { i =>
      out = out.withColumn(s"${v}_lag$i", lag(col(v), i).over(w))
    }
    // order-col gap: timestamps diff in (fractional) seconds, numerics subtract
    val prevOrder = lag(col(orderHead), 1).over(w)
    val delta: Column = df.schema(orderHead).dataType match {
      case org.apache.spark.sql.types.TimestampType |
           org.apache.spark.sql.types.TimestampNTZType =>
        (unix_micros(col(orderHead).cast("timestamp"))
          - unix_micros(prevOrder.cast("timestamp"))) / 1e6
      case _ => col(orderHead) - prevOrder
    }
    out = out.withColumn(s"${orderHead}_delta", delta)

    if (getRollingWindow > 0) {
      val frame = w.rowsBetween(-getRollingWindow.toLong, -1)
      out = out
        .withColumn(s"${v}_roll_mean", avg(col(v)).over(frame))
        .withColumn(s"${v}_roll_min", min(col(v)).over(frame))
        .withColumn(s"${v}_roll_max", max(col(v)).over(frame))
        .withColumn(s"${v}_roll_count", count(col(v)).over(frame))
        // sample stddev (n−1): null until the frame holds ≥ 2 values,
        // which keeps downstream z-scores null instead of divide-by-zero
        .withColumn(s"${v}_roll_std", stddev_samp(col(v)).over(frame))
    }
    Array(out)
  }
}

object LagFeaturizer extends StageLoader[LagFeaturizer] {
  def load(spark: SparkSession, path: String): LagFeaturizer =
    ReadWrite.applyParams(new LagFeaturizer, path)
}
