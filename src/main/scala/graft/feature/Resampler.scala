package graft.feature

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.api.{StageLoader, Transformer}
import graft.param._
import graft.util.ReadWrite

/**
 * Per-key time-series resampling onto a regular grid with
 * forward-fill — the gap-filling step that precedes any
 * fixed-frequency featurization ([[LagFeaturizer]] assumes evenly
 * observed rows; sensor/event data is not). Each key's observations
 * are bucketed to `floor(ts / stepMs)`; the output has ONE row per
 * grid step from the key's first to last observation, carrying
 *
 *  - the value columns: the bucket's LAST observation where one
 *    exists, else the previous observed values (`strategy="ffill"`)
 *    or null (`strategy="null"`); with `maxFillMs > 0` a gap older
 *    than the horizon stops filling (stale sensor reads must not
 *    masquerade as fresh ones) and emits null;
 *  - `is_observed`: whether the grid row had a real observation.
 *
 * Scale shape: gaps-and-islands in ONE window pass — lag() of the
 * previous observation over the key partition, then an IN-ROW
 * `sequence + explode` materializes only the missing grid steps
 * between consecutive observations (never a dense calendar join).
 * Two shuffles total: the (key, bucket) last-observation dedup and
 * the per-key window sort. A gap wider than `maxGapSteps` grid steps
 * fails fast (one pathological key must not OOM an executor with a
 * hundred-million-row explode); duplicate (key, ts) rows are refused
 * in-row (the Scd2Builder convention — silently picking one would be
 * order-dependent).
 *
 * `timeCol` must be numeric epoch-milliseconds or timestamp; the
 * output `ts` column matches the input kind (grid-aligned).
 */
class Resampler extends Transformer[Resampler] {

  final val keyCol: Param[String] = param[String](
    "keyCol", "Series key column; the grid is built per key", "key",
    ParamValidators.notNull)
  def getKeyCol: String = get(keyCol)
  def setKeyCol(v: String): Resampler = set(keyCol, v)

  final val timeCol: Param[String] = param[String](
    "timeCol", "Event-time column (epoch-ms numeric or timestamp)", "ts",
    ParamValidators.notNull)
  def getTimeCol: String = get(timeCol)
  def setTimeCol(v: String): Resampler = set(timeCol, v)

  final val valueCols: Param[Array[String]] = param[Array[String]](
    "valueCols", "Columns to carry onto the grid (last-in-bucket, then filled)",
    Array.empty[String], (a: Array[String]) => a != null && a.nonEmpty)
  def getValueCols: Array[String] = get(valueCols)
  def setValueCols(v: String*): Resampler = set(valueCols, v.toArray)

  final val stepMs: Param[Long] = param[Long](
    "stepMs", "Grid step in milliseconds", 60000L, ParamValidators.gt(0L))
  def getStepMs: Long = get(stepMs)
  def setStepMs(v: Long): Resampler = set(stepMs, v)

  final val strategy: Param[String] = param[String](
    "strategy", "Gap fill: ffill (carry the previous observation) or null",
    "ffill", ParamValidators.inArray("ffill", "null"))
  def getStrategy: String = get(strategy)
  def setStrategy(v: String): Resampler = set(strategy, v)

  final val maxFillMs: Param[Long] = param[Long](
    "maxFillMs", "ffill horizon in ms: a grid step further than this from the last " +
      "observation emits null instead of a stale carry-forward; <= 0 = unlimited", 0L)
  def getMaxFillMs: Long = get(maxFillMs)
  def setMaxFillMs(v: Long): Resampler = set(maxFillMs, v)

  final val maxGapSteps: Param[Int] = param[Int](
    "maxGapSteps", "Fail fast when one gap would explode to more than this many grid " +
      "rows (a years-long hole at a 1s step is a config error, not a fill target)",
    1000000, ParamValidators.gt(0))
  def getMaxGapSteps: Int = get(maxGapSteps)
  def setMaxGapSteps(v: Int): Resampler = set(maxGapSteps, v)

  override def transform(inputs: DataFrame*): Array[DataFrame] = {
    require(inputs.size == 1)
    val df = inputs.head
    val step = getStepMs
    val vals = getValueCols.toSeq
    require(!df.columns.contains("is_observed"),
      "Resampler: input already has an is_observed column; drop or rename it first")
    val isTimestamp = df.schema(getTimeCol).dataType match {
      case org.apache.spark.sql.types.TimestampType |
           org.apache.spark.sql.types.TimestampNTZType => true
      case _ => false
    }
    val msExpr =
      if (isTimestamp) unix_millis(col(getTimeCol).cast("timestamp"))
      else col(getTimeCol).cast("long")

    val slim = df.select(
      (col(getKeyCol).as("__rs_key") +:
        msExpr.as("__rs_ms") +:
        vals.map(col)): _*)
      .where(col("__rs_ms").isNotNull)
      // integer floorDiv (negative timestamps floor correctly; the
      // RangeJoiner lesson: never floor() a double for bucket math)
      .withColumn("__rs_b",
        call_function("div", col("__rs_ms") - pmod(col("__rs_ms"), lit(step)), lit(step)))

    // last observation per (key, bucket); duplicate (key, ts) refused
    // in the SAME window pass. The guard is folded into __rs_rn (the
    // column the rn=1 filter reads) so column pruning cannot eliminate
    // the raise_error. Reachability for duplicates BELOW the bucket
    // top additionally relies on the CASE wrapper around row_number()
    // blocking Spark's InferWindowGroupLimit top-1 rewrite (which would
    // prune rank>1 rows before their guard evaluates) — pinned by a
    // spec case with a duplicate pair that is not its bucket's max.
    val wDedup = Window.partitionBy("__rs_key", "__rs_b").orderBy(col("__rs_ms").desc)
    val lastInBucket = slim
      .withColumn("__rs_rn",
        when(lead(col("__rs_ms"), 1).over(wDedup) === col("__rs_ms"),
          raise_error(concat(lit(s"Resampler: duplicate ($getKeyCol, $getTimeCol) rows at key "),
            col("__rs_key").cast("string"), lit(", ts "), col("__rs_ms").cast("string")))
            .cast("int"))
          .otherwise(row_number().over(wDedup)))
      .where(col("__rs_rn") === 1)
      .drop("__rs_rn")

    // gaps-and-islands: each observation emits itself + the missing
    // grid steps since the PREVIOUS observation, carrying lagged values
    val wKey = Window.partitionBy("__rs_key").orderBy("__rs_b")
    val maxGap = getMaxGapSteps
    val withPrev = lastInBucket
      .withColumn("__rs_prev_b", lag("__rs_b", 1).over(wKey))
      .withColumn("__rs_prev_ms", lag("__rs_ms", 1).over(wKey))
    val prevVals = vals.map(v => lag(col(v), 1).over(wKey).as(s"__rs_prev_$v"))
    val exploded = withPrev
      .select((col("*") +: prevVals): _*)
      // the gap guard is folded INTO the sequence lower bound (a value
      // the explode must read) so column pruning cannot drop it
      .withColumn("__rs_from", {
        val from0 = coalesce(col("__rs_prev_b") + 1, col("__rs_b"))
        when(col("__rs_b") - from0 >= maxGap,
          raise_error(concat(
            lit(s"Resampler: a gap spans more than $maxGap grid steps at key "),
            col("__rs_key").cast("string"),
            lit(" — widen stepMs or split the series"))).cast("long"))
          .otherwise(from0)
      })
      .withColumn("__rs_g", explode(sequence(col("__rs_from"), col("__rs_b"))))

    val observed = col("__rs_g") === col("__rs_b")
    val gridMs = col("__rs_g") * step
    val fillOk =
      if (getStrategy == "null") observed
      else if (getMaxFillMs > 0L) observed || (gridMs - col("__rs_prev_ms") <= getMaxFillMs)
      else lit(true)
    val outTs = if (isTimestamp) timestamp_millis(gridMs) else gridMs
    val valueOut = vals.map { v =>
      when(observed, col(v))
        .otherwise(when(fillOk, col(s"__rs_prev_$v"))).as(v)
    }
    val out = exploded.select(
      (col("__rs_key").as(getKeyCol) +:
        outTs.as(getTimeCol) +:
        observed.as("is_observed") +:
        valueOut): _*)
    Array(out)
  }
}

object Resampler extends StageLoader[Resampler] {
  def load(spark: SparkSession, path: String): Resampler =
    ReadWrite.applyParams(new Resampler, path)
}
