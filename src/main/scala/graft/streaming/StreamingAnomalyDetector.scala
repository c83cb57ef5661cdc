package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import graft.api.{StageLoader, Transformer}
import graft.param._
import graft.util.ReadWrite

/** One scored event: z is null until the key has `minCount` history. */
case class AnomalyScore(key: String, order: Long, value: Double,
    n_before: Long, z: Option[Double], anomaly: Boolean)

/**
 * Prequential per-key anomaly scoring: each event is scored against
 * the running mean/std of its key's history STRICTLY BEFORE it
 * (never against itself — the score is leakage-free and identical
 * whether the history arrived in one batch or over a year of
 * micro-batches). z = |x − μ_before| / σ_before once the key has
 * `minCount` prior events and σ > 0; `anomaly` = z > threshold.
 *
 * Unlike [[LagFeaturizer]]'s bounded rolling frame, the baseline here
 * is the key's ENTIRE past, held as O(1) state per key — the shape an
 * unbounded stream needs.
 *
 * Two engine-appropriate plans, one semantics (parity pinned by
 * spec):
 *  - batch: expanding window frame (unboundedPreceding → -1) — one
 *    shuffle on the key, one in-partition sort, no per-key buffering;
 *  - stream: groupByKey + flatMapGroupsWithState holding Welford
 *    (n, mean, M2) per key in the checkpoint — exact running variance
 *    from 3 doubles, never re-reading history. Events are ordered by
 *    `orderCol` WITHIN each micro-batch; cross-batch disorder scores
 *    against whatever state had accumulated (the honest streaming
 *    semantics — reorder-sensitive pipelines should watermark + sort
 *    upstream). For an UNBOUNDED key space set `stateTtlMs`: keys idle
 *    past the TTL (event time, against the watermark) are evicted and
 *    start cold if they reappear; the default keeps state forever.
 *
 * `orderCol` must be numeric or timestamp (timestamps score by
 * microsecond epoch); the key is compared as a string.
 */
class StreamingAnomalyDetector extends Transformer[StreamingAnomalyDetector]
    with HasInputCol[StreamingAnomalyDetector] {

  final val keyCol: Param[String] = param[String](
    "keyCol", "Grouping key column; history is tracked per key", "key",
    ParamValidators.notNull)
  def getKeyCol: String = get(keyCol)
  def setKeyCol(v: String): StreamingAnomalyDetector = set(keyCol, v)

  final val orderCol: Param[String] = param[String](
    "orderCol", "Event-order column (numeric or timestamp)", "ts",
    ParamValidators.notNull)
  def getOrderCol: String = get(orderCol)
  def setOrderCol(v: String): StreamingAnomalyDetector = set(orderCol, v)

  final val threshold: Param[Double] = param[Double](
    "threshold", "z-score above which an event is flagged", 3.0,
    ParamValidators.gtEq(0.0))
  def getThreshold: Double = get(threshold)
  def setThreshold(v: Double): StreamingAnomalyDetector = set(threshold, v)

  final val minCount: Param[Int] = param[Int](
    "minCount", "Prior events a key needs before z-scores emit (cold keys score null)",
    10, ParamValidators.gtEq(1.0))
  def getMinCount: Int = get(minCount)
  def setMinCount(v: Int): StreamingAnomalyDetector = set(minCount, v)

  final val stateTtlMs: Param[Long] = param[Long](
    "stateTtlMs", "Event-time TTL for idle per-key Welford state; <= 0 keeps state " +
      "forever (parity default). Streaming only: an UNBOUNDED key space (user ids on " +
      "a years-long stream) grows the state store forever without it. orderCol is the " +
      "event-time clock — epoch milliseconds when numeric.", 0L)
  def getStateTtlMs: Long = get(stateTtlMs)
  def setStateTtlMs(v: Long): StreamingAnomalyDetector = set(stateTtlMs, v)

  final val watermarkDelay: Param[String] = param[String](
    "watermarkDelay", "Watermark delay (Spark interval string) installed on the " +
      "event-time clock when stateTtlMs > 0; doubles as the lateness tolerance.",
    "0 seconds")
  def getWatermarkDelay: String = get(watermarkDelay)
  def setWatermarkDelay(v: String): StreamingAnomalyDetector = set(watermarkDelay, v)

  override def transform(inputs: DataFrame*): Array[DataFrame] = {
    require(inputs.size == 1)
    val df = inputs.head
    val isTimestamp = df.schema(getOrderCol).dataType match {
      case org.apache.spark.sql.types.TimestampType |
           org.apache.spark.sql.types.TimestampNTZType => true
      case _ => false
    }
    val orderExpr =
      if (isTimestamp) unix_micros(col(getOrderCol).cast("timestamp"))
      else col(getOrderCol).cast("long")
    val ttl = getStateTtlMs
    val useTtl = df.isStreaming && ttl > 0
    // TTL clock in epoch ms: timestamps convert exactly; numeric order
    // values are epoch ms by convention (document at the call site)
    val tsExpr =
      if (!useTtl) lit(null).cast("timestamp")
      else if (isTimestamp) col(getOrderCol).cast("timestamp")
      else timestamp_millis(col(getOrderCol).cast("long"))
    val slim = df.select(
      col(getKeyCol).cast("string").as("key"),
      orderExpr.as("order"),
      col(getInputCol).cast("double").as("value"),
      tsExpr.as("__sad_ts"))
    if (df.isStreaming) {
      val withWm = if (useTtl) slim.withWatermark("__sad_ts", getWatermarkDelay) else slim
      Array(streamingPath(withWm, ttl))
    } else Array(batchPath(slim.drop("__sad_ts")))
  }

  /** Expanding-frame window plan: scalable batch scoring. */
  private def batchPath(slim: DataFrame): DataFrame = {
    val frame = Window.partitionBy("key").orderBy("order", "value")
      .rowsBetween(Window.unboundedPreceding, -1)
    val thr = getThreshold
    slim
      .withColumn("n_before", count("value").over(frame))
      .withColumn("__m", avg("value").over(frame))
      .withColumn("__sd", stddev_samp(col("value")).over(frame))
      .withColumn("z",
        when(col("n_before") >= getMinCount && col("__sd") > 0,
          abs(col("value") - col("__m")) / col("__sd")))
      .withColumn("anomaly", coalesce(col("z") > thr, lit(false)))
      .select("key", "order", "value", "n_before", "z", "anomaly")
  }

  /** Welford-state plan: O(1) state per key, update output mode. With
    * `stateTtlMs > 0` the state carries the key's max event-time ms and
    * expires once the watermark passes last-seen + TTL (the
    * [[StreamingDeduplicator]] eviction pattern); an expired key that
    * reappears simply starts cold again. */
  private def streamingPath(slim: DataFrame, ttl: Long): DataFrame = {
    val spark = slim.sparkSession
    import spark.implicits._
    val thr = getThreshold
    val minN = getMinCount
    val timeoutConf =
      if (ttl > 0) GroupStateTimeout.EventTimeTimeout else GroupStateTimeout.NoTimeout
    slim.as[(String, Long, Double, java.sql.Timestamp)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[(Long, Double, Double, Long), AnomalyScore](
        OutputMode.Update(), timeoutConf) {
        (key: String, events: Iterator[(String, Long, Double, java.sql.Timestamp)],
            state: GroupState[(Long, Double, Double, Long)]) =>
          if (state.hasTimedOut) {
            state.remove() // idle past TTL: forget the key, emit nothing
            Iterator.empty
          } else {
            var (n, mean, m2, maxMs) =
              state.getOption.getOrElse((0L, 0.0, 0.0, Long.MinValue))
            val out = events.toArray.sortBy(e => (e._2, e._3)).map { case (_, ord, x, ts) =>
              if (ts != null && ts.getTime > maxMs) maxMs = ts.getTime
              val sd = if (n > 1) math.sqrt(m2 / (n - 1)) else 0.0
              val z = if (n >= minN && sd > 0) Some(math.abs(x - mean) / sd) else None
              // Welford update AFTER scoring — the event never sees itself
              n += 1
              val d = x - mean
              mean += d / n
              m2 += d * (x - mean)
              AnomalyScore(key, ord, x, n - 1, z, z.exists(_ > thr))
            }
            state.update((n, mean, m2, maxMs))
            if (ttl > 0 && maxMs != Long.MinValue) {
              // a LATE arrival can put last-seen + TTL behind the current
              // watermark — Spark rejects past timeout instants, so clamp
              // to watermark + 1 (expires at the next opportunity)
              state.setTimeoutTimestamp(
                math.max(maxMs + ttl, state.getCurrentWatermarkMs() + 1))
            }
            out.iterator
          }
      }.toDF()
  }
}

object StreamingAnomalyDetector extends StageLoader[StreamingAnomalyDetector] {
  def load(spark: SparkSession, path: String): StreamingAnomalyDetector =
    ReadWrite.applyParams(new StreamingAnomalyDetector, path)
}
