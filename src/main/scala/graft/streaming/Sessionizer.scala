package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.api.{AlgoOperator, StageLoader}
import graft.param._
import graft.util.ReadWrite

/**
 * Gap-based sessionization: within each key, consecutive rows whose
 * time gap exceeds `gapMs` start a new session; the output appends a
 * 1-based per-key session ordinal (`sessionCol`) and the session's
 * start time (`sessionStartCol`). The batch analog of
 * [[EventTimeSessionWindows]] (reference
 * common/window/EventTimeSessionWindows.java) exposed as a standalone
 * operator for event-pipeline feature engineering.
 *
 * Scale shape (100 TB design): one exchange on the key and two
 * codegen'd window passes (lag → running sum → running max) — never a
 * global sort; each key's rows sort independently inside its
 * partition. Rows tied on the timestamp always land in the same
 * session regardless of their arbitrary relative order (their gap is
 * zero), so the assignment is deterministic under any partitioning.
 */
class Sessionizer extends AlgoOperator[Sessionizer] {

  final val keyCols: Param[Array[String]] =
    param[Array[String]]("keyCols", "Columns identifying the session owner (e.g. user).",
      Array.empty[String], (a: Array[String]) => a != null)
  def getKeyCols: Array[String] = get(keyCols)
  def setKeyCols(v: String*): Sessionizer = set(keyCols, v.toArray)

  final val timeCol: Param[String] =
    param[String]("timeCol", "Event-time column (numeric, e.g. epoch ms).", "ts")
  def getTimeCol: String = get(timeCol)
  def setTimeCol(v: String): Sessionizer = set(timeCol, v)

  final val gapMs: Param[Long] =
    param[Long]("gapMs", "Inactivity gap that closes a session.", 30L * 60 * 1000,
      ParamValidators.gt(0L))
  def getGapMs: Long = get(gapMs)
  def setGapMs(v: Long): Sessionizer = set(gapMs, v)

  final val sessionCol: Param[String] =
    param[String]("sessionCol", "Output column holding the 1-based per-key session ordinal.", "session")
  def getSessionCol: String = get(sessionCol)
  def setSessionCol(v: String): Sessionizer = set(sessionCol, v)

  final val sessionStartCol: Param[String] =
    param[String]("sessionStartCol", "Output column holding the session's first timestamp.", "session_start")
  def getSessionStartCol: String = get(sessionStartCol)
  def setSessionStartCol(v: String): Sessionizer = set(sessionStartCol, v)

  /**
   * Session AGGREGATION via Spark's native `session_window` — one row
   * per closed session (keys, start, end = last event + gap, event
   * count). Unlike [[transform]] (per-event ordinals, bounded input
   * only) this runs UNBOUNDED: on a stream the operator installs a
   * watermark (`delay`) and the engine finalizes and emits a session
   * once the watermark passes its gap — engine-managed state with
   * merge-on-late-arrival inside the delay, the genuine streaming
   * counterpart of the reference's EventTimeSessionWindows
   * (common/window/EventTimeSessionWindows.java).
   *
   * Scale shape: one shuffle on the keys; session state is
   * O(open sessions) in the state store, evicted at watermark — no
   * per-key history. Works identically on a bounded frame (no
   * watermark, one pass), where it equals transform()'s session count
   * per key.
   */
  def sessions(df: DataFrame, delay: String = "0 seconds"): DataFrame = {
    require(getKeyCols.nonEmpty, "keyCols must be set")
    val base = df.withColumn("__sz_ts", timestamp_millis(col(getTimeCol).cast("long")))
    val wm = if (df.isStreaming) base.withWatermark("__sz_ts", delay) else base
    val keys = getKeyCols.toSeq.map(col)
    wm.groupBy(session_window(col("__sz_ts"), s"$getGapMs milliseconds") +: keys: _*)
      .agg(count(lit(1)).as("n_events"))
      .select(keys ++ Seq(
        unix_millis(col("session_window.start")).as(getSessionStartCol),
        unix_millis(col("session_window.end")).as("session_end"),
        col("n_events")): _*)
  }

  override def transform(inputs: DataFrame*): Array[DataFrame] = {
    require(inputs.size == 1, "Sessionizer expects exactly one input table")
    require(getKeyCols.nonEmpty, "keyCols must be set")
    val df = inputs.head
    val keys = getKeyCols.toSeq.map(col)
    val ts = col(getTimeCol).cast("long")
    val wOrd = Window.partitionBy(keys: _*).orderBy(ts)
    val wRun = wOrd.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // the flag must be a plain column before the running sums — Spark
    // rejects a window expression nested inside another window function.
    // Same partitioning + ordering, so all passes share one sort.
    val flagged = df.withColumn("__sz_new",
      when(lag(ts, 1).over(wOrd).isNull || ts - lag(ts, 1).over(wOrd) > getGapMs, 1L)
        .otherwise(0L))
    val out = flagged
      .withColumn(getSessionCol, sum(col("__sz_new")).over(wRun))
      .withColumn(getSessionStartCol,
        max(when(col("__sz_new") === 1L, ts)).over(wRun))
      .drop("__sz_new")
    Array(out)
  }
}
object Sessionizer extends StageLoader[Sessionizer] {
  def load(spark: SparkSession, path: String): Sessionizer =
    ReadWrite.applyParams(new Sessionizer, path)
}
