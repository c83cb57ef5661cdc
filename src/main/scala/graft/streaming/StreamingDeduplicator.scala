package graft.streaming

import org.apache.spark.sql.{DataFrame, Encoders, Row, SparkSession}
import org.apache.spark.sql.catalyst.encoders.RowEncoder
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.apache.spark.sql.types._
import graft.api.{AlgoOperator, StageLoader}
import graft.param._
import graft.util.ReadWrite

/** Engine-managed dedup state for one content fingerprint: the
  * canonical (first-seen) document id, how many copies have been seen,
  * and the largest event time observed (drives the TTL timeout). */
private[streaming] case class DedupSeen(firstId: String, seen: Long, maxEventMs: Long)

/**
 * Exact content deduplication over an UNBOUNDED stream — the streaming
 * counterpart of [[graft.text.ExactDeduplicator]] and the answer to
 * "dedup a corpus that never stops arriving" (the reference trains on
 * infinite streams; its bounded relatives are the per-key state loops
 * in e.g. OnlineLogisticRegression.java:70-86).
 *
 * Each row is fingerprinted (normalize → md5, byte-identical to the
 * batch operator), grouped by fingerprint, and matched against
 * engine-managed `GroupState`: the first arrival becomes the canonical
 * copy (`is_duplicate = false`), every later arrival — in the same
 * micro-batch or months later — is flagged with the canonical id and
 * its occurrence ordinal. State lives in the streaming checkpoint, so
 * a killed-and-restarted query keeps recognizing duplicates of
 * everything it saw before the crash.
 *
 * The same `transform` works on a bounded DataFrame (state starts
 * empty, one pass per key, first = minimum id) and agrees exactly with
 * `ExactDeduplicator`'s flags — one code path, two execution modes.
 *
 * Scale shape (100 TB design): one shuffle on the 128-bit fingerprint;
 * state is O(distinct fingerprints) × ~60 bytes, sharded across
 * executors by the same hash — no driver state, no global structure.
 * For a truly unbounded corpus set `stateTtlMs`: fingerprints idle
 * past the TTL (measured in EVENT time against the watermark) are
 * dropped, bounding state at O(distinct keys per TTL window) at the
 * documented cost that a copy arriving after its original expired is
 * treated as a fresh first occurrence. TTL requires `timeCol` plus a
 * watermark the operator installs itself (`watermarkDelay`) — and
 * once that watermark exists, Spark drops input rows OLDER than it
 * before they reach the state function (spec-pinned), so
 * `watermarkDelay` doubles as the lateness tolerance; without TTL no
 * watermark is installed and nothing is ever dropped.
 *
 * Prefer [[StreamingDeduplicator.distinctStream]] when the need is
 * only "emit each distinct document once": it compiles to Spark's
 * native `dropDuplicatesWithinWatermark` — no custom state function at
 * all — but cannot mark duplicates or report canonical ids.
 */
class StreamingDeduplicator extends AlgoOperator[StreamingDeduplicator]
    with HasInputCol[StreamingDeduplicator] {

  final val idCol: Param[String] = param[String]("idCol", "Unique document id column.", "id")
  def getIdCol: String = get(idCol)
  def setIdCol(v: String): StreamingDeduplicator = set(idCol, v)

  final val timeCol: Param[String] =
    param[String]("timeCol", "Event-time column (epoch ms, numeric). Required when stateTtlMs > 0.", "")
  def getTimeCol: String = get(timeCol)
  def setTimeCol(v: String): StreamingDeduplicator = set(timeCol, v)

  final val stateTtlMs: Param[Long] =
    param[Long]("stateTtlMs", "Event-time TTL for per-fingerprint state; <= 0 keeps state forever.", 0L)
  def getStateTtlMs: Long = get(stateTtlMs)
  def setStateTtlMs(v: Long): StreamingDeduplicator = set(stateTtlMs, v)

  final val watermarkDelay: Param[String] =
    param[String]("watermarkDelay", "Watermark delay (Spark interval string) installed on timeCol for the TTL clock and distinctStream.", "0 seconds")
  def getWatermarkDelay: String = get(watermarkDelay)
  def setWatermarkDelay(v: String): StreamingDeduplicator = set(watermarkDelay, v)

  private def fingerprint: org.apache.spark.sql.Column =
    md5(to_binary(regexp_replace(lower(trim(col(getInputCol))), "\\s+", " "), lit("utf-8")))

  /** String round-trip for the id so one state type covers long/int/string ids. */
  private def idBack(dt: DataType): String => Any = dt match {
    case LongType    => s => s.toLong
    case IntegerType => s => s.toInt
    case StringType  => s => s
    case other => throw new IllegalArgumentException(
      s"StreamingDeduplicator supports long/int/string ids, got $other")
  }

  private def idOrder(dt: DataType): (String, String) => Boolean = dt match {
    case LongType | IntegerType => (a, b) => a.toLong < b.toLong
    case _ => (a, b) => a < b
  }

  override def transform(inputs: DataFrame*): Array[DataFrame] = {
    require(inputs.size == 1, "StreamingDeduplicator expects exactly one input table")
    val df0 = inputs.head
    val streaming = df0.isStreaming
    val ttl = getStateTtlMs
    if (ttl > 0) require(getTimeCol.nonEmpty, "stateTtlMs > 0 requires timeCol")
    // withColumn would silently REPLACE a pre-existing column of either
    // name (e.g. ExactDeduplicator chained upstream), and the emit path
    // strips the last column assuming it is ours — fail loudly instead
    require(!df0.columns.contains("content_fingerprint"),
      "StreamingDeduplicator: input already has a content_fingerprint column; drop or rename it first")
    require(!df0.columns.contains("__sdd_ts"),
      "StreamingDeduplicator: __sdd_ts is a reserved internal column name")

    val withFp = df0.withColumn("content_fingerprint", fingerprint)
    // TTL needs an event-time watermark; install it on a derived
    // timestamp so callers can keep epoch-ms longs in their schema.
    val withWm =
      if (streaming && ttl > 0)
        withFp.withColumn("__sdd_ts", timestamp_millis(col(getTimeCol).cast("long")))
          .withWatermark("__sdd_ts", getWatermarkDelay)
      else withFp
    val hasTsCol = streaming && ttl > 0

    val inSchema = withWm.schema
    val fpIdx = inSchema.fieldIndex("content_fingerprint")
    val idIdx = inSchema.fieldIndex(getIdCol)
    val idType = inSchema(idIdx).dataType
    val tsIdx = if (getTimeCol.nonEmpty && inSchema.fieldNames.contains(getTimeCol))
      inSchema.fieldIndex(getTimeCol) else -1
    val back = idBack(idType)
    val less = idOrder(idType)
    val dropTs = if (hasTsCol) 1 else 0 // strip the derived watermark column on emit

    val outSchema = StructType(
      inSchema.fields.dropRight(dropTs) ++ Seq(
        StructField("canonical_id", idType, nullable = true),
        StructField("is_duplicate", BooleanType, nullable = false),
        StructField("occurrence", LongType, nullable = false)))
    implicit val enc: org.apache.spark.sql.Encoder[Row] = RowEncoder.encoderFor(outSchema)

    val useTtl = streaming && ttl > 0
    val timeoutConf =
      if (useTtl) GroupStateTimeout.EventTimeTimeout()
      else GroupStateTimeout.NoTimeout

    val fn = (key: String, rows: Iterator[Row], state: GroupState[DedupSeen]) => {
      if (state.hasTimedOut) {
        state.remove() // idle past TTL: forget the fingerprint, emit nothing
        Iterator.empty
      } else {
        // Sort arrivals within the call by id so batch mode (all rows in
        // one call) matches the min-id oracle deterministically and a
        // micro-batch with an internal duplicate resolves stably.
        // Per-fingerprint groups are true copies only — tiny, safe to sort.
        val batch = rows.toArray.sortWith((a, b) =>
          less(String.valueOf(a.get(idIdx)), String.valueOf(b.get(idIdx))))
        var st = state.getOption.getOrElse(DedupSeen(null, 0L, Long.MinValue))
        val out = batch.iterator.map { r =>
          val rid = String.valueOf(r.get(idIdx))
          if (tsIdx >= 0 && !r.isNullAt(tsIdx)) {
            val t = r.get(tsIdx) match {
              case l: java.lang.Long => l.longValue()
              case i: java.lang.Integer => i.longValue()
              case other => String.valueOf(other).toLong
            }
            if (t > st.maxEventMs) st = st.copy(maxEventMs = t)
          }
          st = if (st.firstId == null) st.copy(firstId = rid, seen = 1L)
          else st.copy(seen = st.seen + 1L)
          Row.fromSeq(r.toSeq.dropRight(dropTs) ++
            Seq(back(st.firstId), st.firstId != rid, st.seen))
        }.toVector // materialize BEFORE touching state: Spark requires no state use after return
        state.update(st)
        if (useTtl && st.maxEventMs != Long.MinValue) {
          // event-time clock: expire when the watermark passes last-seen +
          // TTL. A LATE arrival can put that instant behind the current
          // watermark — Spark rejects past timeout timestamps, so clamp to
          // watermark + 1 (the state then expires at the next opportunity
          // instead of crashing the query).
          state.setTimeoutTimestamp(
            math.max(st.maxEventMs + ttl, state.getCurrentWatermarkMs() + 1))
        }
        out.iterator
      }
    }

    val out = withWm
      .groupByKey((r: Row) => r.getString(fpIdx))(Encoders.STRING)
      .flatMapGroupsWithState[DedupSeen, Row](OutputMode.Append, timeoutConf)(fn)(
        Encoders.product[DedupSeen], enc)
    Array(out.toDF())
  }

  /**
   * Spark-native "emit each distinct document once" over a stream:
   * fingerprint + watermark + `dropDuplicatesWithinWatermark`. State is
   * bounded by the watermark delay with engine-managed eviction. On a
   * bounded frame this degrades to plain `dropDuplicates` on the
   * fingerprint (keeping an arbitrary representative — use `transform`
   * when the canonical-id choice matters).
   */
  def distinctStream(df: DataFrame): DataFrame = {
    require(!df.columns.contains("content_fingerprint"),
      "StreamingDeduplicator: input already has a content_fingerprint column; drop or rename it first")
    require(!df.columns.contains("__sdd_ts"),
      "StreamingDeduplicator: __sdd_ts is a reserved internal column name")
    val withFp = df.withColumn("content_fingerprint", fingerprint)
    if (!df.isStreaming) withFp.dropDuplicates("content_fingerprint")
    else {
      require(getTimeCol.nonEmpty, "distinctStream on a stream requires timeCol")
      withFp.withColumn("__sdd_ts", timestamp_millis(col(getTimeCol).cast("long")))
        .withWatermark("__sdd_ts", getWatermarkDelay)
        .dropDuplicatesWithinWatermark("content_fingerprint")
        .drop("__sdd_ts")
    }
  }
}

object StreamingDeduplicator extends StageLoader[StreamingDeduplicator] {
  def load(spark: SparkSession, path: String): StreamingDeduplicator =
    ReadWrite.applyParams(new StreamingDeduplicator, path)
}
