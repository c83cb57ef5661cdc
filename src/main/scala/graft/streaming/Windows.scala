package graft.streaming

import graft.param.{Param, ParamCodec, WithParams}
import org.json4s._

/**
 * Windowing strategies for the online estimators, mirroring the
 * reference ADT (flink-ml-core common/window: Windows.java and the
 * five concrete strategies). A window splits
 * the training input into mini-batches; each online estimator emits
 * one model version per window.
 *
 * In Spark terms: count windows batch by global arrival index,
 * event-time windows by `floor(eventTime / size)` (the grouping
 * Structured Streaming uses for tumbling windows), sessions by
 * gap-splitting over the sorted event times, and the global window is
 * plain batch fitting.
 */
sealed trait Windows extends Serializable

case object GlobalWindows extends Windows

final case class CountTumblingWindows(size: Long) extends Windows {
  require(size > 0, "window size must be positive")
}

final case class EventTimeTumblingWindows(sizeMs: Long) extends Windows {
  require(sizeMs > 0, "window size must be positive")
}

final case class EventTimeSessionWindows(gapMs: Long) extends Windows {
  require(gapMs > 0, "session gap must be positive")
}

/**
 * Processing-time tumbling windows (reference
 * common/window/ProcessingTimeTumblingWindows.java). A bounded batch
 * replay is processed "instantly" in processing time, so every row
 * lands in the same wall-clock window and the batch simulation
 * degenerates to [[GlobalWindows]] (one model version over all
 * input). In true Structured Streaming the analog is one model
 * update per micro-batch trigger interval — drive `model.update`
 * from `foreachBatch` with a processing-time trigger of `sizeMs`.
 */
final case class ProcessingTimeTumblingWindows(sizeMs: Long) extends Windows {
  require(sizeMs > 0, "window size must be positive")
}

/**
 * Processing-time session windows (reference
 * common/window/ProcessingTimeSessionWindows.java). A bounded batch
 * replay has no idle gaps in processing time — rows arrive
 * back-to-back — so every batch collapses into a single session: the
 * batch simulation degenerates to [[GlobalWindows]] (one model
 * version covering all input). Documented rather than hidden so
 * callers porting reference configs see the same window type names.
 */
final case class ProcessingTimeSessionWindows(gapMs: Long) extends Windows {
  require(gapMs > 0, "session gap must be positive")
}

object Windows {
  /** JSON codec so window params persist like any other param. */
  implicit val codec: ParamCodec[Windows] = new ParamCodec[Windows] {
    def encode(v: Windows): JValue = v match {
      case GlobalWindows => JObject("type" -> JString("global"))
      case CountTumblingWindows(n) =>
        JObject("type" -> JString("countTumbling"), "size" -> JLong(n))
      case EventTimeTumblingWindows(ms) =>
        JObject("type" -> JString("eventTimeTumbling"), "sizeMs" -> JLong(ms))
      case EventTimeSessionWindows(ms) =>
        JObject("type" -> JString("eventTimeSession"), "gapMs" -> JLong(ms))
      case ProcessingTimeTumblingWindows(ms) =>
        JObject("type" -> JString("processingTimeTumbling"), "sizeMs" -> JLong(ms))
      case ProcessingTimeSessionWindows(ms) =>
        JObject("type" -> JString("processingTimeSession"), "gapMs" -> JLong(ms))
    }
    def decode(j: JValue): Windows = {
      def long(field: String): Long = j \ field match {
        case JLong(l) => l; case JInt(i) => i.toLong; case _ => sys.error(s"missing $field")
      }
      j \ "type" match {
        case JString("global") => GlobalWindows
        case JString("countTumbling") => CountTumblingWindows(long("size"))
        case JString("eventTimeTumbling") => EventTimeTumblingWindows(long("sizeMs"))
        case JString("eventTimeSession") => EventTimeSessionWindows(long("gapMs"))
        case JString("processingTimeTumbling") => ProcessingTimeTumblingWindows(long("sizeMs"))
        case JString("processingTimeSession") => ProcessingTimeSessionWindows(long("gapMs"))
        case other => sys.error(s"unknown window type $other")
      }
    }
  }
}

trait HasWindows[T] extends WithParams[T] {
  import Windows.codec
  final val windows: Param[Windows] =
    param[Windows]("windows", "Windowing strategy for the model stream.", GlobalWindows)
  def getWindows: Windows = get(windows)
  def setWindows(v: Windows): T = set(windows, v)
}

/**
 * Shared bounded-replay window assignment for the windowed online
 * estimators ([[OnlineStandardScaler]], [[OnlinePCA]]): maps an input
 * to `(win, winEnd, <inputCol>)` rows per the [[Windows]] strategy,
 * so every cumulative-moment estimator shares ONE implementation of
 * the reference's window semantics (count windows only fire full
 * windows — Flink countWindowAll; event-time tumbling groups by
 * `floor(t / size)`; sessions gap-split the sorted event times with
 * cross-partition stitching; processing-time strategies degenerate to
 * the global window on a bounded replay — see the ADT scaladoc).
 * Factored verbatim out of OnlineStandardScaler.fit.
 *
 * `inputCol` must be an ml Vector column (all callers' feature type).
 */
private[streaming] object WindowAssigner {
  import org.apache.spark.sql.DataFrame
  import org.apache.spark.sql.functions._
  import org.apache.spark.ml.linalg.Vector

  def assign(df: DataFrame, windows: Windows, timeCol: String, inputCol: String): DataFrame =
    windows match {
      case GlobalWindows =>
        df.select(lit(0L).as("win"), lit(Long.MaxValue).as("winEnd"), col(inputCol))
      case CountTumblingWindows(size) =>
        // count triggers only fire FULL windows (Flink countWindowAll
        // semantics; same batch mapping as AgglomerativeClustering):
        // the trailing partial window emits no model version
        val spark = df.sparkSession
        val indexed = df.select(col(inputCol)).rdd.zipWithIndex()
        val n = df.count()
        val fullRows = (n / size) * size
        val rdd = indexed
          .filter { case (_, i) => i < fullRows }
          .map { case (r, i) => (i / size, r.getAs[Vector](0)) }
        import spark.implicits._
        rdd.toDF("win", "vec").select(col("win"), col("win").as("winEnd"),
          col("vec").as(inputCol))
      case EventTimeTumblingWindows(sizeMs) =>
        df.select((col(timeCol).cast("long") / sizeMs).cast("long").as("win"),
          (((col(timeCol).cast("long") / sizeMs).cast("long") + 1) * sizeMs).as("winEnd"),
          col(inputCol))
      case EventTimeSessionWindows(gapMs) =>
        // Scalable global sessionization: range-partition the distinct
        // event times, gap-split locally inside each sorted partition,
        // then stitch sessions across partition boundaries on the
        // driver from an O(partitions) summary — no single-task sort
        // of the full distinct-timestamp table.
        val spark2 = df.sparkSession
        import spark2.implicits._
        val distinctTs = df.select(col(timeCol).cast("long").as("t")).distinct()
          .as[Long].rdd
        val parts = math.max(1, distinctTs.sparkContext.defaultParallelism)
        val sorted = distinctTs.sortBy(identity, ascending = true, numPartitions = parts)
        // pass 1: per-partition (firstT, lastT, localSessionCount)
        val summaries = sorted.mapPartitionsWithIndex { (pid, it) =>
          var first = Long.MinValue; var last = Long.MinValue
          var n = 0L; var prev = Long.MinValue
          it.foreach { t =>
            if (n == 0L) { first = t; n = 1L }
            else if (t - prev > gapMs) n += 1L
            prev = t; last = t
          }
          if (n == 0L) Iterator.empty else Iterator.single((pid, first, last, n))
        }.collect().sortBy(_._1)
        // driver scan: global id offset per partition; a partition's
        // first local session merges into the previous non-empty
        // partition's last session when the boundary gap is <= gapMs
        val offsets = new Array[Long](parts)
        var nextId = 0L; var prevLast = Long.MinValue; var havePrev = false
        summaries.foreach { case (pid, first, _last, n) =>
          val merged = havePrev && first - prevLast <= gapMs
          offsets(pid) = if (merged) nextId - 1L else nextId
          nextId = offsets(pid) + n
          prevLast = _last; havePrev = true
        }
        val offsetsB = sorted.sparkContext.broadcast(offsets)
        // pass 2: assign global session ids inside each partition
        val sessions = sorted.mapPartitionsWithIndex { (pid, it) =>
          val base = offsetsB.value(pid)
          var sid = base - 1L; var prev = Long.MinValue; var started = false
          it.map { t =>
            if (!started || t - prev > gapMs) { sid += 1L; started = true }
            prev = t
            (t, sid)
          }
        }.toDF("t", "win")
        // session end = max event time in the session + gap; computed on
        // the (small) per-session summary, then joined back on t. AQE
        // broadcasts these when they fit; no unpartitioned sort anywhere.
        val winEnds = sessions.groupBy("win").agg((max("t") + gapMs).as("winEnd"))
        val labeled = sessions.join(winEnds, "win")
        df.select(col(timeCol).cast("long").as("t"), col(inputCol))
          .join(labeled, "t")
          .select(col("win"), col("winEnd"), col(inputCol))
      case ProcessingTimeTumblingWindows(_) | ProcessingTimeSessionWindows(_) =>
        // bounded replay runs "instantly" in processing time: one
        // window (see Windows scaladoc); streaming callers get
        // per-trigger updates via foreachBatch + model.update
        df.select(lit(0L).as("win"), lit(Long.MaxValue).as("winEnd"), col(inputCol))
    }
}
