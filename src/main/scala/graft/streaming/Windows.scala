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
