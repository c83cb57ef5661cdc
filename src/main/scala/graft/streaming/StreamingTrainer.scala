package graft.streaming

import java.util.concurrent.atomic.AtomicReference
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.{DataStreamWriter, StreamingQuery, Trigger}

/**
 * Production wiring for the online estimators: attaches a model's
 * per-micro-batch `update` to an unbounded DataFrame and exposes the
 * live model. This packages the readStream → foreachBatch →
 * model-version pattern (the Spark analog of the reference's
 * unbounded training loops, e.g. OnlineKMeans.java:86,169-175 /
 * OnlineLogisticRegression.java:70-86) so callers don't hand-roll it:
 *
 * {{{
 * val handle = StreamingTrainer.attach(
 *   stream,                                  // streaming DataFrame
 *   new OnlineKMeansModel().setModelData(init),
 *   (m: OnlineKMeansModel, b: DataFrame) => m.update(b, "features"),
 *   checkpoint = Some("/chk/okm"))
 * handle.query.awaitTermination()
 * val modelNow = handle.latest()             // any thread, any time
 * }}}
 *
 * Each micro-batch is one global batch / one count window — the
 * documented divergence from the reference's record-epoch semantics
 * (micro-batch boundaries replace epoch watermarks; the per-batch
 * math is identical). `latest()` is safe to call concurrently with
 * training: updates swap an AtomicReference after the batch commits.
 *
 * Scale shape: each update is a distributed aggregation of the
 * micro-batch (partial+final); only O(model) state crosses the
 * driver. Checkpointing gives at-least-once batch delivery on
 * restart; the model itself lives in the driver — persist versions
 * via `Model.save` from a listener if durability is needed.
 */
object StreamingTrainer {

  /** Live handle: the running query plus a lock-free model getter. */
  final case class Handle[M](query: StreamingQuery, latest: () => M)

  /**
   * Start updating `initial` from `stream`. `configure` can adjust
   * the writer (trigger, outputMode, queryName) before start.
   */
  def attach[M](
      stream: DataFrame,
      initial: M,
      update: (M, DataFrame) => M,
      checkpoint: Option[String] = None,
      configure: DataStreamWriter[org.apache.spark.sql.Row] => DataStreamWriter[org.apache.spark.sql.Row] =
        identity): Handle[M] = {
    require(stream.isStreaming, "StreamingTrainer.attach expects a streaming DataFrame; " +
      "for bounded input call the estimator's fit() instead")
    val ref = new AtomicReference[M](initial)
    val writer0 = stream.writeStream
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
        // single-threaded per query: micro-batches are serialized by
        // the streaming engine, so get-then-set is race-free here
        ref.set(update(ref.get(), batch))
      }
    val writer1 = checkpoint.fold(writer0)(c => writer0.option("checkpointLocation", c))
    Handle(configure(writer1).start(), () => ref.get())
  }

  /** attach() with a processing-time trigger — the common deployment. */
  def attachWithTrigger[M](
      stream: DataFrame,
      initial: M,
      update: (M, DataFrame) => M,
      intervalMs: Long,
      checkpoint: Option[String] = None): Handle[M] =
    attach(stream, initial, update, checkpoint,
      w => w.trigger(Trigger.ProcessingTime(intervalMs)))
}
