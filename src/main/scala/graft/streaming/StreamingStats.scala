package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Structured-Streaming-native windowed statistics: the readStream →
 * watermark → tumbling-window aggregate → writeStream path, for
 * continuous monitoring of a feature stream (per-window count / mean /
 * std / min / max of a numeric column).
 *
 * Complements the model-stream estimators (OnlineStandardScaler etc.),
 * which consume micro-batches via foreachBatch: this one is a pure
 * streaming aggregation, so state is managed by the engine — the
 * watermark bounds it and late data beyond the delay is dropped, which
 * is what lets the query run forever on an unbounded stream.
 */
object StreamingStats {

  /**
   * @param df streaming (or batch) DataFrame
   * @param timeCol timestamp column
   * @param valueCol numeric column to summarize
   * @param windowDuration e.g. "10 seconds"
   * @param watermarkDelay max lateness, e.g. "5 seconds"
   * @return streaming DataFrame (window_start, window_end, n, mean, std,
   *         min, max) — append-mode compatible: a window emits once the
   *         watermark passes its end
   */
  def windowedMoments(df: DataFrame, timeCol: String, valueCol: String,
      windowDuration: String, watermarkDelay: String): DataFrame = {
    df.withWatermark(timeCol, watermarkDelay)
      .groupBy(window(col(timeCol), windowDuration))
      .agg(
        count(lit(1)).as("n"),
        avg(col(valueCol)).as("mean"),
        stddev_samp(col(valueCol)).as("std"),
        min(col(valueCol)).as("min"),
        max(col(valueCol)).as("max"))
      .select(col("window.start").as("window_start"), col("window.end").as("window_end"),
        col("n"), col("mean"), col("std"), col("min"), col("max"))
  }
}
