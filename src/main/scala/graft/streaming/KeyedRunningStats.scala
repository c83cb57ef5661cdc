package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout}

/** Per-key running statistics emitted after each update. */
case class KeyStats(key: String, n: Long, mean: Double, variance: Double)

/**
 * Arbitrary-stateful streaming via mapGroupsWithState: per-key running
 * count/mean/variance (Welford's algorithm) held in engine-managed
 * GroupState, updated by every micro-batch and emitted as a stats
 * stream — the KeyValueGroupedDataset custom-state path for logic that
 * windowed aggregates can't express (here: exact running variance that
 * never re-reads history).
 *
 * Works identically on a batch DataFrame (state starts empty, one pass)
 * and on a stream in update output mode (state persists across
 * micro-batches and restarts via the checkpoint).
 */
object KeyedRunningStats {

  def runningMoments(df: DataFrame, keyCol: String, valueCol: String): Dataset[KeyStats] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(keyCol).cast("string"), col(valueCol).cast("double")).as[(String, Double)]
      .groupByKey(_._1)
      .mapGroupsWithState[(Long, Double, Double), KeyStats](GroupStateTimeout.NoTimeout) {
        (key: String, values: Iterator[(String, Double)],
            state: GroupState[(Long, Double, Double)]) =>
          var (n, mean, m2) = state.getOption.getOrElse((0L, 0.0, 0.0))
          values.foreach { case (_, x) =>
            n += 1
            val d = x - mean
            mean += d / n
            m2 += d * (x - mean)
          }
          state.update((n, mean, m2))
          KeyStats(key, n, mean, if (n > 1) m2 / (n - 1) else 0.0)
      }
  }
}
