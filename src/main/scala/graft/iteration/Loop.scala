package graft.iteration

import org.apache.spark.sql.DataFrame
import org.apache.spark.storage.StorageLevel

/**
 * Termination criteria for driver-loop iteration — the Spark-side
 * counterpart of the reference's criteria stream
 * (flink-ml-core common/iteration/TerminateOnMaxIter.java,
 * TerminateOnMaxIterOrTol.java). A criterion is consulted BEFORE each
 * round with the number of completed rounds and the last round's
 * reported criterion value (e.g. reduced loss / total weight).
 */
sealed trait Termination extends Serializable {
  def shouldStop(roundsCompleted: Int, lastCriterion: Option[Double]): Boolean
}

/** Run exactly `maxIter` rounds (reference TerminateOnMaxIter.java:
  * continue while epochWatermark + 1 < maxIter). */
final case class TerminateOnMaxIter(maxIter: Int) extends Termination {
  def shouldStop(rounds: Int, last: Option[Double]): Boolean = rounds >= maxIter
}

/** At most `maxIter` rounds, stopping early once a round's criterion
  * is ≤ `tol` (reference TerminateOnMaxIterOrTol.java: "terminate
  * once any input value is smaller than or equal to the given tol" —
  * note ≤, not <; SGD.java:134-142 feeds it totalLoss/totalWeight). */
final case class TerminateOnMaxIterOrTol(maxIter: Int, tol: Double) extends Termination {
  def shouldStop(rounds: Int, last: Option[Double]): Boolean =
    rounds >= maxIter || last.exists(_ <= tol)
}

/** Result of a [[Loop]] run: the final state, rounds executed, and
  * every round's reported criterion value in order. */
final case class LoopResult[S](state: S, rounds: Int, history: Array[Double])

/**
 * Driver-loop iteration: the Spark-first replacement for the
 * reference's user-composable iteration API
 * (flink-ml-iteration Iterations.java:124,
 * `iterateBoundedStreamsUntilTermination`). The reference runs an
 * epoch-watermarked dataflow cycle; on Spark the same algorithms are
 * a driver while-loop whose per-round work is ordinary distributed
 * jobs (broadcast state out, treeAggregate feedback in) — Catalyst
 * and the scheduler handle the distribution, the loop stays on the
 * driver. KMeans and SGD run on this utility; it is public so users
 * can build their own iterative algorithms the way reference users
 * call Iterations directly.
 */
object Loop {

  /**
   * Iterate `body` from `init` until `termination` fires. The body
   * receives (state, 0-based round index) and returns the next state
   * plus an optional criterion value fed to the termination check
   * (and recorded in the result's history).
   *
   * State persistence is the CALLER's concern here — driver-resident
   * state (model arrays) needs none; for DataFrame-valued state use
   * [[iterateDataFrame]], which owns the persist/unpersist/checkpoint
   * lifecycle.
   */
  def iterate[S](init: S, termination: Termination)(
      body: (S, Int) => (S, Option[Double])): LoopResult[S] = {
    var state = init
    var rounds = 0
    var last: Option[Double] = None
    val history = scala.collection.mutable.ArrayBuffer.empty[Double]
    while (!termination.shouldStop(rounds, last)) {
      val (next, crit) = body(state, rounds)
      state = next
      crit.foreach(history += _)
      last = crit
      rounds += 1
    }
    LoopResult(state, rounds, history.toArray)
  }

  /**
   * [[iterate]] for DataFrame-valued state, with the lineage
   * management every long Spark loop needs and the reference's
   * runtime did implicitly: each round's output is persisted and
   * materialized, the previous round's is unpersisted, and every
   * `checkpointEvery` rounds the plan is truncated with an eager
   * localCheckpoint — without which plan depth grows per round and
   * Catalyst re-analysis makes round N cost O(N) (the lesson baked
   * into ConnectedComponents/BpeTrainer, here for user algorithms).
   *
   * `criterion(previous, current)` — if supplied — is evaluated AFTER
   * the round's frame is persisted and materialized, so a delta
   * aggregate (the usual convergence test) reads two cached frames
   * instead of recomputing the round.
   */
  def iterateDataFrame(init: DataFrame, termination: Termination, checkpointEvery: Int = 10,
      criterion: (DataFrame, DataFrame) => Option[Double] = (_, _) => None)(
      body: (DataFrame, Int) => DataFrame): LoopResult[DataFrame] = {
    var prev: Option[DataFrame] = None
    val result = iterate(init, termination) { (state, round) =>
      val nextRaw = body(state, round)
      val next =
        if (checkpointEvery > 0 && (round + 1) % checkpointEvery == 0)
          nextRaw.localCheckpoint(true) // eager: also truncates lineage
        else {
          val p = nextRaw.persist(StorageLevel.MEMORY_AND_DISK)
          p.count() // materialize so unpersisting the parent is safe
          p
        }
      val crit = criterion(state, next)
      prev.foreach(_.unpersist(blocking = false))
      prev = Some(next)
      (next, crit)
    }
    result
  }
}
