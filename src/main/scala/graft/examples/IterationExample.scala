package graft.examples

import org.apache.spark.sql.functions._
import graft.iteration.{Loop, TerminateOnMaxIterOrTol}

/**
 * A CUSTOM iterative algorithm on the public iteration utility —
 * the Spark-side answer to reference users calling
 * `Iterations.iterateBoundedStreamsUntilTermination` directly
 * (flink-ml-iteration Iterations.java:124): you bring the per-round
 * dataflow, [[graft.iteration.Loop]] brings round counting, the
 * persist/checkpoint lifecycle, and the reference's termination
 * criteria.
 *
 * The algorithm here is PageRank over a small link graph: each round
 * joins ranks to edges, re-aggregates, and the loop stops when the
 * summed rank change drops to ≤ tol — TerminateOnMaxIterOrTol, the
 * same criterion SGD trains under.
 */
object IterationExample {
  def main(args: Array[String]): Unit = {
    val spark = ExampleSession.spark("IterationExample")
    import spark.implicits._

    val edges = Seq(
      (1L, 2L), (1L, 3L), (2L, 3L), (3L, 1L), (4L, 3L), (4L, 1L))
      .toDF("src", "dst").persist() // loop-invariant input: cache once
    val outDeg = edges.groupBy("src").agg(count(lit(1)).as("deg")).persist()
    val nodes = edges.select(col("src").as("id"))
      .union(edges.select(col("dst").as("id"))).distinct().persist()

    val init = nodes.withColumn("rank", lit(1.0))
    val damping = 0.85

    val result = Loop.iterateDataFrame(
      init,
      TerminateOnMaxIterOrTol(maxIter = 50, tol = 1e-4),
      checkpointEvery = 10,
      // convergence = total |Δrank| between consecutive (cached)
      // rounds; alias both sides — consecutive frames share lineage,
      // and an unaliased self-join is ambiguous to the analyzer
      criterion = (prev, cur) =>
        Some(prev.as("p").join(cur.as("q"), "id")
          .select(sum(abs(col("p.rank") - col("q.rank"))).as("delta"))
          .head().getDouble(0))
    ) { (ranks, _) =>
      val contribs = ranks
        .join(edges, ranks("id") === edges("src"))
        .join(outDeg, "src")
        .select(col("dst").as("id"), (col("rank") / col("deg")).as("c"))
      nodes.join(contribs.groupBy("id").agg(sum("c").as("c")), Seq("id"), "left")
        .select(col("id"),
          (lit(1 - damping) + lit(damping) * coalesce(col("c"), lit(0.0))).as("rank"))
    }

    println(s"converged after ${result.rounds} rounds; final deltas: " +
      result.history.takeRight(3).map(d => f"$d%.6f").mkString(", "))
    result.state.orderBy(desc("rank")).show(false)
    spark.stop()
  }
}
