package graft.graph

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/**
 * Distributed HITS — hubs and authorities (Kleinberg, "Authoritative
 * sources in a hyperlinked environment", JACM 1999) — the graph
 * tier's fourth member next to [[PageRank]], [[LabelPropagation]] and
 * [[graft.dedup.ConnectedComponents]]. Where PageRank assigns ONE
 * importance score, HITS separates "pages that point at good content"
 * (hubs: link directories, aggregator pages) from "content good pages
 * point at" (authorities) — on a crawl corpus the hub score is itself
 * a curation signal (boilerplate link farms score hub-high/
 * authority-low). The reference has no graph tier — beyond-reference
 * addition.
 *
 * Semantics (synchronous, per-step L1 normalization):
 *
 *   h₀(v) = 1/N
 *   a_{t+1}(v) = Σ_{(u,v)∈E} h_t(u)·w(u,v),   then a ← a / Σa
 *   h_{t+1}(v) = Σ_{(v,u)∈E} a_{t+1}(u)·w(v,u), then h ← h / Σh
 *
 * Kleinberg normalizes by L2; the iteration is LINEAR, so any
 * positive per-step scaling leaves every ratio — and therefore every
 * RANKING — identical, and L1 makes both score columns sum to 1
 * (comparable across graphs, same invariant as PageRank) and keeps
 * the fixed-iteration run exactly replayable in SQL. Vertices with no
 * in-edges get authority 0; vertices with no out-edges get hub 0;
 * self-loops are legal and kept (a self-link is both an out- and an
 * in-edge). Parallel edges vote with multiplicity, or with summed
 * `weightCol` weights (must be positive).
 *
 * Scale shape (100 TB link graph): the aggregated edge table persists
 * TWICE — hash-partitioned on src for the authority step's hub lookup
 * and on dst for the hub step's authority lookup — so the edge table
 * is never RE-partitioned after those two up-front shuffles; each
 * half-step's groupBy still exchanges the joined edge-sized
 * contribution table, but partial aggregation (map-side combine)
 * reduces the bytes that actually move to O(V) rows per round. Each
 * half-step lands in an eager
 * localCheckpoint of the unnormalized sums with the L1 constant
 * folded afterward as a flat projection (see the in-loop comment for
 * why per-half-step checkpointing is load-bearing here, unlike
 * PageRank's every-4th-round cut). With `tol` > 0 the loop stops
 * early once the hub vector's L1 movement falls below it — same
 * convergence contract as [[PageRank]] — so a converged graph stops
 * paying the per-round driver actions and checkpoint
 * materializations.
 *
 * Cache-release contract: simpler than PageRank's rename rule — the
 * result is an eager localCheckpoint of the final (id, hub,
 * authority) join, every internal cache is released before returning,
 * and the checkpoint RDDs are freed by the ContextCleaner once
 * unreachable. No unpersist required.
 */
object Hits {

  /** Instrumentation only: iterations the last run() took. */
  @volatile var lastIterations: Int = 0

  /**
   * @param edges     (src, dst [, weight]) rows; any orderable vertex type.
   * @param srcCol    edge-source column name.
   * @param dstCol    edge-destination column name.
   * @param numIter   maximum iteration count (exact count when tol = 0,
   *                  for deterministic replay).
   * @param tol       when > 0, stop early once Σ|h_{t+1} − h_t| < tol
   *                  (the hub vector moves last each round, so its L1
   *                  delta bounds the authority one by linearity).
   * @param weightCol optional edge-weight column name; "" = unweighted.
   * @param idOut     output vertex-id column name.
   * @param hubOut    output hub-score column name.
   * @param authOut   output authority-score column name.
   * @return one row per vertex appearing in `edges`; hub and authority
   *         each sum to 1.
   */
  def run(edges: DataFrame, srcCol: String = "src", dstCol: String = "dst",
      numIter: Int = 20, tol: Double = 0.0, weightCol: String = "",
      idOut: String = "id", hubOut: String = "hub",
      authOut: String = "authority"): DataFrame = {
    require(numIter > 0, s"numIter must be positive, got $numIter")
    require(tol >= 0.0, s"tol must be >= 0, got $tol")

    // the guard tests the CASTED value for null, so a non-numeric
    // string weight raises like a non-positive one instead of casting
    // to null and silently dropping the edge inside sum()
    val w =
      if (weightCol.isEmpty) lit(1.0)
      else {
        val wd = col(weightCol).cast("double")
        when(wd.isNull || wd <= 0.0,
            raise_error(concat(lit(s"Hits: non-positive/null/non-numeric weight in '$weightCol' on edge "),
              col(srcCol).cast("string"), lit(" -> "), col(dstCol).cast("string")))
              .cast("double"))
          .otherwise(wd)
      }

    val agg = edges
      .select(col(srcCol).as("src"), col(dstCol).as("dst"), w.as("w"))
      .groupBy("src", "dst").agg(sum("w").as("w"))
    val bySrc = agg.repartition(col("src")).persist(StorageLevel.MEMORY_AND_DISK)
    // derived from the CACHED src-keyed table, not from agg: the merge
    // aggregation scans the edge input once instead of twice (bySrc is
    // always materialized first — the authority half-step runs before
    // the hub half-step in round 1)
    val byDst = bySrc.repartition(col("dst")).persist(StorageLevel.MEMORY_AND_DISK)

    // distinct() already leaves the table hash-partitioned on id — an
    // explicit repartition(id) on top would be a second identical
    // exchange of the same O(V) rows
    val nodes = edges.select(col(srcCol).as("id"))
      .union(edges.select(col(dstCol).as("id")))
      .distinct()
      .persist(StorageLevel.MEMORY_AND_DISK)
    val n = nodes.count()
    require(n > 0, "HITS on an empty edge list is undefined")

    // Every half-step lands in an eager localCheckpoint of the
    // UNNORMALIZED per-vertex sums, and the L1 normalization is a flat
    // projection over that checkpoint with the constant folded as a
    // literal. Checkpointing per half-step is not optional here: a
    // two-table iteration chains FOUR InMemoryRelations per round, and
    // IMR string rendering re-prints its child tree — measured ×16
    // plan-TEXT growth per round, 300 MB of explain string by round 3
    // (AQE renders it on every plan update), an OOM on any modest
    // driver. With the checkpoint the plan is a LogicalRDD scan every
    // round: flat forever, no persist/unpersist choreography, and the
    // per-round z constants are O(V) aggregates over checkpointed
    // data. Old checkpoint RDDs are freed by the ContextCleaner as
    // the score tables are reassigned.
    var hubs = nodes.select(col("id"), lit(1.0 / n).as("h"))
    var auths: DataFrame = null
    var iter = 0
    var converged = false
    while (iter < numIter && !converged) {
      val prevHubs = hubs
      // authority step: hub mass flows along edge direction
      val rawA = nodes.join(
          bySrc.join(hubs.withColumnRenamed("id", "src"), "src")
            .groupBy(col("dst").as("id"))
            .agg(sum(col("w") * col("h")).as("ra")),
          Seq("id"), "left")
        .select(col("id"), coalesce(col("ra"), lit(0.0)).as("ra"))
        .localCheckpoint(true)
      val za = rawA.agg(sum("ra")).head.getDouble(0)
      auths = rawA.select(col("id"), (col("ra") / za).as("a"))
      // hub step: authority mass flows AGAINST edge direction
      val rawH = nodes.join(
          byDst.join(auths.withColumnRenamed("id", "dst"), "dst")
            .groupBy(col("src").as("id"))
            .agg(sum(col("w") * col("a")).as("rh")),
          Seq("id"), "left")
        .select(col("id"), coalesce(col("rh"), lit(0.0)).as("rh"))
        .localCheckpoint(true)
      val zh = rawH.agg(sum("rh")).head.getDouble(0)
      hubs = rawH.select(col("id"), (col("rh") / zh).as("h"))
      iter += 1
      if (tol > 0.0 && iter < numIter) {
        // O(V) join of two checkpoint-backed flat projections — one
        // extra driver action per round, only on the tol path
        val delta = hubs.withColumnRenamed("h", "hn")
          .join(prevHubs.withColumnRenamed("h", "hp"), "id")
          .agg(sum(abs(col("hn") - col("hp")))).head.getDouble(0)
        converged = delta < tol
      }
    }
    lastIterations = iter
    // eager checkpoint of the final join, then release EVERYTHING —
    // the returned data lives in a checkpoint RDD the ContextCleaner
    // frees once the DataFrame is unreachable (no unpersist contract
    // for callers to get wrong)
    val out = hubs
      .join(auths.withColumnRenamed("a", "__a"), "id")
      .select(col("id").as(idOut), col("h").as(hubOut), col("__a").as(authOut))
      .localCheckpoint(true)
    bySrc.unpersist(blocking = false)
    byDst.unpersist(blocking = false)
    nodes.unpersist(blocking = false)
    out
  }
}
