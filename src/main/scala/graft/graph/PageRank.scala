package graft.graph

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/**
 * Distributed PageRank over an edge list (Brin & Page 1998) — the
 * link-graph centrality primitive a crawl-curation pipeline ranks
 * hosts/pages with (Common Crawl publishes exactly this as its
 * host-level ranking). Sits next to
 * [[graft.dedup.ConnectedComponents]] as this engine's second graph
 * operator; the reference has no graph tier at all — beyond-reference
 * addition.
 *
 * Semantics (the standard formulation, dangling mass redistributed
 * uniformly): with damping d over N vertices,
 *
 *   r₀(v) = 1/N
 *   r_{t+1}(v) = (1−d)/N + d·( Σ_{(u,v)∈E} r_t(u)·w(u,v)/out(u) + D_t/N )
 *
 * where out(u) is u's total out-weight (edge COUNT when unweighted —
 * parallel edges contribute multiply) and D_t = Σ r_t(u) over DANGLING
 * vertices (no out-edges), so every iteration's ranks sum to 1 — the
 * probability-distribution invariant that makes ranks comparable
 * across graphs. Self-loops are legal and kept.
 *
 * Scale shape (100 TB link graph): the edge table is aggregated once
 * to (src, dst, share = w/out) and persisted HASH-PARTITIONED ON src —
 * every iteration's rank join then reuses that partitioning, so only
 * the O(V) rank table shuffles per round, never the O(E) edges; the
 * per-destination contribution sum is map-side combined to O(V) rows.
 * Dangling mass is one tiny aggregate over the (persisted) dangling-id
 * anti-join. Lineage is cut with localCheckpoint every few rounds
 * (the ConnectedComponents lesson: iterative plans must not nest).
 */
object PageRank {

  /** Instrumentation only: iterations the last run() took. */
  @volatile var lastIterations: Int = 0

  private val CheckpointEvery = 4

  /**
   * @param edges     (src, dst [, weight]) rows; any orderable vertex type.
   * @param dampingFactor classic 0.85.
   * @param numIter   fixed iteration count (deterministic replay).
   * @param tol       when > 0, stop early once Σ|r_{t+1} − r_t| < tol
   *                  (checked with one extra O(V) aggregate per round).
   * @param weightCol optional edge-weight column name; "" = unweighted.
   *                  Weights must be positive (zero/negative raise).
   * @param idOut     output vertex-id column name (callers that would
   *                  otherwise rename via a `.select` projection should
   *                  pass the final name here instead — see @return).
   * @param rankOut   output rank column name.
   * @return (idOut, rankOut) — one row per vertex appearing in
   *         `edges`; ranks sum to 1. Every internal cache except the
   *         final rank table is released before returning. The result
   *         is a same-order pure-rename projection of that table, which
   *         sameResult-matches its cache entry — so `result.unpersist()`
   *         genuinely releases it (and `result.storageLevel` reports
   *         it). When the final iteration landed on a localCheckpoint
   *         round (numIter ≡ 0 mod 4) there is no cache-manager entry
   *         at all: the data sits in a checkpoint RDD freed by the
   *         ContextCleaner once the DataFrame is unreachable, and
   *         unpersist is a harmless no-op. Either way nothing leaks
   *         per run. Callers must NOT re-project with different column
   *         ORDER before unpersisting (a reordered projection does not
   *         sameResult-match; rename through idOut/rankOut instead).
   */
  def run(edges: DataFrame, srcCol: String = "src", dstCol: String = "dst",
      dampingFactor: Double = 0.85, numIter: Int = 20, tol: Double = 0.0,
      weightCol: String = "", idOut: String = "id",
      rankOut: String = "pagerank"): DataFrame =
    runImpl(edges, srcCol, dstCol, dampingFactor, numIter, tol, weightCol,
      idOut, rankOut, teleport = None)

  /**
   * PERSONALIZED PageRank (Haveliwala, "Topic-Sensitive PageRank",
   * WWW 2002): the teleport distribution concentrates on a SEED SET
   * instead of being uniform —
   *
   *   r₀(v) = p(v),  r_{t+1}(v) = (1−d)·p(v) + d·( Σ contribs + D_t·p(v) )
   *
   * with p(v) = 1/|S| for seeds, 0 elsewhere (dangling mass also
   * returns to the seeds — ranks still sum to 1). The seed-relative
   * centrality a crawl-curation pipeline ranks hosts with when it has
   * a trusted whitelist: "how reachable is this page from pages I
   * already trust" — the seed-expansion primitive for quality-biased
   * corpus selection.
   *
   * @param seeds   one column of vertex ids (`seedCol`); duplicates
   *                ignored. Seeds that do not appear in `edges` are
   *                ignored (they have no edges to spread rank through);
   *                at least one seed must be present in the graph.
   * Other params and the cache-release contract: see [[run]].
   */
  def runPersonalized(edges: DataFrame, seeds: DataFrame,
      srcCol: String = "src", dstCol: String = "dst",
      seedCol: String = "id", dampingFactor: Double = 0.85,
      numIter: Int = 20, tol: Double = 0.0, weightCol: String = "",
      idOut: String = "id", rankOut: String = "pagerank"): DataFrame =
    runImpl(edges, srcCol, dstCol, dampingFactor, numIter, tol, weightCol,
      idOut, rankOut, teleport = Some((seeds, seedCol)))

  private def runImpl(edges: DataFrame, srcCol: String, dstCol: String,
      dampingFactor: Double, numIter: Int, tol: Double,
      weightCol: String, idOut: String, rankOut: String,
      teleport: Option[(DataFrame, String)]): DataFrame = {
    require(dampingFactor > 0.0 && dampingFactor < 1.0,
      s"dampingFactor must be in (0, 1), got $dampingFactor")
    require(numIter > 0, s"numIter must be positive, got $numIter")
    val d = dampingFactor

    // the guard tests the CASTED value for null, so a non-numeric
    // string weight raises like a non-positive one instead of casting
    // to null and silently dropping the edge inside sum()
    val w =
      if (weightCol.isEmpty) lit(1.0)
      else {
        val wd = col(weightCol).cast("double")
        when(wd.isNull || wd <= 0.0,
            raise_error(concat(lit(s"PageRank: non-positive/null/non-numeric weight in '$weightCol' on edge "),
              col(srcCol).cast("string"), lit(" -> "), col(dstCol).cast("string")))
              .cast("double"))
          .otherwise(wd)
      }

    // (src, dst, share) with share = w / out(src); parallel edges keep
    // their multiplicity through the weight sum. Partitioned on src so
    // the per-iteration rank join never reshuffles the edge table.
    // out(src) is a WINDOW sum over the merged edge table rather than
    // a groupBy + self-join: the window's hash(src) exchange IS the
    // partitioning the loop needs, so setup pays two exchanges total
    // (the (src,dst) merge, then src) instead of four (merge, the
    // outW groupBy, re-exchange of the merged table for the join, and
    // the explicit repartition) — round-16 measurement, setup-bound
    // queries (numIter=3 graph rows) drop ~15-20%. The window sums the
    // identical merged per-(src,dst) weights, but its accumulation
    // ORDER differs from the old groupBy+join (row order after the
    // hash exchange vs partial-agg merge order), so shares agree only
    // within FP tolerance — do not rely on bit identity here; the
    // declared queries round at 1e-10, far above ulp drift.
    val agg = edges
      .select(col(srcCol).as("src"), col(dstCol).as("dst"), w.as("w"))
      .groupBy("src", "dst").agg(sum("w").as("w"))
    val srcWindow = org.apache.spark.sql.expressions.Window.partitionBy("src")
    val shares = agg
      .withColumn("share", col("w") / sum("w").over(srcWindow))
      .select(col("src"), col("dst"), col("share"))
      .persist(StorageLevel.MEMORY_AND_DISK)

    // nodes and dangling ids persist HASH-PARTITIONED ON id: the
    // per-iteration contribution join and dangling-mass aggregate then
    // reuse this partitioning (and the rank table inherits it through
    // the join), so only the rank→src shuffle moves data each round
    // distinct() already leaves the table hash-partitioned on id — an
    // explicit repartition(id) on top would be a second identical
    // exchange of the same O(V) rows
    val nodeIds = edges.select(col(srcCol).as("id"))
      .union(edges.select(col(dstCol).as("id")))
      .distinct()
      .persist(StorageLevel.MEMORY_AND_DISK)
    val n = nodeIds.count()
    require(n > 0, "PageRank on an empty edge list is undefined")

    // teleport column p: uniform 1/n (classic), or 1/|seeds∩graph| on
    // the seed set and 0 elsewhere (personalized). The personalized
    // tag join persists so no round re-joins the seed table; the
    // uniform case is a free projection of the cached id table.
    val (nodes, seedTagged) = teleport match {
      case None =>
        (nodeIds.withColumn("p", lit(1.0 / n)), Option.empty[DataFrame])
      case Some((seedDf, seedCol)) =>
        val seedIds = seedDf.select(col(seedCol).as("id")).distinct()
          .withColumn("__seed", lit(1))
        val tagged = nodeIds.join(seedIds, Seq("id"), "left")
          .persist(StorageLevel.MEMORY_AND_DISK)
        val s = tagged.agg(sum(when(col("__seed").isNotNull, 1L).otherwise(0L)))
          .head.getLong(0)
        require(s > 0, "personalized PageRank: no seed appears in the graph")
        (tagged.select(col("id"),
          when(col("__seed").isNotNull, lit(1.0 / s)).otherwise(lit(0.0)).as("p")),
          Some(tagged))
    }

    // dangling ids: appear as a destination but never as a source —
    // anti-join directly against the cached share table (hash(src)
    // partitioned, same modulus as nodes' hash(id): no exchange; an
    // anti join needs no distinct on its right side)
    val dangling = nodes.join(shares.select(col("src").as("id")), Seq("id"), "left_anti")
      .persist(StorageLevel.MEMORY_AND_DISK)

    var ranks = nodes.select(col("id"), col("p").as("r"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    // The per-round dangling-mass aggregate is folded FORWARD: each
    // iteration computes the NEXT round's mass from the fresh rank
    // table, which doubles as the action that materializes its cache
    // BEFORE the previous ranks are unpersisted. Without it, a lazily
    // persisted `mat` whose parent was already unpersisted recomputes
    // the whole chain back to the last localCheckpoint on its first
    // real use (~2.5x redundant compute per non-checkpoint round).
    // LEFT join (not inner): with zero dangling vertices an inner join
    // against the empty side lets AQE's empty-relation propagation skip
    // the rank scan entirely — which would also skip the cache
    // materialization this aggregate is load-bearing for.
    def danglingMassOf(r: DataFrame): Double =
      r.join(dangling.withColumn("__dang", lit(1)), Seq("id"), "left")
        .agg(coalesce(sum(when(col("__dang").isNotNull, col("r"))
          .otherwise(lit(0.0))), lit(0.0))).head.getDouble(0)
    var danglingMass = danglingMassOf(ranks)
    var iter = 0
    var converged = false
    while (iter < numIter && !converged) {
      val contribs = shares.join(ranks.withColumnRenamed("id", "src"), "src")
        .groupBy(col("dst").as("id"))
        .agg(sum(col("share") * col("r")).as("c"))
      // the uniform branch keeps the EXACT r12 expression ((1-d)/n and
      // dm/n as divisions): x/n and x*(1/n) differ at the ulp level,
      // and the classic path's oracle parity (ROUND(r, 10) after 3
      // iterations) is pinned to the division form
      val rankExpr = teleport match {
        case None =>
          lit((1.0 - d) / n) +
            lit(d) * (coalesce(col("c"), lit(0.0)) + lit(danglingMass / n))
        case Some(_) =>
          lit(1.0 - d) * col("p") +
            lit(d) * (coalesce(col("c"), lit(0.0)) + lit(danglingMass) * col("p"))
      }
      val next = nodes.join(contribs, Seq("id"), "left")
        .select(col("id"), rankExpr.as("r"))
      val mat =
        if ((iter + 1) % CheckpointEvery == 0) next.localCheckpoint(true)
        else next.persist(StorageLevel.MEMORY_AND_DISK)
      // materializes mat (full scan through the join) AND is next
      // round's input — one aggregate, two jobs done
      val nextMass = danglingMassOf(mat)
      if (tol > 0.0) {
        val delta = mat.join(ranks.withColumnRenamed("r", "r0"), "id")
          .agg(sum(abs(col("r") - col("r0")))).head.getDouble(0)
        converged = delta < tol
      }
      ranks.unpersist(blocking = false)
      ranks = mat
      danglingMass = nextMass
      iter += 1
    }
    lastIterations = iter
    shares.unpersist(blocking = false)
    nodeIds.unpersist(blocking = false)
    seedTagged.foreach(_.unpersist(blocking = false))
    dangling.unpersist(blocking = false)
    // SAME-ORDER pure-rename projection, deliberately: canonicalization
    // collapses such a Project, so the returned plan sameResult-matches
    // the final rank table's cache entry — result.storageLevel reports
    // it and result.unpersist() genuinely releases it (probed on Spark
    // 4.1.2: a REORDERED projection does NOT collapse and its unpersist
    // silently leaks the cache, which is why the rename happens here,
    // through idOut/rankOut, and not at call sites). Persisting this
    // projection instead would be worse than useless: the persist
    // no-ops against the sameResult-matching entry and an internal
    // unpersist would then drop the caller's data out from under it.
    ranks.select(col("id").as(idOut), col("r").as(rankOut))
  }
}
