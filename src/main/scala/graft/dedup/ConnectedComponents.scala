package graft.dedup

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/**
 * Distributed connected components over an edge list, used to group
 * near-duplicate pairs into clusters.
 *
 * Two distributed algorithms behind one surface:
 *
 *  - `minlabel`: iterative min-label propagation on the symmetrized
 *    edge list. Each round every vertex takes the minimum label among
 *    itself and its neighbors; convergence after O(graph diameter)
 *    rounds, one shuffle-join + map-side-combined min aggregate per
 *    round. Right for LSH near-duplicate clusters, which are dense
 *    (diameter typically ≤ 3).
 *
 *  - `star` (the default distributed path): alternating
 *    large-star/small-star contraction (Kiveris et al., "Connected
 *    Components in MapReduce and Beyond", SOCC 2014). Each round
 *    rewires every vertex's larger neighbors (large-star) then its
 *    smaller neighbors (small-star) to the minimum of its closed
 *    neighborhood; components contract to stars centered at their
 *    minimum vertex in O(log n) rounds REGARDLESS of diameter — a
 *    path of length 1000 converges in ~10 rounds where min-label
 *    needs 1000.
 *
 * Scale notes (100 TB design): the edge list produced by an LSH
 * similarity join is orders of magnitude smaller than the corpus
 * (only colliding pairs under the distance threshold). Lineage is
 * truncated with localCheckpoint every few rounds so the plan does
 * not grow unboundedly with iterations.
 */
object ConnectedComponents {

  /**
   * @param edges DataFrame with two columns naming vertex pairs; any
   *              orderable vertex type (long ids, strings, ...).
   * @return DataFrame (id, component) — one row per vertex that
   *         appears in `edges`; `component` is the minimum vertex id
   *         reachable from `id` (a canonical cluster representative).
   *         The result is returned persisted (MEMORY_AND_DISK);
   *         callers may `unpersist()` it once consumed.
   * @throws IllegalStateException if labels have not converged within
   *         `maxIter` rounds (labels spread one hop per round, so
   *         graphs with diameter > maxIter need a higher setting) —
   *         partial labels would silently under-deduplicate.
   */
  /** Edge lists at or under this size run union-find on the driver:
    * an LSH dedup join typically leaves a few thousand edges, where
    * the distributed loop's per-iteration job overhead (join + agg +
    * convergence action, several rounds) costs seconds for work a
    * single core finishes in microseconds. Above the bound the
    * shuffle loop takes over unchanged. */
  val DriverEdgeLimit: Long = 1L << 20

  /** Instrumentation only: rounds the last distributed run() took
    * (one large-star+small-star pass = one round for `star`; one
    * label-propagation pass for `minlabel`). 0 after a driver-path
    * run. Not part of the result contract. */
  @volatile var lastRounds: Int = 0

  /**
   * @param algorithm distributed algorithm: "star" (alternating
   *        large-star/small-star, O(log n) rounds at any diameter),
   *        "minlabel" (O(diameter) rounds, slightly cheaper per
   *        round — fine for dense low-diameter dedup clusters).
   */
  def run(edges: DataFrame, srcCol: String = "src", dstCol: String = "dst",
      maxIter: Int = 50, driverEdgeLimit: Long = DriverEdgeLimit,
      algorithm: String = "star"): DataFrame = {
    require(algorithm == "star" || algorithm == "minlabel",
      s"unknown algorithm '$algorithm' (expected star or minlabel)")
    val symRaw = edges.select(col(srcCol).as("u"), col(dstCol).as("v"))
      .union(edges.select(col(dstCol).as("u"), col(srcCol).as("v")))
      .where(col("u") =!= col("v"))
      .distinct()
    // persist + count only where they pay: the driver-path decision
    // needs the count (and the count doubles as the materializing
    // action), and minlabel reads sym twice (adj + labels). The star
    // path with the driver check disabled reads sym exactly ONCE
    // (into the first localCheckpoint), so persisting and counting it
    // there was a wasted cache build plus a wasted O(E) job per call.
    val checkDriver = driverEdgeLimit > 0
    val sym =
      if (checkDriver || algorithm == "minlabel")
        symRaw.persist(StorageLevel.MEMORY_AND_DISK)
      else symRaw
    if (checkDriver) {
      val edgeCount = sym.count()
      if (edgeCount <= driverEdgeLimit) {
        lastRounds = 0
        val out = runOnDriver(sym, edges.schema(edges.columns.indexOf(srcCol)).dataType)
        sym.unpersist(blocking = false)
        return out
      }
    }
    if (algorithm == "star") return runStar(sym, maxIter)

    // edge table persisted HASH-PARTITIONED ON v, the per-round join
    // key (the PageRank/LabelPropagation discipline): each round then
    // joins the O(V) label table against it without re-exchanging the
    // O(E) edges — one setup exchange instead of one per round
    val adj = sym.repartition(col("v")).persist(StorageLevel.MEMORY_AND_DISK)

    var labels = sym.select(col("u").as("id")).distinct()
      .withColumn("component", col("id"))
      .persist(StorageLevel.MEMORY_AND_DISK)

    var converged = false
    var iter = 0
    while (!converged && iter < maxIter) {
      // min neighbor label per vertex (partial aggregation map-side)
      val nbrMin = adj.join(labels.withColumnRenamed("id", "v"), "v")
        .groupBy(col("u").as("id")).agg(min("component").as("nbrMin"))
      // the cached frame stays EXACTLY (id, component) — round 16
      // carried a third `changed` column and unpersisted a 2-column
      // PROJECTION of it each round, which does not sameResult-match
      // the 3-column cache entry and silently released nothing
      // (probed on Spark 4.1.2): one leaked O(V) cache per round.
      // The changed probe is now a co-partitioned join against the
      // previous labels (both sides hash(id)-cached, no exchange —
      // the LabelPropagation shape), and `labels` always holds the
      // persisted handle itself, so unpersist genuinely releases.
      val next = labels.join(nbrMin, Seq("id"), "left")
        .select(col("id"),
          least(col("component"), coalesce(col("nbrMin"), col("component"))).as("component"))
      val mat =
        if ((iter + 1) % 5 == 0) next.localCheckpoint(true)
        else next.persist(StorageLevel.MEMORY_AND_DISK)
      // FULL-SCAN changed count, not where(changed).isEmpty: isEmpty
      // short-circuits after the first changed row, leaving most of
      // the lazily persisted mat's partitions uncached when the old
      // labels unpersist below — every later round would then recompute
      // the chain back to the last localCheckpoint (the PageRank r11
      // ADVICE bug, same class). The aggregate is O(V) — the price the
      // convergence check pays anyway — and doubles as the action that
      // fills the cache while its parent is still alive.
      val changed = mat
        .join(labels.withColumnRenamed("component", "c0"), "id")
        .where(col("component") =!= col("c0")).count()
      converged = changed == 0L
      labels.unpersist()
      labels = mat
      iter += 1
    }
    adj.unpersist()
    sym.unpersist()
    lastRounds = iter
    if (!converged)
      throw new IllegalStateException(
        s"ConnectedComponents did not converge within $maxIter rounds — component labels " +
          "would be partial (members of one cluster keeping different canonical ids). " +
          "Raise maxIter past the graph diameter.")
    labels
  }

  /**
   * Alternating large-star/small-star contraction (Kiveris et al.,
   * SOCC 2014). Works on a CANONICAL edge set (u, v) with u > v:
   *
   *  - large-star(u): m = min(Γ(u) ∪ {u}); rewire every neighbor
   *    v > u to m — emitted (v, m) keeps v > u ≥ m canonical.
   *  - small-star(u): over edges keyed by their larger endpoint, so
   *    Γ⁻(u) is all smaller; m = min(Γ⁻(u)); rewire every v ∈ Γ⁻(u)
   *    and u itself to m.
   *
   * Both preserve connectivity; a full round at least halves the
   * min-distance of every vertex, so components contract to stars
   * centered at their minimum in O(log n) rounds. Convergence =
   * edge-set fixpoint, detected in two phases: every round computes
   * (count, bit_xor of per-edge xxhash64) in ONE aggregate job — an
   * order-insensitive set signature — and only a signature match
   * (i.e. the suspected final round) pays the exact `except`
   * confirmation; a non-final round costs one scan, not a
   * distinct+anti-join shuffle of the full edge set.
   */
  private def runStar(sym: DataFrame, maxIter: Int): DataFrame = {
    def largeStar(e: DataFrame): DataFrame = {
      val symE = e.union(e.select(col("v").as("u"), col("u").as("v")))
      val mins = symE.groupBy("u").agg(min("v").as("mn"))
        .select(col("u"), least(col("u"), col("mn")).as("m"))
      symE.join(mins, "u").where(col("v") > col("u"))
        .select(col("v").as("u"), col("m").as("v"))
        .where(col("u") =!= col("v"))
        .distinct()
    }
    def smallStar(e: DataFrame): DataFrame = {
      val mins = e.groupBy("u").agg(min("v").as("m"))
      val rewired = e.join(mins, "u").where(col("v") =!= col("m"))
        .select(col("v").as("u"), col("m").as("v"))
      rewired.union(mins.select(col("u"), col("m").as("v")))
        .where(col("u") =!= col("v"))
        .distinct()
    }

    // order-insensitive edge-set signature in ONE job: (count, xor of
    // per-edge 64-bit hashes). Two consecutive rounds with equal
    // signatures are a fixpoint up to a ~2^-64 xor collision, which
    // the exact except() below rules out — so the expensive check
    // runs once, at the true final round, instead of every round.
    def signature(e: DataFrame): (Long, Long) = {
      val r = e.agg(count(lit(1)),
        call_function("bit_xor", xxhash64(col("u"), col("v")))).head()
      (r.getLong(0), if (r.isNullAt(1)) 0L else r.getLong(1))
    }

    // localCheckpoint EVERY round: each star op references its input
    // 3-4 times, so the logical plan grows ~12x per round — persist
    // alone (which keeps lineage) turns the optimizer exponential.
    // The edge table only shrinks across rounds, so the checkpoint
    // write is bounded by the input edge count.
    var edges = sym.where(col("u") > col("v")).select("u", "v")
      .localCheckpoint(true)
    var prevSig = signature(edges)
    sym.unpersist(blocking = false)

    var converged = false
    var iter = 0
    while (!converged && iter < maxIter) {
      // persist the large-star output: small-star consumes it twice
      // (its min aggregate and its rewire join)
      val ls = largeStar(edges).persist(StorageLevel.MEMORY_AND_DISK)
      val mat = smallStar(ls).localCheckpoint(true)
      val nextSig = signature(mat)
      converged = nextSig == prevSig && mat.except(edges).isEmpty
      ls.unpersist(blocking = false)
      edges = mat
      prevSig = nextSig
      iter += 1
    }
    lastRounds = iter
    if (!converged)
      throw new IllegalStateException(
        s"ConnectedComponents(star) did not converge within $maxIter rounds — " +
          "component labels would be partial. Raise maxIter (rounds grow with " +
          "log of the largest component, so this indicates a pathological input).")
    // fixpoint is a star forest: (member, center) rows; add the centers
    edges.select(col("u").as("id"), col("v").as("component"))
      .union(edges.select(col("v").as("id"), col("v").as("component")))
      .distinct()
      .persist(StorageLevel.MEMORY_AND_DISK)
  }

  /** Union-find over a collected edge list; component = min member
    * (vertex values are boxed JVM types, all Comparable). */
  private def runOnDriver(sym: DataFrame,
      idType: org.apache.spark.sql.types.DataType): DataFrame = {
    val pairs = sym.collect().map(r => (r.get(0), r.get(1)))
    val parent = new java.util.HashMap[Any, Any]()
    def find(x: Any): Any = {
      var root = x
      while (parent.getOrDefault(root, root) != root) root = parent.get(root)
      // path compression
      var cur = x
      while (parent.getOrDefault(cur, cur) != root) {
        val next = parent.get(cur); parent.put(cur, root); cur = next
      }
      root
    }
    pairs.foreach { case (u, v) =>
      parent.putIfAbsent(u, u); parent.putIfAbsent(v, v)
      val (ru, rv) = (find(u), find(v))
      if (ru != rv) parent.put(ru, rv)
    }
    val members = new java.util.HashMap[Any, java.util.ArrayList[Any]]()
    val it = parent.keySet().iterator()
    while (it.hasNext) {
      val v = it.next()
      members.computeIfAbsent(find(v), _ => new java.util.ArrayList[Any]()).add(v)
    }
    val rows = new java.util.ArrayList[org.apache.spark.sql.Row]()
    val mit = members.values().iterator()
    while (mit.hasNext) {
      val group = mit.next()
      var min: Any = group.get(0)
      var i = 1
      while (i < group.size()) {
        if (min.asInstanceOf[Comparable[Any]].compareTo(group.get(i)) > 0) min = group.get(i)
        i += 1
      }
      i = 0
      while (i < group.size()) {
        rows.add(org.apache.spark.sql.Row(group.get(i), min)); i += 1
      }
    }
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("id", idType),
      org.apache.spark.sql.types.StructField("component", idType)))
    sym.sparkSession.createDataFrame(rows, schema)
  }
}
