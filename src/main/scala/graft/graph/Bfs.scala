package graft.graph

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/**
 * Multi-source BFS hop distances — the graph tier's fifth member next
 * to [[PageRank]], [[Hits]], [[LabelPropagation]] and
 * [[graft.dedup.ConnectedComponents]]: every vertex's minimum hop
 * count from a SEED SET over an unweighted edge list. On a crawl
 * corpus this is crawl depth from the seed whitelist (a standard
 * quality prior: pages many hops from any trusted seed are
 * boilerplate/spam-heavy), and the same loop is "distance from
 * labeled gold data" on any entity graph. The reference has no graph
 * tier — beyond-reference addition.
 *
 * Semantics: synchronous frontier expansion. d(seed) = 0; round k
 * settles exactly the vertices first reachable in k hops (minimality
 * by induction — a vertex is settled the first round it appears, and
 * rounds expand one hop at a time). Directed by default (distance
 * along edge direction); `undirected = true` symmetrizes the edge
 * list once up front. Seeds absent from the graph still emit d = 0
 * rows (a seed is at distance 0 from itself whether or not it has
 * edges); unreached vertices emit NO row — distance is undefined,
 * and the caller's left join + coalesce picks its own sentinel.
 * Self-loops and parallel edges are harmless (they never relax
 * anything).
 *
 * Scale shape (100 TB link graph): the edge table is hash-partitioned
 * on src ONCE and persisted; each round joins only the FRONTIER
 * (vertices settled last round) against it, so total join work across
 * the whole run is O(E) — every edge is expanded exactly once, the
 * textbook BFS bound, not O(E·rounds). Only each round's FRONTIER is
 * eagerly localCheckpointed; `settled` stays a lazy union of the flat
 * checkpointed frontier legs (the per-round anti-join and the final
 * select read that union either way, and each leg is already a
 * LogicalRDD, so plan depth stays O(1) per leg — the HITS lesson).
 * Total checkpoint MATERIALIZATION is therefore O(V), not the
 * O(V·depth) a per-round settled rewrite pays — on a CC-style
 * 1,000-hop chain that is the difference between writing the visited
 * set once and writing it a thousand times. Every `compactEvery`
 * (32) rounds the union is compacted into a single checkpoint so the
 * leg fan-in and per-round analysis stay bounded on deep graphs
 * (amortized materialization O(V·depth/32), still ~97% below the
 * per-round rewrite). Early-stops the round the frontier empties.
 *
 * Exactly SQL-replayable: distances are INTEGERS and each round is a
 * min over (settled ∪ frontier-expansion) — the oracle replays k
 * rounds as chained CTEs with no float concerns (the LPA
 * integer-replay precedent).
 */
object Bfs {

  /** Instrumentation only: rounds the last run() took (settled
    * frontiers, not counting the seed round). */
  @volatile var lastRounds: Int = 0

  /**
   * @param edges    (src, dst) rows; any orderable vertex type.
   * @param seeds    one column of seed vertex ids (duplicates fine).
   * @param srcCol   edge-source column name.
   * @param dstCol   edge-destination column name.
   * @param seedCol  seed-id column name in `seeds`.
   * @param maxIter  hop cap: vertices farther than this emit no row.
   * @param undirected symmetrize edges before expanding.
   * @param idOut    output vertex-id column name.
   * @param distOut  output hop-distance column name (integer).
   * @return one row per REACHED vertex: (idOut, distOut).
   */
  def run(edges: DataFrame, seeds: DataFrame, srcCol: String = "src",
      dstCol: String = "dst", seedCol: String = "id", maxIter: Int = 20,
      undirected: Boolean = false, idOut: String = "id",
      distOut: String = "distance"): DataFrame = {
    require(maxIter > 0, s"maxIter must be positive, got $maxIter")

    val fwd = edges.select(col(srcCol).as("src"), col(dstCol).as("dst"))
    val e0 = if (undirected) fwd.union(
      edges.select(col(dstCol).as("src"), col(srcCol).as("dst"))) else fwd
    val bySrc = e0.distinct().repartition(col("src"))
      .persist(StorageLevel.MEMORY_AND_DISK)

    val compactEvery = 32
    var settled = seeds.select(col(seedCol).as("id")).distinct()
      .select(col("id"), lit(0).as("d"))
      .localCheckpoint(true)
    var frontier = settled
    var legs = 1
    var k = 0
    var done = false
    while (k < maxIter && !done) {
      // shuffle_hash on the settled side: the anti-join's build side
      // is the visited set — hashing it beats sort-merge's per-round
      // O(V log V) sort of the whole union (the frontier side is
      // usually far smaller than the settled set on deep graphs)
      val next = bySrc.join(frontier.select(col("id").as("src")), "src")
        .select(col("dst").as("id")).distinct()
        .join(settled.hint("shuffle_hash"), Seq("id"), "left_anti")
        .select(col("id"), lit(k + 1).as("d"))
        .localCheckpoint(true)
      if (next.isEmpty) done = true
      else {
        k += 1
        // frontier-only checkpointing: settled stays a LAZY union of
        // the flat frontier legs; compact occasionally to bound fan-in
        settled = settled.union(next)
        legs += 1
        if (legs >= compactEvery) {
          settled = settled.localCheckpoint(true)
          legs = 1
        }
        frontier = next
      }
    }
    lastRounds = k
    bySrc.unpersist(blocking = false)
    settled.select(col("id").as(idOut), col("d").as(distOut))
  }
}
