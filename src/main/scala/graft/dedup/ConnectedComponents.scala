package graft.dedup

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/**
 * Distributed connected components over an edge list, used to group
 * near-duplicate pairs into clusters.
 *
 * Algorithm: iterative min-label propagation on the symmetrized edge
 * list. Each round every vertex takes the minimum label among itself
 * and its neighbors; convergence after O(cluster diameter) rounds.
 * Near-duplicate clusters are dense (most members pair with most
 * others), so the diameter is tiny in practice — typically ≤ 3 — and
 * each round is a single shuffle-join plus a map-side-combined min
 * aggregate on the EDGE table only, never the full document table.
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

  def run(edges: DataFrame, srcCol: String = "src", dstCol: String = "dst",
      maxIter: Int = 50, driverEdgeLimit: Long = DriverEdgeLimit): DataFrame = {
    val sym = edges.select(col(srcCol).as("u"), col(dstCol).as("v"))
      .union(edges.select(col(dstCol).as("u"), col(srcCol).as("v")))
      .where(col("u") =!= col("v"))
      .distinct()
      .persist(StorageLevel.MEMORY_AND_DISK)

    val edgeCount = sym.count()
    if (edgeCount <= driverEdgeLimit) {
      val out = runOnDriver(sym, edges.schema(edges.columns.indexOf(srcCol)).dataType)
      sym.unpersist(blocking = false)
      return out
    }

    var labels = sym.select(col("u").as("id")).distinct()
      .withColumn("component", col("id"))
      .persist(StorageLevel.MEMORY_AND_DISK)

    var converged = false
    var iter = 0
    while (!converged && iter < maxIter) {
      // min neighbor label per vertex (partial aggregation map-side)
      val nbrMin = sym.join(labels.withColumnRenamed("id", "v"), "v")
        .groupBy(col("u").as("id")).agg(min("component").as("nbrMin"))
      val next = labels.join(nbrMin, Seq("id"), "left")
        .select(col("id"),
          least(col("component"), coalesce(col("nbrMin"), col("component"))).as("component"),
          (coalesce(col("nbrMin"), col("component")) < col("component")).as("changed"))
      val mat =
        if ((iter + 1) % 5 == 0) next.localCheckpoint(true)
        else next.persist(StorageLevel.MEMORY_AND_DISK)
      converged = mat.where(col("changed")).isEmpty
      labels.unpersist()
      labels = mat.select("id", "component")
      iter += 1
    }
    sym.unpersist()
    if (!converged)
      throw new IllegalStateException(
        s"ConnectedComponents did not converge within $maxIter rounds — component labels " +
          "would be partial (members of one cluster keeping different canonical ids). " +
          "Raise maxIter past the graph diameter.")
    labels
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
