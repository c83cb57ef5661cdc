package graft.examples

import org.apache.spark.sql.functions._

/**
 * Round-11 batch: PageRank link-graph centrality.
 */

/** Rank a tiny link graph: a hub with backlinks outranks the pages
  * that link to it; dangling pages donate their mass uniformly. */
object PageRankExample {
  def main(args: Array[String]): Unit = {
    val spark = ExampleSession.spark("PageRankExample")
    import spark.implicits._
    val edges = Seq(
      ("blog", "hub"), ("wiki", "hub"), ("news", "hub"),
      ("hub", "docs"), ("docs", "hub"),
      ("spam", "spam2")).toDF("src", "dst")
    val ranks = graft.graph.PageRank.run(edges, numIter = 30)
    ranks.orderBy(desc("pagerank")).show(false)
    println(s"iterations=${graft.graph.PageRank.lastIterations}")
    spark.stop()
  }
}
