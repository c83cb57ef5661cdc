package graft.text

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.api.{AlgoOperator, StageLoader}
import graft.param._
import graft.util.ReadWrite

/**
 * Per-host crawl-round scheduling — the politeness/budget step
 * between [[FrontierBuilder]]'s not-yet-crawled list and the fetcher:
 * out of a (possibly enormous) frontier, pick WHICH URLs to fetch
 * this round, bounded per host so no site gets hammered and the
 * fetch fleet's work spreads across hosts. No reference counterpart
 * — beyond-reference crawl tier.
 *
 * Selection per host: the top `budgetPerHost` URLs by `priorityCol`
 * descending (ties broken by URL ascending so the schedule is
 * deterministic and SQL-replayable). When a delays table is supplied
 * — `transform(frontier, delays)`, the (host, seconds) rows
 * [[RobotsDirectives]] parses from `Crawl-delay:` lines — a host's
 * budget tightens to `min(budgetPerHost, floor(horizonSec / delay))`
 * (never below 1: a reachable host always gets one fetch per round):
 * a 30-second delay against a 900-second round horizon means at most
 * 30 polite fetches, whatever the global budget says. Hosts absent
 * from the delays table, null/non-positive delays, or
 * `horizonSec` <= 0 keep the flat `budgetPerHost`.
 *
 * Output: the frontier's columns plus `<o>_rank` (1 = first fetch
 * for its host) for the selected rows only. `maxUrls` > 0 further
 * caps the ROUND globally — the top rows by (priority desc, url asc)
 * across all hosts — for a fixed-size fetch fleet.
 *
 * Scale shape (100 TB frontier): ranking runs on a slim (url, host,
 * priority) projection and joins back on `urlCol`, so payload
 * columns never ride the per-host sort. The per-host ranking is one
 * row_number window; a mega-host frontier (one spam host holding
 * millions of candidate URLs) would pull its whole set into one sort
 * task, so `saltBuckets` > 0 inserts the salted local-top-k pre-pass
 * ([[AnchorTextRollup]]'s guard): URLs hash into buckets, each
 * bucket keeps its local top-`budgetPerHost`, and only
 * <= saltBuckets * budgetPerHost survivors reach the final window —
 * the global top-k provably survives its bucket's local top-k, so
 * the schedule is identical. The global `maxUrls` cap is a
 * TakeOrdered (orderBy + limit) over already-selected slim rows —
 * never a full-frontier global sort. The delays join broadcasts in
 * practice (one row per host with a Crawl-delay, tiny next to the
 * frontier).
 */
class CrawlScheduler extends AlgoOperator[CrawlScheduler]
    with HasOutputCol[CrawlScheduler] {

  final val urlCol: Param[String] = param[String](
    "urlCol", "Unique URL key of the frontier (selection joins back on it).", "url")
  def getUrlCol: String = get(urlCol)
  def setUrlCol(v: String): CrawlScheduler = set(urlCol, v)

  final val hostCol: Param[String] = param[String](
    "hostCol", "Host column of the frontier (the politeness unit).", "host")
  def getHostCol: String = get(hostCol)
  def setHostCol(v: String): CrawlScheduler = set(hostCol, v)

  final val priorityCol: Param[String] = param[String](
    "priorityCol",
    "Fetch-priority column (higher first) — FrontierBuilder's <o>_refs, a PageRank, a BFS depth prior...",
    "priority")
  def getPriorityCol: String = get(priorityCol)
  def setPriorityCol(v: String): CrawlScheduler = set(priorityCol, v)

  final val budgetPerHost: Param[Int] = param[Int](
    "budgetPerHost", "Maximum URLs selected per host per round.", 100,
    ParamValidators.gt(0))
  def getBudgetPerHost: Int = get(budgetPerHost)
  def setBudgetPerHost(v: Int): CrawlScheduler = set(budgetPerHost, v)

  final val horizonSec: Param[Double] = param[Double](
    "horizonSec",
    "Crawl-round length in seconds; with a delays table, a host's budget tightens to floor(horizonSec / delay). <= 0 ignores delays.",
    0.0)
  def getHorizonSec: Double = get(horizonSec)
  def setHorizonSec(v: Double): CrawlScheduler = set(horizonSec, v)

  final val delayCol: Param[String] = param[String](
    "delayCol", "Delays-table column holding seconds between fetches (RobotsDirectives' <o>_delay).", "delay")
  def getDelayCol: String = get(delayCol)
  def setDelayCol(v: String): CrawlScheduler = set(delayCol, v)

  final val maxUrls: Param[Long] = param[Long](
    "maxUrls", "Global cap on URLs selected per round; 0 = uncapped.", 0L,
    ParamValidators.gtEq(0L))
  def getMaxUrls: Long = get(maxUrls)
  def setMaxUrls(v: Long): CrawlScheduler = set(maxUrls, v)

  final val saltBuckets: Param[Int] = param[Int](
    "saltBuckets",
    "When > 0, pre-rank URLs inside this many hash buckets per host and keep each bucket's local top-budgetPerHost before the final ranking — bounds any single sort task on mega-host frontiers; 0 = single window (same result).",
    0, ParamValidators.gtEq(0))
  def getSaltBuckets: Int = get(saltBuckets)
  def setSaltBuckets(v: Int): CrawlScheduler = set(saltBuckets, v)

  /** @param inputs (frontier) or (frontier, delays) — delays carrying
   * `hostCol` + `delayCol`, as produced by [[RobotsDirectives]]. */
  override def transform(inputs: DataFrame*): Array[DataFrame] = {
    require(inputs.size == 1 || inputs.size == 2,
      s"CrawlScheduler takes (frontier) or (frontier, delays), got ${inputs.size} inputs")
    val frontier = inputs.head
    val o = getOutputCol
    val h = getHostCol
    val k = getBudgetPerHost

    val slim = frontier.select(col(getUrlCol).as("__u"),
      col(h).as("__h"), col(getPriorityCol).as("__pr"))

    // effective per-host budget: flat, or delay-tightened when a
    // delays table rides along and a horizon is set
    val budgeted =
      if (inputs.size == 2 && getHorizonSec > 0) {
        val d = inputs(1).select(col(h).as("__dh"),
          col(getDelayCol).cast("double").as("__delay"))
          .where(col("__delay").isNotNull && col("__delay") > 0)
          .groupBy("__dh").agg(max("__delay").as("__delay")) // strictest delay wins
        slim.join(d, col("__h") === col("__dh"), "left")
          .withColumn("__budget",
            when(col("__delay").isNull, lit(k)).otherwise(
              least(lit(k), greatest(lit(1L),
                floor(lit(getHorizonSec) / col("__delay"))))).cast("int"))
          .drop("__dh", "__delay")
      } else slim.withColumn("__budget", lit(k))

    val order = Seq(col("__pr").desc, col("__u").asc)
    val pruned =
      if (getSaltBuckets > 0) {
        // salted local top-k: budget <= budgetPerHost always, so a
        // bucket's local top-budgetPerHost keeps every global winner
        val localW = Window
          .partitionBy(col("__h"), pmod(xxhash64(col("__u")), lit(getSaltBuckets)))
          .orderBy(order: _*)
        budgeted.withColumn("__cs_lr", row_number().over(localW))
          .where(col("__cs_lr") <= k)
          .drop("__cs_lr")
      } else budgeted

    val w = Window.partitionBy(col("__h")).orderBy(order: _*)
    val ranked = pruned
      .withColumn(s"${o}_rank", row_number().over(w))
      .where(col(s"${o}_rank") <= col("__budget"))

    // the global round cap: TakeOrdered (orderBy + limit) over the
    // already-selected slim rows — never a full-frontier global sort
    val capped = (if (getMaxUrls > 0)
        ranked.orderBy(order: _*).limit(getMaxUrls.toInt)
      else ranked)
      .select(col("__u"), col(s"${o}_rank"))

    Array(frontier.join(capped, col(getUrlCol) === col("__u")).drop("__u"))
  }
}

object CrawlScheduler extends StageLoader[CrawlScheduler] {
  def load(spark: SparkSession, path: String): CrawlScheduler =
    ReadWrite.applyParams(new CrawlScheduler, path)
}
