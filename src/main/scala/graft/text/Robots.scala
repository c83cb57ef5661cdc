package graft.text

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.api.{AlgoOperator, StageLoader, Transformer}
import graft.param._
import graft.util.ReadWrite

/**
 * robots.txt parsing — the compliance/politeness primitive a crawl
 * pipeline applies BEFORE the URL tier ranks or dedups anything: a
 * (host, robots.txt) corpus becomes a flat rules table that
 * [[RobotsUrlFilter]] joins against the frontier. REP semantics per
 * RFC 9309 (sections = one-or-more consecutive `User-agent:` lines
 * followed by `Allow:`/`Disallow:` rules; matching is
 * longest-prefix-wins with Allow winning length ties). No reference
 * counterpart — beyond-reference crawl tier.
 *
 * Output: one row per applicable rule —
 *  - `<o>_rule`: "allow" | "disallow";
 *  - `<o>_prefix`: the path pattern as written (percent-decoding
 *    documented out of scope; `*`/`$` wildcards per RFC 9309 §2.2.3
 *    are interpreted by [[RobotsUrlFilter]] at match time, so the
 *    parser emits them verbatim);
 * with the host column carried through under its input name. Group
 * selection per RFC 9309 §2.2.1: sections naming `userAgent`
 * (case-insensitive EXACT product token, not substring — documented
 * trade) apply; the `*` sections apply ONLY when no section in the
 * document names the agent exactly (they are the fallback group, not
 * a union — all matching specific sections still merge, per the
 * RFC's "combine into one group" rule for duplicate tokens). Rules
 * with an empty value (`Disallow:` = "no restriction") emit nothing:
 * no matching rule already means allowed. Sections whose agents all
 * miss emit nothing. Comments (`#`) and blank lines are stripped;
 * directives are case-insensitive. Non-rule directives (`Sitemap:`,
 * `Crawl-delay:` — surfaced by [[RobotsDirectives]]) are recognized
 * by the section model (they end a run of consecutive `User-agent:`
 * lines per the RFC grammar) but emit no rule rows here.
 *
 * Shape: the parse is pure column math over posexploded lines plus
 * two per-document window passes (section assignment = running count
 * of section starts; section applicability = a max over the
 * section's `User-agent:` lines) and one (doc, section) equi-join —
 * all RE2-expressible and window-deterministic, so the DuckDB oracle
 * can replay the construction. Windows partition by the host row, so
 * parallelism is per-document and a robots file's size (bounded in
 * practice; 500 KiB per RFC 9309 §2.4) bounds any task.
 */
class RobotsTxtParser extends Transformer[RobotsTxtParser]
    with HasInputCol[RobotsTxtParser] with HasOutputCol[RobotsTxtParser] {

  final val hostCol: Param[String] = param[String](
    "hostCol", "Column identifying the robots.txt's host (the join key RobotsUrlFilter uses).", "host")
  def getHostCol: String = get(hostCol)
  def setHostCol(v: String): RobotsTxtParser = set(hostCol, v)

  final val userAgent: Param[String] = param[String](
    "userAgent",
    "Product token whose sections apply, next to '*' (case-insensitive exact match).",
    "*")
  def getUserAgent: String = get(userAgent)
  def setUserAgent(v: String): RobotsTxtParser = set(userAgent, v)

  override def transform(inputs: DataFrame*): Array[DataFrame] = {
    require(inputs.size == 1)
    val h = getHostCol
    val o = getOutputCol
    val agent = getUserAgent.toLowerCase(java.util.Locale.ROOT)

    val sectioned = RobotsParse.sectionedLines(inputs.head, getInputCol, h)
    val applicable = RobotsParse.applicableSections(sectioned, h, agent)

    val rules = sectioned
      .where(col("__dir").isin("allow", "disallow") && col("__val") =!= "")
      .join(applicable,
        col(h) === col("__h2") && col("__sec") === col("__sec2"))
      .select(col(h), col("__dir").as(s"${o}_rule"), col("__val").as(s"${o}_prefix"))
    Array(rules)
  }
}

/**
 * Shared robots.txt parse machinery for [[RobotsTxtParser]] and
 * [[RobotsDirectives]]: the line walk and RFC 9309 section model are
 * ONE implementation so the two surfaces can never drift apart on
 * group boundaries or agent selection.
 */
private[text] object RobotsParse {

  /** Directives the section model recognizes — any of these lines
   * ends a run of consecutive `User-agent:` lines, so
   * `User-agent: a / Crawl-delay: 5 / User-agent: b` puts a and b in
   * SEPARATE groups per the RFC 9309 grammar (startgroupline+ then
   * grouplines; unrecognized junk lines stay invisible). */
  private val Recognized = Seq("user-agent", "allow", "disallow", "crawl-delay", "sitemap")

  /** Line-split, comment-strip, directive/value decomposition and
   * section assignment: one row per recognized directive line with
   * `__ln` (file position), `__dir` (lowercased name), `__val`
   * (trimmed value) and `__sec` (1-based section id — the running
   * count of section starts, a user-agent line not directly preceded
   * by another user-agent line). */
  def sectionedLines(df: DataFrame, inputCol: String, hostCol: String): DataFrame = {
    val lines = df
      .select(col(hostCol), posexplode(split(coalesce(col(inputCol), lit("")), "\r?\n"))
        .as(Seq("__ln", "__raw")))
      .withColumn("__line", trim(regexp_replace(col("__raw"), "#.*$", "")))
      .where(col("__line") =!= "")
      .withColumn("__dir", lower(regexp_extract(col("__line"), "^([A-Za-z-]+)\\s*:", 1)))
      .withColumn("__val", trim(regexp_extract(col("__line"), "^[A-Za-z-]+\\s*:(.*)$", 1)))
      .where(col("__dir").isin(Recognized: _*))

    val byDoc = Window.partitionBy(col(hostCol)).orderBy(col("__ln"))
    lines
      .withColumn("__ua", (col("__dir") === "user-agent").cast("int"))
      .withColumn("__start",
        when(col("__ua") === 1 &&
          coalesce(lag(col("__ua"), 1).over(byDoc), lit(0)) === 0, 1).otherwise(0))
      .withColumn("__sec", sum(col("__start")).over(byDoc))
  }

  /** RFC 9309 §2.2.1 group selection: a section naming the agent
   * EXACTLY always applies; '*' sections are the FALLBACK group and
   * apply only when no section in the whole document names the agent
   * (per-document `__has_exact` via a host-partition window). Returns
   * the applicable (`__h2`, `__sec2`) pairs. */
  def applicableSections(sectioned: DataFrame, hostCol: String, agent: String): DataFrame = {
    val byHost = Window.partitionBy(col("__h2"))
    sectioned
      .where(col("__dir") === "user-agent")
      .groupBy(col(hostCol).as("__h2"), col("__sec").as("__sec2"))
      .agg(
        max(when(lower(col("__val")) === agent, 1).otherwise(0)).as("__exact"),
        max(when(col("__val") === "*", 1).otherwise(0)).as("__star"))
      .withColumn("__has_exact", max(col("__exact")).over(byHost))
      .where(col("__exact") === 1 ||
        (col("__has_exact") === 0 && col("__star") === 1))
      .select(col("__h2"), col("__sec2"))
  }
}

/**
 * robots.txt non-rule directives — the two crawl-control signals a
 * robots.txt carries BESIDES allow/disallow rules:
 *
 *  - `Sitemap:` (sitemaps.org cross-protocol discovery): the standard
 *    way a site announces its sitemap URLs. DOCUMENT-scoped per the
 *    sitemaps.org protocol — a Sitemap line applies regardless of
 *    which User-agent group surrounds it, so every such line emits.
 *    Feed the values into [[SitemapExtractor]] (after fetching) and
 *    the extracted locs into [[FrontierBuilder]] — this operator is
 *    the missing discovery hop between robots and the frontier.
 *  - `Crawl-delay:` (non-standard but honored by Bing/Yandex):
 *    GROUP-scoped like allow/disallow — the same RFC 9309 §2.2.1
 *    selection as [[RobotsTxtParser]] (exact-token sections win, `*`
 *    sections are the fallback). A delay outside any User-agent
 *    group is undefined and drops. Feed the parsed delays into
 *    [[CrawlScheduler]] as the per-host politeness budget.
 *
 * Output: one row per surviving directive —
 *  - `<o>_kind`: "sitemap" | "crawl-delay";
 *  - `<o>_value`: the value as written (a URL / the seconds text);
 *  - `<o>_delay`: the value as a double for crawl-delay rows
 *    (try_cast — garbage parses to null), null for sitemap rows;
 * with the host column carried through under its input name.
 *
 * Same shape as the rule parse (shared [[RobotsParse]] machinery):
 * posexploded lines + per-document windows + one (doc, section)
 * equi-join for the delay rows — RE2/window-deterministic, oracle-
 * replayable, parallelism per document, tasks bounded by the 500 KiB
 * robots.txt cap.
 */
class RobotsDirectives extends Transformer[RobotsDirectives]
    with HasInputCol[RobotsDirectives] with HasOutputCol[RobotsDirectives] {

  final val hostCol: Param[String] = param[String](
    "hostCol", "Column identifying the robots.txt's host.", "host")
  def getHostCol: String = get(hostCol)
  def setHostCol(v: String): RobotsDirectives = set(hostCol, v)

  final val userAgent: Param[String] = param[String](
    "userAgent",
    "Product token whose Crawl-delay applies, next to '*' (case-insensitive exact match).",
    "*")
  def getUserAgent: String = get(userAgent)
  def setUserAgent(v: String): RobotsDirectives = set(userAgent, v)

  override def transform(inputs: DataFrame*): Array[DataFrame] = {
    require(inputs.size == 1)
    val h = getHostCol
    val o = getOutputCol
    val agent = getUserAgent.toLowerCase(java.util.Locale.ROOT)

    val sectioned = RobotsParse.sectionedLines(inputs.head, getInputCol, h)

    // Sitemap: document-scoped — every non-empty line emits
    val sitemaps = sectioned
      .where(col("__dir") === "sitemap" && col("__val") =!= "")
      .select(col(h), lit("sitemap").as(s"${o}_kind"), col("__val").as(s"${o}_value"))

    // Crawl-delay: group-scoped — the rule-table selection applies
    val applicable = RobotsParse.applicableSections(sectioned, h, agent)
    val delays = sectioned
      .where(col("__dir") === "crawl-delay" && col("__val") =!= "")
      .join(applicable,
        col(h) === col("__h2") && col("__sec") === col("__sec2"))
      .select(col(h), lit("crawl-delay").as(s"${o}_kind"), col("__val").as(s"${o}_value"))

    Array(sitemaps.unionByName(delays)
      .withColumn(s"${o}_delay",
        when(col(s"${o}_kind") === "crawl-delay",
          expr(s"try_cast(${o}_value AS double)"))))
  }
}

object RobotsDirectives extends StageLoader[RobotsDirectives] {
  def load(spark: SparkSession, path: String): RobotsDirectives =
    ReadWrite.applyParams(new RobotsDirectives, path)
}

object RobotsTxtParser extends StageLoader[RobotsTxtParser] {
  def load(spark: SparkSession, path: String): RobotsTxtParser =
    ReadWrite.applyParams(new RobotsTxtParser, path)
}

/**
 * robots.txt URL filtering — the consumer side of [[RobotsTxtParser]]
 * and the engine's first genuinely TWO-input transform (the
 * reference's varargs `transform(Table...)` signature, exercised):
 * `transform(urls, rules)` marks every URL row allowed or blocked
 * under RFC 9309 matching — among the host's rules that match the
 * URL's path, the LONGEST rule as written wins (the §2.2.2
 * most-octets precedence, wildcards counted as their own octets per
 * the Google reference parser); a length tie goes to `allow`; a URL
 * with no matching rule (or no rules at all for its host) is
 * allowed.
 *
 * §2.2.3 wildcards: `*` in a rule matches any run of characters and
 * a TRAILING `$` anchors the rule at the end of the path (a `$`
 * anywhere else is a literal octet, matching the Google parser).
 * Rules without either special stay on the plain `startsWith` fast
 * path; wildcard rules are translated ONCE, on the (tiny) rules
 * table before the join, into an anchored RE2 pattern
 * (metacharacters escaped, `*` → `.*`) so the per-candidate work is
 * a regex match, never a per-row pattern build from scratch.
 *
 * Output: the url table plus
 *  - `<o>_allowed`: boolean verdict;
 *  - `<o>_prefix`: the winning rule's prefix (null when no rule
 *    matched).
 *
 * Scale shape (100 TB frontier): verdicts are computed on a slim
 * (id, host, path) projection — one equi-join on host against the
 * rules table (robots rules are tiny next to the frontier: AQE
 * broadcasts them in practice; a pathological host's rule count is
 * bounded by the 500 KiB robots.txt cap, so the per-URL candidate
 * fan-out is bounded too), one groupBy(id) argmax folded into
 * max(struct(prefix_len, is_allow, prefix)), then one join back to
 * the full url table on `idCol`. Payload columns never ride through
 * the candidate fan-out.
 */
class RobotsUrlFilter extends AlgoOperator[RobotsUrlFilter]
    with HasOutputCol[RobotsUrlFilter] {

  final val idCol: Param[String] = param[String](
    "idCol", "Unique key of the url table (verdicts join back on it).", "url")
  def getIdCol: String = get(idCol)
  def setIdCol(v: String): RobotsUrlFilter = set(idCol, v)

  final val hostCol: Param[String] = param[String](
    "hostCol", "Host column, present in BOTH inputs (the join key).", "host")
  def getHostCol: String = get(hostCol)
  def setHostCol(v: String): RobotsUrlFilter = set(hostCol, v)

  final val pathCol: Param[String] = param[String](
    "pathCol", "URL path column to match rule prefixes against.", "path")
  def getPathCol: String = get(pathCol)
  def setPathCol(v: String): RobotsUrlFilter = set(pathCol, v)

  final val ruleCol: Param[String] = param[String](
    "ruleCol", "Rules-table column holding allow/disallow (RobotsTxtParser's <o>_rule).", "r_rule")
  def getRuleCol: String = get(ruleCol)
  def setRuleCol(v: String): RobotsUrlFilter = set(ruleCol, v)

  final val prefixCol: Param[String] = param[String](
    "prefixCol", "Rules-table column holding the path prefix (RobotsTxtParser's <o>_prefix).", "r_prefix")
  def getPrefixCol: String = get(prefixCol)
  def setPrefixCol(v: String): RobotsUrlFilter = set(prefixCol, v)

  /** @param inputs (urls, rules) — rules as produced by [[RobotsTxtParser]]. */
  override def transform(inputs: DataFrame*): Array[DataFrame] = {
    require(inputs.size == 2, s"RobotsUrlFilter takes (urls, rules), got ${inputs.size} inputs")
    val Seq(urls, rules) = inputs.toSeq
    val o = getOutputCol

    val slim = urls.select(col(getIdCol).as("__id"),
      col(getHostCol).as("__h"), col(getPathCol).as("__p"))

    // RFC 9309 §2.2.3: translate wildcard rules to anchored RE2 on
    // the rules side (tiny) — a trailing '$' anchors, any other '$'
    // is literal; '*' matches any run; everything else is escaped.
    val anchored = col("__prefix").endsWith("$")
    val body = when(anchored,
      expr("substring(__prefix, 1, length(__prefix) - 1)"))
      .otherwise(col("__prefix"))
    val rx = concat(lit("^"),
      regexp_replace(
        regexp_replace(body, "([.^$+?(){}\\[\\]|\\\\])", "\\\\$1"),
        "\\*", ".*"),
      when(anchored, lit("$")).otherwise(lit("")))
    val r = rules.select(col(getHostCol).as("__rh"),
      col(getRuleCol).as("__rule"), col(getPrefixCol).as("__prefix"))
      .withColumn("__wild",
        col("__prefix").contains("*") || col("__prefix").endsWith("$"))
      .withColumn("__rx", when(col("__wild"), rx))

    // candidates: same host AND the rule matches — plain prefixes on
    // the startsWith fast path, wildcard rules via regexp_like; the
    // argmax struct orders by (rule length, allow-beats-disallow)
    val matches = when(col("__wild"), regexp_like(col("__p"), col("__rx")))
      .otherwise(col("__p").startsWith(col("__prefix")))
    val verdicts = slim
      .join(r, col("__h") === col("__rh") && matches)
      .groupBy("__id")
      .agg(max(struct(length(col("__prefix")).as("l"),
        (col("__rule") === "allow").as("a"),
        col("__prefix").as("p"))).as("__win"))
      .select(col("__id"), col("__win.a").as(s"${o}_allowed"),
        col("__win.p").as(s"${o}_prefix"))

    val out = urls
      .join(verdicts, col(getIdCol) === col("__id"), "left")
      .drop("__id")
      .withColumn(s"${o}_allowed", coalesce(col(s"${o}_allowed"), lit(true)))
    Array(out)
  }
}

object RobotsUrlFilter extends StageLoader[RobotsUrlFilter] {
  def load(spark: SparkSession, path: String): RobotsUrlFilter =
    ReadWrite.applyParams(new RobotsUrlFilter, path)
}
