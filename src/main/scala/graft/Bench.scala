package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main: times every SparkEntry query against
  * SPARK_GRAFT_SF_DIR and prints ONE JSON line.
  *
  * Round-4 lesson: 88 queries through one long-lived 128 GiB JVM
  * inflate late measurements up to 24x vs isolated runs (codegen
  * class accumulation + GC/broadcast pressure that clearCache alone
  * does not curb). So the parent process forks a FRESH child JVM per
  * group of queries (same classpath/-Xmx/--add-opens as itself), and
  * each child times every query cold (first run) and warm (min of
  * two further runs) after an untimed Spark warmup.
  *
  * Round-5 lesson: ALPHABETICAL groups of 10 still contaminate — one
  * heavy query (q_swing) leading a group degraded its 8 groupmates up
  * to 12x vs isolated runs. Grouping is therefore COST-AWARE, seeded
  * from the previous run's per-query warm timings
  * (benchmarks/bench_costs.json, refreshed by every full run, plus
  * any local bench_out.json overlay): each query whose prior warm
  * cost is ≥ [[SoloCostSec]] — or is in the top [[SoloTopN]] — runs
  * ALONE in its own child JVM; the cheap remainder packs into shared
  * groups capped at [[GroupSize]] queries and [[GroupCostCap]]
  * summed warm seconds, ordered cheapest-first so any residual JVM
  * degradation lands on the query that caused it, not its followers.
  * Any row with warm > cold (an impossible ordering for a healthy
  * JVM) is retried once — and, for sub-second queries where a single
  * scheduler hiccup outweighs the query itself, with
  * [[ExtraWarmRunsSubSecond]] further samples — and if it still
  * persists ABOVE [[SuspectNoiseFloorSec]] it is published with
  * `"suspect":true` instead of silently standing. Below the floor
  * the inversion is sub-noise by construction (round-9 lesson:
  * q_ngram published warm 0.312 > cold 0.292 — 20 ms of jitter on a
  * 0.3 s query — and flagged a healthy run).
  *
  * Timing forces full execution through the noop datasource sink so
  * Catalyst cannot prune deterministic projection columns the way a
  * bare `.count()` would; failures surface as `"failed":[names]`
  * rather than being silently swallowed. The printed line carries
  * totals plus the heaviest per-query warm timings so it stays
  * inside the driver's stdout tail window; the complete cold+warm
  * per-query detail goes to bench_out.json.
  *
  * Round-6 lesson: the bench inherited whatever -Xmx the launcher
  * had (a stray SPARK_DRIVER_MEM=90g turned a 9.3 s query into an
  * 86.6 s published row via GC collapse). Child JVMs now run a
  * PINNED canonical heap + GC ([[benchHeapMb]] default 8 GiB;
  * [[benchGc]] default ParallelGC — G1 measured 2–6× slower and
  * unstable at large heaps on this profile), and bench_out.json
  * records {child_heap_mb, gc, cpus, loadavg} so no number can be
  * divorced from its config. Partial runs write
  * bench_out_partial.json instead of clobbering the full artifact.
  *
  * Round-14 lesson: the 1.4× solo-reverify gate compares against the
  * freshest local overlay, so steady ambient drift on UNCHANGED
  * queries (r13: four untouched queries +30-43%, equally large swings
  * the other way) sailed through. A second, milder gate
  * ([[DriftFactor]] 1.25×) compares against the COMMITTED
  * bench_costs.json seed only: such rows get the same solo re-run,
  * and any that still exceed the factor publish under `"drift"` so
  * the round adjudicates them by name. Both gates (and the
  * scheduling overlay) are PER-SCALE: seed and artifacts carry an sf
  * stamp, and priors from another scale are ignored — an sf0.001
  * quick drive's numbers must not become the sf0.1 publish's priors
  * (they would trip the 1.4× gate on essentially every query).
  *
  * Isolated single-query timing (the judge's TimeQ): pass the query
  * name(s) — `runMain graft.Bench q_swing` — which runs exactly one
  * child JVM for them.
  */
object Bench {
  private val WarmRuns = 2
  private val GroupSize = 10
  /** Prior warm cost (sec) at which a query gets a private child JVM. */
  private val SoloCostSec = 3.0
  /** The N heaviest-by-prior-cost queries always run solo. */
  private val SoloTopN = 8
  /** Max summed prior warm cost packed into one shared child JVM. */
  private val GroupCostCap = 12.0
  /** Prior cost assumed for queries never measured before. */
  private val DefaultCostSec = 1.5
  /** A published warm row above this multiple of its prior cost is
    * treated as group contamination and re-run once in a solo child
    * before publishing (round-7 judge rule: q_swing_arrays published
    * 1.4×+ its prior from a shared JVM; the solo number was real). */
  private val SoloReverifyFactor = 1.4
  /** Round-14 (r13 judge item): ambient drift on UNCHANGED queries —
    * four untouched queries published +30-43% while equally large
    * swings ran the other way — was caught by nobody because the
    * 1.4× gate only compared against the freshest local overlay.
    * Any row above this multiple of its COMMITTED seed prior (the
    * repo-checked-in bench_costs.json, not the scratch overlay) also
    * gets the solo re-verify treatment, and if it STILL exceeds the
    * factor after re-running it publishes under "drift" so the round
    * adjudicates it explicitly instead of forensically. */
  private val DriftFactor = 1.25
  /** Drift also needs this much ABSOLUTE movement: on the first
    * sf0.1 publish the ratio-only gate flagged 20 rows of which 19
    * were sub-1.5 s queries moved 60-300 ms by fixed-cost jitter —
    * 1.25× of a small number is noise, not drift (the suspect gate's
    * noise-floor lesson, applied to the round-over-round axis). */
  private val DriftAbsFloorSec = 0.5
  private val CostsPath = "benchmarks/bench_costs.json"
  /** warm > cold only counts as suspect when warm also exceeds this
    * floor: beneath it the inversion is scheduler jitter on a query
    * cheaper than the noise, not JVM degradation. */
  private[graft] val SuspectNoiseFloorSec = 0.5
  /** Extra warm samples taken when a query still shows warm > cold
    * after the standard retry (originally sub-second only; round-11
    * extended to every scale after q_polynomial published a 3%
    * inversion at 1.6 s — a real inversion survives 3 more samples, a
    * scheduler hiccup doesn't). */
  private val ExtraWarmRuns = 3

  /** Is a (cold, warm) row suspect? warm > cold is impossible for a
    * healthy JVM (warm is a min over later runs of the same work) —
    * but only meaningful above the noise floor. */
  private[graft] def isSuspect(cold: Double, warm: Double): Boolean =
    warm > cold && warm > SuspectNoiseFloorSec

  /** Does this (query, warm) row need the automatic solo re-run?
    * Any row above the factor qualifies when a prior exists — shared
    * children suffer cross-query contamination, and a SOLO child can
    * itself be a one-off slow JVM instance (round-11:
    * q_online_kmeans_versioned published 7.9 s from one solo child
    * against a 3.1-3.9 s four-run band; the min of two fresh-JVM runs
    * is still an honest number, a single unlucky JVM is not). */
  private[graft] def needsSoloReverify(warm: Double, prior: Option[Double],
      ranSolo: Boolean): Boolean =
    prior.exists(p => p > 0.0 && warm > p * SoloReverifyFactor)

  /** Drift vs the COMMITTED cost seed (>DriftFactor×): milder than the
    * contamination gate, but enough that the row must carry a solo
    * re-verified number and, if it stands, a "drift" stamp. */
  private[graft] def isDrift(warm: Double, seedPrior: Option[Double]): Boolean =
    seedPrior.exists(p => p > 0.0 && warm > p * DriftFactor &&
      warm - p > DriftAbsFloorSec)

  def main(args: Array[String]): Unit = args match {
    case Array("--child", sfDir, outPath, names) =>
      child(sfDir, outPath, names.split(",").toIndexedSeq)
    case rest =>
      parent(if (rest.isEmpty) None else Some(rest.flatMap(_.split(",")).toSet))
  }

  // ---------------------------------------------------------------- parent

  /** Canonical child-JVM heap in MiB. Children do NOT inherit the
    * launcher's -Xmx: round 6 published 86.6 s for a 9.3 s query
    * because the bench silently ran under a ~90 GiB heap someone had
    * exported for a different workload (SPARK_DRIVER_MEM), and
    * GC-sensitive queries measure 5× slower there. A benchmark number
    * divorced from its memory config is noise, so the heap is PINNED
    * here and recorded in bench_out.json; override explicitly with
    * SPARK_GRAFT_BENCH_HEAP_MB when studying heap sensitivity. */
  private def benchHeapMb: Int =
    sys.env.get("SPARK_GRAFT_BENCH_HEAP_MB").flatMap(_.toIntOption).getOrElse(8192)

  /** Canonical child GC. Measured on q_swing/q_swing_capped at 90 GiB
    * heap (tools/bench_child.sh, round 7): G1 is unstable and 2–6×
    * slower for this shuffle/sort-heavy profile (warm 12–61 s across
    * runs; 32 s total GC, 9.3 s max pause, humongous-allocation
    * storms from ≥16 MB task pages vs its 32 MB regions), while
    * ParallelGC runs 8.5/7.3 s and ZGC 9.2/8.3 s — at or BELOW the
    * 8 GiB G1 numbers. Large executors should run this engine on a
    * throughput collector; the bench encodes that recommendation and
    * records it. Override with SPARK_GRAFT_BENCH_GC=G1|Parallel|Z. */
  private def benchGc: String =
    sys.env.getOrElse("SPARK_GRAFT_BENCH_GC", "Parallel")

  /** Per-query prior warm cost: committed seed overlaid by the local
    * scratch detail of the most recent full run, then any partial run
    * (partial runs are the freshest signal but cover few queries).
    * Overlays (and a stamped seed) apply only at the SAME scale as
    * the current run: an sf0.001 quick drive's bench_out.json would
    * otherwise become the "prior" for the sf0.1 publish and trip the
    * 1.4× solo gate on essentially every query (round-14 lesson, the
    * same cross-scale trap as the drift gate's seed). An unstamped
    * artifact is assumed comparable. */
  private def loadCosts(sfDir: String): Map[String, Double] = {
    def readFile(p: String): String =
      try new String(java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(p)), "UTF-8")
      catch { case _: Exception => "" }
    val flat = """"([A-Za-z0-9_]+)"\s*:\s*([0-9][0-9.]*)""".r
    val detail = """"([A-Za-z0-9_]+)":\{"cold":([0-9.]+),"warm":([0-9.]+)""".r
    val sfOf = """"sf"\s*:\s*"([^"]*)"""".r
    // cpus stamp (round-17): the driver also publishes an 8-cpu
    // scaling run, and its artifact refreshing the seed/overlay made
    // 32-cpu runs compare against 8-cpu warms — absolute priors are
    // only comparable at the SAME core count (same trap as cross-sf).
    // An unstamped artifact is assumed comparable (pre-stamp files).
    val cpusNow = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val cpusOf = """"cpus"\s*:\s*"([0-9]+)"""".r
    def warms(path: String): Map[String, Double] = {
      val body = readFile(path)
      if (sfOf.findFirstMatchIn(body).exists(_.group(1) != sfDir) ||
          cpusOf.findFirstMatchIn(body).exists(_.group(1) != cpusNow)) Map.empty
      else detail.findAllMatchIn(body).map(m => m.group(1) -> m.group(3).toDouble).toMap
    }
    val seedBody = readFile(CostsPath)
    val seed =
      if (sfOf.findFirstMatchIn(seedBody).map(_.group(1))
            .orElse(""""__sf"\s*:\s*"([^"]*)"""".r.findFirstMatchIn(seedBody).map(_.group(1)))
            .exists(_ != sfDir) ||
          """"__cpus"\s*:\s*"([0-9]+)"""".r.findFirstMatchIn(seedBody)
            .exists(_.group(1) != cpusNow)) Map.empty[String, Double]
      else flat.findAllMatchIn(seedBody).map(m => m.group(1) -> m.group(2).toDouble).toMap
    seed ++ warms("bench_out.json") ++ warms("bench_out_partial.json")
  }

  /** The committed seed ALONE — the round-over-round reference the
    * drift gate compares against (the local overlay is the freshest
    * signal for scheduling, but it may itself already contain the
    * drift being hunted). The seed carries an `__sf` stamp: a full
    * run at another scale refreshes the file for SCHEDULING, and
    * cross-scale absolute comparisons are meaningless (every
    * fixed-cost query "drifts" when an sf0.001 warm meets an sf0.1
    * prior — observed on this gate's first day), so drift only fires
    * when the seed's scale matches the run's. A stampless seed is
    * assumed comparable (the pre-stamp committed file). */
  private def loadSeedCosts(sfDir: String): Map[String, Double] = {
    val body =
      try new String(java.nio.file.Files.readAllBytes(
        java.nio.file.Paths.get(CostsPath)), "UTF-8")
      catch { case _: Exception => "" }
    val seedSf = """"__sf"\s*:\s*"([^"]*)"""".r.findFirstMatchIn(body).map(_.group(1))
    val seedCpus = """"__cpus"\s*:\s*"([0-9]+)"""".r.findFirstMatchIn(body).map(_.group(1))
    // same-scale AND same-core-count only: the driver's 8-cpu scaling
    // publish refreshing this file must not become the 32-cpu run's
    // drift reference (round-16: two spurious drift flags from exactly
    // this; a stampless seed is assumed comparable)
    if (seedSf.exists(_ != sfDir) ||
        seedCpus.exists(_ != sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))) Map.empty
    else """"([A-Za-z0-9_]+)"\s*:\s*([0-9][0-9.]*)""".r.findAllMatchIn(body)
      .map(m => m.group(1) -> m.group(2).toDouble).toMap
  }

  /** Cost-aware schedule: heavy queries solo, cheap ones packed
    * cheapest-first under a size + summed-cost cap. */
  private[graft] def schedule(names: Seq[String], costs: Map[String, Double]): Seq[Seq[String]] = {
    def cost(n: String): Double = costs.getOrElse(n, DefaultCostSec)
    if (names.size <= 1) return Seq(names).filter(_.nonEmpty)
    val byCost = names.sortBy(n => (-cost(n), n))
    val solo = byCost.take(SoloTopN) ++
      byCost.drop(SoloTopN).filter(n => cost(n) >= SoloCostSec)
    val soloSet = solo.toSet
    val shared = names.filterNot(soloSet).sortBy(n => (cost(n), n))
    val groups = scala.collection.mutable.ArrayBuffer.empty[Seq[String]]
    var cur = scala.collection.mutable.ArrayBuffer.empty[String]
    var curCost = 0.0
    shared.foreach { n =>
      if (cur.nonEmpty && (cur.size >= GroupSize || curCost + cost(n) > GroupCostCap)) {
        groups += cur.toSeq; cur = scala.collection.mutable.ArrayBuffer.empty[String]; curCost = 0.0
      }
      cur += n; curCost += cost(n)
    }
    if (cur.nonEmpty) groups += cur.toSeq
    solo.map(Seq(_)) ++ groups.toSeq
  }

  /** 1-min load gate above which a run counts as started-on-a-loaded-
    * box; overridable for smaller boxes (SPARK_GRAFT_MAX_LOADAVG). */
  private def maxLoadavgGate: Double = sys.env.get("SPARK_GRAFT_MAX_LOADAVG")
    .flatMap(_.toDoubleOption).getOrElse(2.0)

  private def parent(only: Option[Set[String]]): Unit = {
    // box idleness EVIDENCE: the end-of-run loadavg (recorded below)
    // inevitably measures the bench's own 32-thread work, so the
    // pre-run sample is the one that can certify an idle box
    def loadavgNow: Double = java.lang.management.ManagementFactory
      .getOperatingSystemMXBean.getSystemLoadAverage
    // idle-wait (round-13): a loaded box at launch previously only
    // STAMPED the artifact contaminated (the r12 driver run shipped
    // that way — its loadavg was its own just-finished compile check
    // decaying). Now the parent WAITS, bounded, for the 1-min load to
    // fall under the gate before sampling loadavg_start, so an
    // unattended per-round run starts clean instead of merely
    // self-identifying as dirty. SPARK_GRAFT_IDLE_WAIT_SEC=0 restores
    // stamp-only behavior; if the box never idles inside the budget
    // the run proceeds and the contaminated stamp still applies.
    val idleWaitSec = sys.env.get("SPARK_GRAFT_IDLE_WAIT_SEC")
      .flatMap(_.toIntOption).getOrElse(600)
    val waitDeadline = System.nanoTime() + idleWaitSec * 1000000000L
    var idleWaited = 0L
    var loadavgStart = loadavgNow
    while (loadavgStart >= 0.0 && loadavgStart > maxLoadavgGate &&
        System.nanoTime() < waitDeadline) {
      System.err.println(String.format(java.util.Locale.ROOT,
        "[bench] loadavg %.2f > gate %.2f — waiting for idle box (%ds of %ds budget used)",
        Double.box(loadavgStart), Double.box(maxLoadavgGate),
        Long.box(idleWaited), Int.box(idleWaitSec)))
      Thread.sleep(15000)
      idleWaited += 15
      loadavgStart = loadavgNow
    }
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val names = SparkEntry.queries.keys.toSeq.sorted
      .filter(n => only.forall(_.contains(n)))
    val groups = schedule(names, loadCosts(sfDir))

    val timings = scala.collection.mutable.LinkedHashMap.empty[String, (Double, Double)]
    val failed = scala.collection.mutable.ArrayBuffer.empty[String]
    // a mistyped query name must not produce a success-looking zero line
    only.foreach(o => failed ++= (o -- SparkEntry.queries.keySet).toSeq.sorted
      .map(n => s"unknown:$n"))

    val soloRan = scala.collection.mutable.Set.empty[String]
    groups.foreach { group =>
      if (group.size == 1) soloRan += group.head
      // a crashed child (even before its first row) only fails the
      // queries that ALSO fail in one-JVM-per-query isolation
      val rows = runChild(sfDir, group).getOrElse(Seq.empty)
      rows.foreach { case (n, c, w) => timings(n) = (c, w) }
      val missing = group.filterNot(timings.contains)
      missing.foreach { n =>
        runChild(sfDir, Seq(n)) match {
          case Some(Seq((`n`, c, w))) => timings(n) = (c, w); soloRan += n
          case _ => failed += n
        }
      }
    }

    // solo re-verify: any row about to publish >SoloReverifyFactor× its
    // prior — OR >DriftFactor× its COMMITTED seed prior (round-14: the
    // unchanged-query drift gate; the local overlay may already carry
    // the drift, so the milder check runs against the seed only) —
    // gets one isolated child re-run, and the better warm wins:
    // shared-JVM contamination must not become the published number
    val priors = loadCosts(sfDir)
    val seedPriors = loadSeedCosts(sfDir)
    val reverified = scala.collection.mutable.ArrayBuffer.empty[String]
    timings.toSeq.foreach { case (n, (c, w)) =>
      if (needsSoloReverify(w, priors.get(n), soloRan.contains(n)) ||
          isDrift(w, seedPriors.get(n))) {
        runChild(sfDir, Seq(n)) match {
          case Some(Seq((`n`, c2, w2))) =>
            reverified += n
            if (w2 < w) timings(n) = (math.min(c, c2), w2)
          case _ => () // keep the shared-JVM row; the re-run itself failed
        }
      }
    }
    // a row STILL suspect (warm > cold above the noise floor, which a
    // healthy JVM cannot produce) gets one isolated re-run before
    // publishing: a CLEAN solo measurement replaces the contaminated
    // row wholesale (never mixed-and-matched across runs); if the solo
    // run is inverted too, the better row publishes, flag standing.
    timings.toSeq.foreach { case (n, (c, w)) =>
      if (isSuspect(c, w)) {
        runChild(sfDir, Seq(n)) match {
          case Some(Seq((`n`, c2, w2))) =>
            if (!reverified.contains(n)) reverified += n
            if (!isSuspect(c2, w2) || w2 < w) timings(n) = (c2, w2)
          case _ => ()
        }
      }
    }
    // restore name order so output diffs cleanly across rounds
    val ordered = names.flatMap(n => timings.get(n).map(n -> _))
    timings.clear(); ordered.foreach { case (n, t) => timings(n) = t }

    def fmt(v: Double): String = String.format(java.util.Locale.ROOT, "%.3f", Double.box(v))
    val warmTotal = timings.values.map(_._2).sum
    val coldTotal = timings.values.map(_._1).sum
    // like-for-like subtotal over the round-1 query set, so round-over-
    // round comparisons aren't distorted by coverage growth
    val r1Queries = Set(
      "q_sql_pricing", "q_tokenizer", "q_regex_tokenizer", "q_ngram", "q_binarizer",
      "q_bucketizer", "q_standard_scaler", "q_minmax_scaler", "q_maxabs_scaler",
      "q_robust_scaler", "q_imputer", "q_string_indexer", "q_onehot",
      "q_count_vectorizer", "q_idf", "q_kbins_uniform", "q_variance_selector",
      "q_vector_functions", "q_kmeans", "q_logreg_predict", "q_linreg_predict",
      "q_linsvc_predict", "q_logreg_train", "q_naive_bayes", "q_knn")
    val coreTotal = timings.collect { case (k, (_, w)) if r1Queries(k) => w }.sum

    // warm > cold is impossible for a healthy JVM — publish the
    // contradiction as a flag instead of leaving the reader to spot
    // it (round-5 lesson), but only above the noise floor (round-9)
    val suspects = timings.collect { case (k, (c, w)) if isSuspect(c, w) => k }.toSeq
    val suspectJson = suspects.map("\"" + _ + "\"").mkString("[", ",", "]")
    // rows that STILL exceed DriftFactor× their committed seed prior
    // after the solo re-verify: real plan movement or standing ambient
    // shift — published by name so the round adjudicates it in
    // BASELINE instead of a judge reconstructing it from two artifacts
    val drifted = timings.collect {
      case (k, (_, w)) if isDrift(w, seedPriors.get(k)) => k
    }.toSeq.sorted
    val driftJson = drifted.map("\"" + _ + "\"").mkString("[", ",", "]")

    // full detail (every query, cold + warm) — survives as a repo file
    val detailJson = timings
      .map { case (k, (c, w)) =>
        val flag = if (isSuspect(c, w)) ""","suspect":true""" else ""
        s""""$k":{"cold":${fmt(c)},"warm":${fmt(w)}$flag}"""
      }
      .mkString("{", ",", "}")
    val failedJson = failed.map("\"" + _ + "\"").mkString("[", ",", "]")
    // the config a number is meaningless without: pinned child heap,
    // GC, box load at publish time (round-6 lesson — see benchHeapMb)
    val loadavg = java.lang.management.ManagementFactory.getOperatingSystemMXBean
      .getSystemLoadAverage
    // self-gating publish (round-12): a run whose PRE-run 1-min load
    // already exceeded the threshold started on a loaded box, so its
    // per-row deltas are ambient noise, not plan movement — stamp the
    // artifact "contaminated" so it self-identifies instead of needing
    // forensic reconstruction every round (BENCH_r11 shipped with
    // loadavg_start 6.94 and every flagged mover was load noise).
    // Stamp, don't refuse: an aborted publish would zero the round's
    // bench artifact entirely, which is strictly worse than a labeled
    // one. (The bounded idle-wait above makes the stamp rare; it still
    // fires when the box never idled inside the wait budget.)
    val maxLoadavg = maxLoadavgGate
    val contaminated = loadavgStart >= 0.0 && loadavgStart > maxLoadavg
    if (contaminated)
      System.err.println(s"[bench] WARNING: loadavg_start ${fmt(loadavgStart)} > " +
        s"$maxLoadavg — box was not idle at launch; artifact stamped contaminated")
    val envJson =
      s"""{"child_heap_mb":$benchHeapMb,"gc":"$benchGc","cpus":"${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}","loadavg_start":${fmt(loadavgStart)},"loadavg":${fmt(loadavg)},"max_loadavg_gate":$maxLoadavg,"idle_waited_sec":$idleWaited}"""
    val reverifiedJson = reverified.map("\"" + _ + "\"").mkString("[", ",", "]")
    val detailLine =
      s"""{"metric":"total_warm","value":${fmt(warmTotal)},"unit":"sec","cold_total":${fmt(coldTotal)},"core_r1_total":${fmt(coreTotal)},"num_queries":${timings.size},"warm_runs_per_query":$WarmRuns,"contaminated":$contaminated,"env":$envJson,"queries":$detailJson,"sf":"$sfDir","failed":$failedJson,"suspect":$suspectJson,"drift":$driftJson,"solo_reverified":$reverifiedJson}"""
    // a partial run (explicit query names) must not clobber the full
    // run's artifact — the round-6 judge did exactly that by accident
    val outFile = if (only.isEmpty) "bench_out.json" else "bench_out_partial.json"
    java.nio.file.Files.writeString(java.nio.file.Paths.get(outFile), detailLine + "\n")

    // a FULL run refreshes the committed cost seed so the next run's
    // grouping reflects current reality (partial runs must not clobber)
    if (only.isEmpty && timings.nonEmpty) {
      val body = timings.toSeq.sortBy(-_._2._2)
        .map { case (k, (_, w)) => s""" "$k": ${fmt(w)}""" }
        .mkString(s"""{\n "__sf": "$sfDir",\n "__cpus": "${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}",\n""", ",\n", "\n}\n")
      try java.nio.file.Files.writeString(java.nio.file.Paths.get(CostsPath), body)
      catch { case _: Exception => () } // read-only checkout: grouping just stays seeded
    }

    // stdout line: top-N heaviest only, so the driver's tail window
    // never truncates it mid-JSON (the full 88-entry map did in r4)
    val top = timings.toSeq.sortBy(-_._2._2).take(30)
    val qs = top.map { case (k, (_, w)) => "\"" + k + "\":" + fmt(w) }.mkString("{", ",", "}")
    val line =
      s"""{"metric":"total_warm","value":${fmt(warmTotal)},"unit":"sec","cold_total":${fmt(coldTotal)},"core_r1_total":${fmt(coreTotal)},"num_queries":${timings.size},"queries":$qs,"queries_shown":${top.size},"detail_file":"bench_out.json","sf":"$sfDir","failed":$failedJson,"suspect":$suspectJson,"drift":$driftJson}"""
    println(line)
    System.out.flush()
  }

  /** Fork one fresh JVM over `group`; returns (name, cold, warm) rows. */
  private def runChild(sfDir: String, group: Seq[String]): Option[Seq[(String, Double, Double)]] = {
    import scala.jdk.CollectionConverters._
    val out = java.nio.file.Files.createTempFile("bench_child", ".tsv")
    val javaBin = java.nio.file.Paths.get(sys.props("java.home"), "bin", "java").toString
    // propagate module opens / -D flags the launcher gave us — but
    // NEVER its heap sizing: children run the pinned canonical heap
    // and explicit G1 so every published number has a known, recorded
    // memory config (see benchHeapMb)
    val jvmFlags = java.lang.management.ManagementFactory.getRuntimeMXBean
      .getInputArguments.asScala.toSeq
      .filter(a => a.startsWith("--add-opens") || a.startsWith("-X") || a.startsWith("-D"))
      .filterNot(a => a.startsWith("-Xmx") || a.startsWith("-Xms") ||
        a.matches("""-XX:\+Use(G1|Parallel|Z|Serial|Shenandoah|Epsilon)GC"""))
    val cmd = Seq(javaBin) ++ jvmFlags ++
      Seq(s"-Xmx${benchHeapMb}m", s"-XX:+Use${benchGc}GC") ++ Seq(
      "-cp", sys.props("java.class.path"),
      "graft.Bench", "--child", sfDir, out.toString, group.mkString(","))
    val pb = new ProcessBuilder(cmd.asJava)
    // merge child stderr+stdout and pump it to OUR stderr: the parent's
    // stdout must stay clean so the final JSON line is the only thing
    // in the driver's tail window
    pb.redirectErrorStream(true)
    val proc = pb.start()
    val pump = new Thread(() => {
      val src = scala.io.Source.fromInputStream(proc.getInputStream)
      try src.getLines().foreach(System.err.println) finally src.close()
    })
    pump.setDaemon(true)
    pump.start()
    val code = proc.waitFor()
    pump.join(5000)
    val src = scala.io.Source.fromFile(out.toFile)
    val rows = try src.getLines().toSeq.flatMap { l =>
      l.split("\t") match {
        case Array(n, c, w) => Some((n, c.toDouble, w.toDouble))
        case _ => None
      }
    } finally src.close()
    java.nio.file.Files.deleteIfExists(out)
    if (code == 0 || rows.nonEmpty) Some(rows) else None
  }

  // ---------------------------------------------------------------- child

  private def child(sfDir: String, outPath: String, names: Seq[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    // extra session confs for A/B config studies, e.g.
    // SPARK_GRAFT_EXTRA_CONF="spark.sql.join.preferSortMergeJoin=false;..."
    // — empty by default so the published methodology is unchanged
    val extra = sys.env.getOrElse("SPARK_GRAFT_EXTRA_CONF", "")
      .split(";").toSeq.map(_.trim).filter(_.contains("="))
      .map { kv => val i = kv.indexOf('='); (kv.take(i), kv.drop(i + 1)) }
    val builder = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
    extra.foreach { case (k, v) => builder.config(k, v) }
    val spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    // untimed warmup: absorb one-off JVM/codegen/parquet-footer/shuffle
    // setup (~5 s) that would otherwise land on the first query
    locally {
      import org.apache.spark.sql.functions._
      spark.read.parquet(s"$sfDir/nation.parquet")
        .groupBy("n_regionkey").agg(count(lit(1)).as("c"))
        .write.format("noop").mode("overwrite").save()
    }
    val writer = new java.io.PrintWriter(new java.io.FileWriter(outPath), true)
    names.foreach { name =>
      val fn = SparkEntry.queries(name)
      def once(): Double = {
        val t0 = System.nanoTime()
        fn(spark, sfDir).write.format("noop").mode("overwrite").save()
        val dt = (System.nanoTime() - t0) / 1e9
        // each run pays for building its own caches inside its timed
        // window; dropping them after the clock stops keeps runs
        // self-contained
        spark.catalog.clearCache()
        dt
      }
      try {
        val cold = once()
        var warm = (1 to WarmRuns).map(_ => once()).min
        // warm > cold means a run got unlucky (GC pause, compilation
        // storm); one retry usually resolves it — if not, the parent
        // publishes the row as suspect
        if (warm > cold) warm = math.min(warm, once())
        // a single scheduler hiccup outweighs run-to-run signal, so
        // take a deeper sample before letting the inversion stand
        // (round-9 q_ngram lesson; round-11: any scale)
        if (warm > cold)
          warm = math.min(warm, (1 to ExtraWarmRuns).map(_ => once()).min)
        writer.println(s"$name\t$cold\t$warm")
      } catch {
        case e: Throwable =>
          System.err.println(s"[bench] $name FAILED: ${e.getMessage}")
          // flush what we have; the parent will isolate the rest
          writer.close()
          spark.stop()
          sys.exit(1)
      }
    }
    writer.close()
    spark.stop()
    sys.exit(0)
  }
}
