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
  * two further runs) after an untimed Spark warmup. The printed line
  * carries totals plus the heaviest per-query warm timings so it
  * stays inside the driver's stdout tail window; the complete
  * cold+warm per-query detail goes to bench_out.json.
  *
  * Timing forces full execution through the noop datasource sink so
  * Catalyst cannot prune deterministic projection columns the way a
  * bare `.count()` would; failures surface as `"failed":[names]`
  * rather than being silently swallowed.
  *
  * Isolated single-query timing (the judge's TimeQ): pass the query
  * name(s) — `runMain graft.Bench q_swing` — which runs exactly one
  * child JVM for them.
  */
object Bench {
  private val WarmRuns = 2
  private val GroupSize = 10

  def main(args: Array[String]): Unit = args match {
    case Array("--child", sfDir, outPath, names) =>
      child(sfDir, outPath, names.split(",").toIndexedSeq)
    case rest =>
      parent(if (rest.isEmpty) None else Some(rest.flatMap(_.split(",")).toSet))
  }

  // ---------------------------------------------------------------- parent

  private def parent(only: Option[Set[String]]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val names = SparkEntry.queries.keys.toSeq.sorted
      .filter(n => only.forall(_.contains(n)))
    val groups = names.grouped(GroupSize).toSeq

    val timings = scala.collection.mutable.LinkedHashMap.empty[String, (Double, Double)]
    val failed = scala.collection.mutable.ArrayBuffer.empty[String]
    // a mistyped query name must not produce a success-looking zero line
    only.foreach(o => failed ++= (o -- SparkEntry.queries.keySet).toSeq.sorted
      .map(n => s"unknown:$n"))

    groups.foreach { group =>
      runChild(sfDir, group) match {
        case Some(rows) =>
          rows.foreach { case (n, c, w) => timings(n) = (c, w) }
          val missing = group.filterNot(timings.contains)
          // a query crashed the child mid-group: isolate the survivors
          // one JVM each so one bad query can't zero its groupmates
          missing.foreach { n =>
            runChild(sfDir, Seq(n)) match {
              case Some(Seq((`n`, c, w))) => timings(n) = (c, w)
              case _ => failed += n
            }
          }
        case None => failed ++= group
      }
    }

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

    // full detail (every query, cold + warm) — survives as a repo file
    val detailJson = timings
      .map { case (k, (c, w)) => s""""$k":{"cold":${fmt(c)},"warm":${fmt(w)}}""" }
      .mkString("{", ",", "}")
    val failedJson = failed.map("\"" + _ + "\"").mkString("[", ",", "]")
    val detailLine =
      s"""{"metric":"total_warm","value":${fmt(warmTotal)},"unit":"sec","cold_total":${fmt(coldTotal)},"core_r1_total":${fmt(coreTotal)},"num_queries":${timings.size},"warm_runs_per_query":$WarmRuns,"queries":$detailJson,"sf":"$sfDir","failed":$failedJson}"""
    java.nio.file.Files.writeString(java.nio.file.Paths.get("bench_out.json"), detailLine + "\n")

    // stdout line: top-N heaviest only, so the driver's tail window
    // never truncates it mid-JSON (the full 88-entry map did in r4)
    val top = timings.toSeq.sortBy(-_._2._2).take(30)
    val qs = top.map { case (k, (_, w)) => "\"" + k + "\":" + fmt(w) }.mkString("{", ",", "}")
    val line =
      s"""{"metric":"total_warm","value":${fmt(warmTotal)},"unit":"sec","cold_total":${fmt(coldTotal)},"core_r1_total":${fmt(coreTotal)},"num_queries":${timings.size},"queries":$qs,"queries_shown":${top.size},"detail_file":"bench_out.json","sf":"$sfDir","failed":$failedJson}"""
    println(line)
    System.out.flush()
  }

  /** Fork one fresh JVM over `group`; returns (name, cold, warm) rows. */
  private def runChild(sfDir: String, group: Seq[String]): Option[Seq[(String, Double, Double)]] = {
    import scala.jdk.CollectionConverters._
    val out = java.nio.file.Files.createTempFile("bench_child", ".tsv")
    val javaBin = java.nio.file.Paths.get(sys.props("java.home"), "bin", "java").toString
    // propagate module opens / heap / -D flags the launcher gave us
    val jvmFlags = java.lang.management.ManagementFactory.getRuntimeMXBean
      .getInputArguments.asScala.toSeq
      .filter(a => a.startsWith("--add-opens") || a.startsWith("-X") || a.startsWith("-D"))
    val cmd = Seq(javaBin) ++ jvmFlags ++ Seq(
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
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
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
        val warm = (1 to WarmRuns).map(_ => once()).min
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
