package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main: runs every SparkEntry query against
  * SPARK_GRAFT_SF_DIR and prints ONE JSON line with per-query seconds.
  *
  * Timing forces full execution through the noop datasource sink so
  * Catalyst cannot prune deterministic projection columns the way a
  * bare `.count()` would; failures surface as `"failed":[names]` in
  * the JSON rather than being silently swallowed.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    // untimed warmup: absorb one-off JVM/codegen/parquet-footer/shuffle
    // setup (~5 s) that would otherwise land on whichever query runs
    // first and distort its number
    locally {
      import org.apache.spark.sql.functions._
      spark.read.parquet(s"$sfDir/nation.parquet")
        .groupBy("n_regionkey").agg(count(lit(1)).as("c"))
        .write.format("noop").mode("overwrite").save()
    }
    val failed = scala.collection.mutable.ArrayBuffer.empty[String]
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val t0 = System.nanoTime()
      try {
        fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      } catch {
        case e: Throwable =>
          failed += name
          System.err.println(s"[bench] $name FAILED: ${e.getMessage}")
      }
      // each query pays for building its own caches inside its timed
      // window; dropping them after the clock stops keeps numbers
      // self-contained and stops cache growth across 69 queries
      val elapsed = (System.nanoTime() - t0) / 1e9
      spark.catalog.clearCache()
      name -> elapsed
    }
    // Locale.ROOT: the default-locale f-interpolator would print a
    // comma decimal separator on some JVMs, corrupting the JSON line
    def fmt(v: Double): String = String.format(java.util.Locale.ROOT, "%.3f", Double.box(v))
    val qs = results.map { case (k, v) => "\"" + k + "\":" + fmt(v) }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum
    // like-for-like subtotal over the round-1 query set, so round-over-
    // round comparisons aren't distorted by coverage growth
    val r1Queries = Set(
      "q_sql_pricing", "q_tokenizer", "q_regex_tokenizer", "q_ngram", "q_binarizer",
      "q_bucketizer", "q_standard_scaler", "q_minmax_scaler", "q_maxabs_scaler",
      "q_robust_scaler", "q_imputer", "q_string_indexer", "q_onehot",
      "q_count_vectorizer", "q_idf", "q_kbins_uniform", "q_variance_selector",
      "q_vector_functions", "q_kmeans", "q_logreg_predict", "q_linreg_predict",
      "q_linsvc_predict", "q_logreg_train", "q_naive_bayes", "q_knn")
    val coreTotal = results.collect { case (k, v) if r1Queries(k) => v }.sum
    val failedJson = failed.map("\"" + _ + "\"").mkString("[", ",", "]")
    val line =
      s"""{"metric":"total","value":$total,"unit":"sec","core_r1_total":$coreTotal,"num_queries":${results.size},"queries":$qs,"sf":"$sfDir","failed":$failedJson}"""
    spark.stop()
    // print after spark.stop() so no executor/log line can interleave;
    // ALSO write to a file — sbt prefixes stdout with "[info]", which
    // broke the driver's machine-parse of BENCH_r03 ("parsed": null)
    println(line)
    System.out.flush()
    java.nio.file.Files.writeString(java.nio.file.Paths.get("bench_out.json"), line + "\n")
  }
}
