package graft.benchmark

import org.apache.spark.sql.SparkSession

/**
 * Reference-workload benchmarks over generated data, reproducing the
 * flink-ml-benchmark configurations (BASELINE.md):
 *   kmeans      — train k=10, maxIter=10 on 1,000,000 × dim-100, seed 2
 *                 (kmeans-benchmark.json)
 *   standardscaler — fit on 10,000,000 × dim-100 (standardscaler-benchmark.json)
 *   minmaxscaler   — fit on 10,000,000 × dim-100
 *   tokenizer      — 10,000,000 sentences over 100 distinct tokens
 *
 * Prints one JSON line per workload with the reference's metric names
 * (totalTimeMs, inputRecordNum, inputThroughput).
 *
 * Usage: runMain graft.benchmark.BenchGen [scale] [workload...]
 * `scale` multiplies the row counts (default 1.0 = full reference size).
 */
object BenchGen {
  def main(args: Array[String]): Unit = {
    val scale = args.headOption.map(_.toDouble).getOrElse(1.0)
    val workloads = if (args.length > 1) args.drop(1).toSet
      else Set("kmeans", "standardscaler", "minmaxscaler", "tokenizer")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val parts = cpus.toInt

    def report(name: String, n: Long)(body: => Unit): Unit = {
      val t0 = System.nanoTime()
      body
      val ms = (System.nanoTime() - t0) / 1e6
      // Locale.ROOT so a comma-decimal default locale can't corrupt the JSON
      def fmt(v: Double) = String.format(java.util.Locale.ROOT, "%.1f", Double.box(v))
      println(s"""{"stage":"$name","inputRecordNum":$n,"totalTimeMs":${fmt(ms)},"inputThroughput":${fmt(n * 1000.0 / ms)}}""")
      System.out.flush()
    }

    if (workloads("kmeans")) {
      val n = (1000000 * scale).toLong
      val data = DataGenerators.denseVectors(spark, n, 100, seed = 2L, numPartitions = parts)
        .withColumnRenamed("vec", "features")
      report("KMeans", n) {
        new graft.clustering.KMeans().setK(10).setMaxIter(10).setSeed(2L)
          .fit(data).getModelData.head.write.format("noop").mode("overwrite").save()
      }
    }
    if (workloads("standardscaler")) {
      val n = (10000000 * scale).toLong
      val data = DataGenerators.denseVectors(spark, n, 100, seed = 2L, numPartitions = parts)
        .withColumnRenamed("vec", "features")
      report("StandardScaler", n) {
        new graft.feature.StandardScaler().setInputCol("features")
          .fit(data).getModelData.head.write.format("noop").mode("overwrite").save()
      }
    }
    if (workloads("minmaxscaler")) {
      val n = (10000000 * scale).toLong
      val data = DataGenerators.denseVectors(spark, n, 100, seed = 2L, numPartitions = parts)
        .withColumnRenamed("vec", "features")
      report("MinMaxScaler", n) {
        new graft.feature.MinMaxScaler().setInputCol("features")
          .fit(data).getModelData.head.write.format("noop").mode("overwrite").save()
      }
    }
    if (workloads("tokenizer")) {
      val n = (10000000 * scale).toLong
      val data = DataGenerators.randomSentences(spark, n, 100, 10, seed = 2L, numPartitions = parts)
      report("Tokenizer", n) {
        new graft.feature.Tokenizer().setInputCol("text").setOutputCol("tokens")
          .transform(data).head.write.format("noop").mode("overwrite").save()
      }
    }
    spark.stop()
  }
}
