package graft.examples

import org.apache.spark.ml.linalg.Vectors
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/**
 * Runnable examples (the analog of the reference's flink-ml-examples
 * module): each object is a self-contained main that builds a tiny
 * inline dataset, runs one stage or composition, and prints the
 * result. Run with e.g.
 *
 *   sbt "runMain graft.examples.KMeansExample"
 *
 * Every example uses the same API surface a cluster job would —
 * swap the inline Seq for spark.read.parquet(...) and the code is
 * production-shaped.
 */
private[examples] object ExampleSession {
  def spark(name: String): SparkSession = {
    val s = SparkSession.builder()
      .master(sys.env.getOrElse("SPARK_MASTER", "local[4]"))
      .appName(name)
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}

/** Train k-means and assign clusters (reference KMeansExample.java). */
object KMeansExample {
  def main(args: Array[String]): Unit = {
    val spark = ExampleSession.spark("KMeansExample")
    import spark.implicits._
    val points = Seq(
      Vectors.dense(0.0, 0.0), Vectors.dense(0.3, 0.3), Vectors.dense(0.1, 0.1),
      Vectors.dense(9.0, 0.0), Vectors.dense(9.6, 0.0), Vectors.dense(9.2, 0.2))
      .map(Tuple1(_)).toDF("features")
    val model = new graft.clustering.KMeans().setK(2).setSeed(42L).fit(points)
    model.transform(points).head.show(false)
    spark.stop()
  }
}

/** Fit + apply logistic regression (reference LogisticRegressionExample.java). */
object LogisticRegressionExample {
  def main(args: Array[String]): Unit = {
    val spark = ExampleSession.spark("LogisticRegressionExample")
    import spark.implicits._
    val train = Seq(
      (Vectors.dense(1.0, 2.0), 0.0), (Vectors.dense(2.0, 3.0), 0.0),
      (Vectors.dense(3.0, 4.0), 0.0), (Vectors.dense(10.0, 2.0), 1.0),
      (Vectors.dense(12.0, 3.0), 1.0), (Vectors.dense(11.0, 4.0), 1.0))
      .toDF("features", "label")
    val model = new graft.classification.LogisticRegression()
      .setMaxIter(50).setLearningRate(0.1).setGlobalBatchSize(6)
      .fit(train)
    model.transform(train).head.select("features", "label", "prediction").show(false)
    spark.stop()
  }
}

/** StandardScaler fit/transform (reference StandardScalerExample.java). */
object StandardScalerExample {
  def main(args: Array[String]): Unit = {
    val spark = ExampleSession.spark("StandardScalerExample")
    import spark.implicits._
    val data = Seq(Vectors.dense(-2.5, 9.0, 1.0), Vectors.dense(1.4, -5.0, 1.0),
      Vectors.dense(2.0, -1.0, -2.0)).map(Tuple1(_)).toDF("input")
    val model = new graft.feature.StandardScaler().setInputCol("input").fit(data)
    model.transform(data).head.show(false)
    spark.stop()
  }
}

/** Chain stages with Pipeline and save/load (reference builder API). */
object PipelineExample {
  def main(args: Array[String]): Unit = {
    val spark = ExampleSession.spark("PipelineExample")
    import spark.implicits._
    val df = Seq((1.0, 2.0, 0.0), (2.0, 3.0, 0.0), (11.0, 2.0, 1.0), (12.0, 3.0, 1.0))
      .toDF("a", "b", "label")
    val pipeline = new graft.api.Pipeline(Seq(
      new graft.feature.VectorAssembler()
        .setInputCols("a", "b").setOutputCol("features").setInputSizes(1, 1),
      new graft.feature.StandardScaler().setInputCol("features").setOutputCol("scaled"),
      new graft.classification.LogisticRegression()
        .setFeaturesCol("scaled").setMaxIter(30).setGlobalBatchSize(4)))
    val model = pipeline.fit(df)
    val dir = java.nio.file.Files.createTempDirectory("pipeline-example").toString
    model.save(dir)
    val restored = graft.api.PipelineModel.load(spark, dir)
    restored.transform(df).head.select("a", "b", "label", "prediction").show(false)
    spark.stop()
  }
}

/** Near-duplicate detection: tokenize → shingle → term vectors →
  * MinHash-LSH banded join → connected components. */
object MinHashDedupExample {
  def main(args: Array[String]): Unit = {
    val spark = ExampleSession.spark("MinHashDedupExample")
    import spark.implicits._
    val docs = Seq(
      (0L, "the quick brown fox jumps over the lazy dog at dawn"),
      (1L, "the quick brown fox jumped over the lazy dog at dawn"),
      (2L, "an entirely different sentence about spark sql plans today"))
      .toDF("doc_id", "text")
    val toks = new graft.feature.RegexTokenizer()
      .setInputCol("text").setOutputCol("tokens").setPattern("\\W+")
      .transform(docs).head
    val grams = new graft.feature.NGram()
      .setInputCol("tokens").setOutputCol("shingles").setN(3)
      .transform(toks).head.where(size(col("shingles")) > 0)
    val cv = new graft.feature.CountVectorizer()
      .setInputCol("shingles").setOutputCol("tf").fit(grams)
    val vecs = cv.transform(grams).head.select("doc_id", "tf")
    val flagged = new graft.dedup.MinHashDeduplicator()
      .setIdCol("doc_id").setInputCol("tf")
      .setSeed(7L).setNumHashTables(8).setThreshold(0.5)
      .transform(vecs).head
    flagged.select("doc_id", "canonical_id", "is_duplicate").orderBy("doc_id").show(false)
    spark.stop()
  }
}

/** Streaming training: OnlineKMeans over a rate-source stream. */
object OnlineKMeansExample {
  def main(args: Array[String]): Unit = {
    val spark = ExampleSession.spark("OnlineKMeansExample")
    import spark.implicits._
    val init = Seq((0, Vectors.dense(0.0)), (1, Vectors.dense(50.0)))
      .toDF("centroidId", "centroid").withColumn("weight", lit(1.0))
    val stream = spark.readStream.format("rate").option("rowsPerSecond", 100).load()
      .select(org.apache.spark.ml.functions.array_to_vector(
        array((col("value") % 100).cast("double"))).as("features"))
    val handle = graft.streaming.StreamingTrainer.attach[graft.streaming.OnlineKMeansModel](
      stream,
      new graft.streaming.OnlineKMeansModel().setDecayFactor(0.5).setModelData(init),
      (m, b) => m.update(b, "features"))
    handle.query.awaitTermination(5000)
    handle.query.stop()
    println("centroids after 5s of stream:")
    handle.latest().getModelData.head.show(false)
    spark.stop()
  }
}

/** Leakage-free feature attachment with the as-of join. */
object AsOfJoinExample {
  def main(args: Array[String]): Unit = {
    val spark = ExampleSession.spark("AsOfJoinExample")
    import spark.implicits._
    val events = Seq((1L, 1000L, "click"), (1L, 5000L, "buy"), (2L, 2000L, "click"))
      .toDF("user", "ts", "action")
    val features = Seq((1L, 900L, 0.2), (1L, 4000L, 0.9), (2L, 2500L, 0.5))
      .toDF("user", "ts", "score")
    val joined = new graft.join.AsOfJoiner()
      .setOnCols("user").setValueCols("score").setToleranceMs(3000L)
      .transform(events, features).head
    joined.orderBy("user", "ts").show(false)
    spark.stop()
  }
}

/** Non-linear DAG with GraphBuilder: one input feeds an assembler,
  * whose output trains a scaler AND flows (scaled) into k-means;
  * built once as an Estimator, reusable as a fitted GraphModel. */
object GraphExample {
  def main(args: Array[String]): Unit = {
    val spark = ExampleSession.spark("GraphExample")
    import spark.implicits._
    val df = Seq((0.0, 0.1), (0.2, 0.0), (9.0, 9.2), (9.1, 8.8)).toDF("x", "y")

    val builder = new graft.api.GraphBuilder().setMaxOutputTableNum(1)
    val input = builder.createTableId()
    val assembled = builder.addAlgoOperator(
      new graft.feature.VectorAssembler()
        .setInputCols("x", "y").setOutputCol("raw").setInputSizes(1, 1), input)
    val scaled = builder.addEstimator(
      new graft.feature.MinMaxScaler().setInputCol("raw").setOutputCol("features"),
      assembled: _*)
    val clustered = builder.addEstimator(
      new graft.clustering.KMeans().setK(2).setSeed(7L), scaled: _*)
    val graph = builder.buildEstimator(Seq(input), clustered)

    val model = graph.fit(df)
    model.transform(df).head.select("x", "y", "prediction").show(false)
    spark.stop()
  }
}

/** Spark-free online inference: fit on the cluster, export the model
  * data as JSON, score single rows in-process with a servable. */
object ServableExample {
  def main(args: Array[String]): Unit = {
    val spark = ExampleSession.spark("ServableExample")
    import spark.implicits._
    // centered classes: the model has no intercept term
    val train = Seq(
      (Vectors.dense(-2.0, -1.0), 0.0), (Vectors.dense(-1.0, -2.0), 0.0),
      (Vectors.dense(2.0, 1.0), 1.0), (Vectors.dense(1.0, 2.0), 1.0))
      .toDF("features", "label")
    val model = new graft.classification.LogisticRegression()
      .setMaxIter(60).setLearningRate(0.5).setGlobalBatchSize(4).fit(train)

    val buf = new java.io.ByteArrayOutputStream()
    graft.servable.ServableExport.exportLinearModel(model.getModelData.head, buf)
    spark.stop() // everything below runs without any SparkSession

    val servable = new graft.servable.LogisticRegressionModelServable()
      .setModelData(new java.io.ByteArrayInputStream(buf.toByteArray))
    val local = graft.servable.LocalDataFrame(
      Seq("features"), Seq(Seq(Array(-1.5, -1.5)), Seq(Array(1.5, 1.5))))
    val scored = servable.transform(local)
    println(s"predictions: ${scored.column("prediction")}") // List(0.0, 1.0)
  }
}

/** Shared accessor for the generated test tables: the examples below
  * run against real parquet, as a cluster job would. */
private[examples] object ExampleData {
  def dir: String = sys.env.getOrElse("GRAFT_SF_DIR", "/root/testdata/sf0.001")
  def table(spark: SparkSession, name: String) =
    spark.read.parquet(s"$dir/$name.parquet")

  /** events with a `tsm` epoch-ms column, robust to the generated ts
    * shipping as either TIMESTAMP(NANOS) (legacy raw-long read) or
    * TIMESTAMP(MICROS)/TimestampNTZ across testdata rounds. */
  def eventsTsm(spark: SparkSession): org.apache.spark.sql.DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val ev = table(spark, "events")
    val tsm = ev.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType => expr("ts div 1000000")
      case _ => unix_millis(col("ts").cast("timestamp"))
    }
    ev.withColumn("tsm", tsm)
  }
}

/** Swing item-to-item recommendation over co-purchases
  * (reference SwingExample.java). */
object SwingExample {
  def main(args: Array[String]): Unit = {
    val spark = ExampleSession.spark("SwingExample")
    val li = ExampleData.table(spark, "lineitem")
    val ord = ExampleData.table(spark, "orders")
    val behavior = li.join(ord, li("l_orderkey") === ord("o_orderkey"))
      .select(col("o_custkey").as("user"), col("l_partkey").as("item"))
    val out = new graft.recommendation.Swing()
      .setK(5).setMinUserBehavior(2)
      .transform(behavior).head
    out.orderBy("item").show(10, false)
    spark.stop()
  }
}

/** Gaussian-free multinomial NaiveBayes train + score
  * (reference NaiveBayesExample.java). */
object NaiveBayesExample {
  def main(args: Array[String]): Unit = {
    val spark = ExampleSession.spark("NaiveBayesExample")
    val li = ExampleData.table(spark, "lineitem")
      .withColumn("label", (col("l_returnflag") === "R").cast("double"))
    val assembled = new graft.feature.VectorAssembler()
      .setInputCols("l_linenumber", "l_tax").setOutputCol("features")
      .setInputSizes(1, 1)
      .transform(li).head
    val model = new graft.classification.NaiveBayes().fit(assembled)
    model.transform(assembled).head
      .groupBy("label", "prediction").count().orderBy("label", "prediction")
      .show(false)
    spark.stop()
  }
}

/** Linear regression on order totals (reference LinearRegressionExample.java). */
object LinearRegressionExample {
  def main(args: Array[String]): Unit = {
    val spark = ExampleSession.spark("LinearRegressionExample")
    val li = ExampleData.table(spark, "lineitem")
    val assembled = new graft.feature.VectorAssembler()
      .setInputCols("l_quantity", "l_discount").setOutputCol("features")
      .setInputSizes(1, 1)
      .transform(li).head
      .withColumn("label", col("l_extendedprice"))
    val model = new graft.regression.LinearRegression()
      .setMaxIter(30).setLearningRate(0.01).setGlobalBatchSize(1000)
      .fit(assembled)
    model.transform(assembled).head
      .select("l_quantity", "l_discount", "label", "prediction").show(5, false)
    spark.stop()
  }
}

/** K-nearest-neighbor classification over the embeddings table
  * (reference KnnExample.java). */
object KnnExample {
  def main(args: Array[String]): Unit = {
    val spark = ExampleSession.spark("KnnExample")
    val emb = ExampleData.table(spark, "embeddings")
      .select(org.apache.spark.ml.functions.array_to_vector(
        col("embedding").cast("array<double>")).as("features"),
        col("label").cast("double").as("label"), col("vec_id"))
    val train = emb.where(col("vec_id") % 10 =!= 0)
    val test = emb.where(col("vec_id") % 10 === 0)
    val model = new graft.classification.Knn().setK(5).fit(train)
    model.transform(test).head.select("vec_id", "label", "prediction").show(10, false)
    spark.stop()
  }
}

/** OnlineStandardScaler with event-time windows and delay-gated
  * versioned scoring (reference OnlineStandardScalerExample.java). */
object OnlineStandardScalerExample {
  def main(args: Array[String]): Unit = {
    val spark = ExampleSession.spark("OnlineStandardScalerExample")
    val ev = ExampleData.eventsTsm(spark).select(col("tsm"), col("value"))
    val assembled = new graft.feature.VectorAssembler()
      .setInputCols("value").setOutputCol("features").setInputSizes(1)
      .transform(ev).head
    val model = new graft.streaming.OnlineStandardScaler()
      .setInputCol("features").setTimeCol("tsm")
      .setWindows(graft.streaming.EventTimeTumblingWindows(24L * 3600 * 1000))
      .fit(assembled)
      .setOutputCol("scaled")
      .setMaxAllowedModelDelayMs(24L * 3600 * 1000)
    println("model versions (one per day window):")
    model.getModelData.head.orderBy("version").show(5, false)
    println("each row scored by the earliest fresh-enough version:")
    model.transform(assembled).head
      .select("tsm", "value", "version", "scaled").show(5, false)
    spark.stop()
  }
}

/** End-to-end LLM-corpus curation: dedup → quality filter → pack. */
object CorpusCurationExample {
  def main(args: Array[String]): Unit = {
    val spark = ExampleSession.spark("CorpusCurationExample")
    import spark.implicits._
    val docs = Seq(
      (0L, "spark structured streaming makes continuous applications easy to build"),
      (1L, "spark structured streaming makes continuous applications easy to build"),
      (2L, "a short doc"),
      (3L, "catalyst optimizes logical plans into efficient physical execution"))
      .toDF("doc_id", "text")
    val deduped = new graft.text.ExactDeduplicator()
      .setIdCol("doc_id").setInputCol("text").transform(docs).head
      .where(!col("is_exact_duplicate"))
    val scored = new graft.text.TextQualityScorer().setInputCol("text")
      .transform(deduped).head
      .where(col("n_tokens") >= 5)
    val packed = new graft.text.SequencePacker()
      .setInputCol("text").setIdCol("doc_id").setGroupCol("grp").setTokenBudget(16)
      .transform(scored.withColumn("grp", lit("all"))
        .select("doc_id", "text", "grp")).head
    packed.show(false)
    spark.stop()
  }
}
