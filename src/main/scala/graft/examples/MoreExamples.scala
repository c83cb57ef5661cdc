package graft.examples

import org.apache.spark.sql.functions._

/**
 * Remaining per-stage runnable examples: scalers, tokenizers,
 * splitters, the other two statistical tests, agglomerative
 * clustering, online FTRL logistic regression (including the
 * versioned delay-gated scoring path), and the data-pipeline
 * sampling/mixing operators. Same pattern as [[FeatureExamples]]:
 * sf0.001 parquet in, a few rows shown, `runMain`-able.
 */
object TokenizerExample {
  def main(args: Array[String]): Unit = {
    val spark = ExampleSession.spark("TokenizerExample")
    new graft.feature.Tokenizer()
      .setInputCol("text").setOutputCol("tokens")
      .transform(ExampleData.table(spark, "documents")).head
      .select("doc_id", "tokens").show(3, false)
    spark.stop()
  }
}

object SQLTransformerExample {
  def main(args: Array[String]): Unit = {
    val spark = ExampleSession.spark("SQLTransformerExample")
    new graft.feature.SQLTransformer()
      .setStatement(
        "SELECT l_returnflag, COUNT(*) AS n, ROUND(SUM(l_extendedprice), 2) AS revenue " +
          "FROM __THIS__ GROUP BY l_returnflag")
      .transform(ExampleData.table(spark, "lineitem")).head
      .orderBy("l_returnflag").show(false)
    spark.stop()
  }
}

object HashingTFExample {
  def main(args: Array[String]): Unit = {
    val spark = ExampleSession.spark("HashingTFExample")
    val toks = new graft.feature.RegexTokenizer()
      .setInputCol("text").setOutputCol("tokens").setPattern("\\W+")
      .transform(ExampleData.table(spark, "documents")).head
    new graft.feature.HashingTF()
      .setNumFeatures(1 << 12).setInputCol("tokens").setOutputCol("tf")
      .transform(toks).head.select("doc_id", "tf").show(3, false)
    spark.stop()
  }
}

object MinMaxScalerExample {
  def main(args: Array[String]): Unit = {
    val spark = ExampleSession.spark("MinMaxScalerExample")
    val assembled = new graft.feature.VectorAssembler()
      .setInputCols("l_quantity", "l_extendedprice").setOutputCol("features")
      .setInputSizes(1, 1)
      .transform(ExampleData.table(spark, "lineitem")).head
    new graft.feature.MinMaxScaler()
      .setInputCol("features").setOutputCol("scaled")
      .fit(assembled).transform(assembled).head
      .select("features", "scaled").show(3, false)
    spark.stop()
  }
}

object MaxAbsScalerExample {
  def main(args: Array[String]): Unit = {
    val spark = ExampleSession.spark("MaxAbsScalerExample")
    val assembled = new graft.feature.VectorAssembler()
      .setInputCols("l_discount").setOutputCol("features").setInputSizes(1)
      .transform(ExampleData.table(spark, "lineitem")).head
    new graft.feature.MaxAbsScaler()
      .setInputCol("features").setOutputCol("scaled")
      .fit(assembled).transform(assembled).head
      .select("features", "scaled").show(3, false)
    spark.stop()
  }
}

object RobustScalerExample {
  def main(args: Array[String]): Unit = {
    val spark = ExampleSession.spark("RobustScalerExample")
    val assembled = new graft.feature.VectorAssembler()
      .setInputCols("l_extendedprice").setOutputCol("features").setInputSizes(1)
      .transform(ExampleData.table(spark, "lineitem")).head
    new graft.feature.RobustScaler()
      .setInputCol("features").setOutputCol("scaled")
      .fit(assembled).transform(assembled).head
      .select("features", "scaled").show(3, false)
    spark.stop()
  }
}

object VectorIndexerExample {
  def main(args: Array[String]): Unit = {
    val spark = ExampleSession.spark("VectorIndexerExample")
    val assembled = new graft.feature.VectorAssembler()
      .setInputCols("l_linenumber", "l_extendedprice").setOutputCol("features")
      .setInputSizes(1, 1)
      .transform(ExampleData.table(spark, "lineitem")).head
    // l_linenumber (7 distinct) becomes categorical; price stays continuous
    new graft.feature.VectorIndexer()
      .setMaxCategories(10).setInputCol("features").setOutputCol("indexed")
      .fit(assembled).transform(assembled).head
      .select("features", "indexed").show(3, false)
    spark.stop()
  }
}

object RandomSplitterExample {
  def main(args: Array[String]): Unit = {
    val spark = ExampleSession.spark("RandomSplitterExample")
    val splits = new graft.feature.RandomSplitter()
      .setWeights(0.8, 0.2).setSeed(42L)
      .transform(ExampleData.table(spark, "orders"))
    println(s"train=${splits(0).count()} test=${splits(1).count()}")
    spark.stop()
  }
}

object AnovaFValueExample {
  def main(args: Array[String]): Unit = {
    val spark = ExampleSession.spark("AnovaFValueExample")
    val li = ExampleData.table(spark, "lineitem")
      .withColumn("label", (col("l_returnflag") === "R").cast("double"))
    val assembled = new graft.feature.VectorAssembler()
      .setInputCols("l_quantity", "l_discount").setOutputCol("features")
      .setInputSizes(1, 1)
      .transform(li).head
    println("ANOVA (categorical label, continuous features):")
    new graft.stats.ANOVATest().setFlatten(true).transform(assembled).head.show(false)
    println("F-value (continuous label regression test):")
    val cont = assembled.withColumn("label", col("l_extendedprice"))
    new graft.stats.FValueTest().setFlatten(true).transform(cont).head.show(false)
    spark.stop()
  }
}

object AgglomerativeClusteringExample {
  def main(args: Array[String]): Unit = {
    val spark = ExampleSession.spark("AgglomerativeClusteringExample")
    val assembled = new graft.feature.VectorAssembler()
      .setInputCols("s_acctbal").setOutputCol("features").setInputSizes(1)
      .transform(ExampleData.table(spark, "supplier")).head
    new graft.clustering.AgglomerativeClustering()
      .setLinkage("single").setDistanceThreshold(400.0)
      .transform(assembled).head
      .groupBy("prediction").count().orderBy("prediction").show(5, false)
    spark.stop()
  }
}

object OnlineLogisticRegressionExample {
  def main(args: Array[String]): Unit = {
    val spark = ExampleSession.spark("OnlineLogisticRegressionExample")
    val ev = ExampleData.eventsTsm(spark)
      .select(col("event_id"), col("tsm"),
        (col("value") / 100.0).as("x"),
        (col("event_type") === "click").cast("double").as("label"))
      .orderBy("event_id")
    val assembled = new graft.feature.VectorAssembler()
      .setInputCols("x").setOutputCol("features").setInputSizes(1)
      .transform(ev).head
    val model = new graft.streaming.OnlineLogisticRegression()
      .setAlpha(0.1).setBeta(1.0).setReg(0.0).setElasticNet(0.0)
      .setGlobalBatchSize(250).setTimeCol("tsm")
      .setInitialModelData(graft.streaming.OnlineLogisticRegressionModel.zeroInit(spark, 1))
      .fit(assembled)
    println("FTRL model version stream (one per mini-batch):")
    model.getModelData.head.orderBy("version").show(5, false)
    println("delay-gated scoring: each row uses the earliest fresh-enough version")
    // output column defaults to "modelVersion" (reference model params)
    model.setMaxAllowedModelDelayMs(7L * 24 * 3600 * 1000).setTimeCol("tsm")
      .transform(assembled).head
      .select("event_id", "modelVersion", "prediction").show(5, false)
    spark.stop()
  }
}

object StratifiedSamplerExample {
  def main(args: Array[String]): Unit = {
    val spark = ExampleSession.spark("StratifiedSamplerExample")
    val sampled = new graft.feature.StratifiedSampler()
      .setIdCol("doc_id").setSeed(7L).setFraction(0.5)
      .transform(ExampleData.table(spark, "documents")).head
    sampled.groupBy("lang").count().orderBy("lang").show(false)
    spark.stop()
  }
}

object GroupedSplitterExample {
  def main(args: Array[String]): Unit = {
    val spark = ExampleSession.spark("GroupedSplitterExample")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true") // legal scan on nanos-era testdata
    // leakage-free: every row of one user lands on the same side
    val splits = new graft.feature.GroupedSplitter()
      .setGroupCols("user_id").setWeights(0.8, 0.2).setSeed(11L)
      .transform(ExampleData.table(spark, "events")
        .select("event_id", "user_id"))
    println(s"train=${splits(0).count()} test=${splits(1).count()}")
    val leak = splits(0).select("user_id").intersect(splits(1).select("user_id")).count()
    println(s"users on both sides: $leak")
    spark.stop()
  }
}

object BpeExample {
  def main(args: Array[String]): Unit = {
    val spark = ExampleSession.spark("BpeExample")
    val docs = ExampleData.table(spark, "documents")
    val trainer = new graft.text.BpeTrainer()
      .setInputCol("text").setOutputCol("bpe").setNumMerges(50)
    val model = trainer.fit(docs)
    println("first learned merges:")
    model.getModelData.head.orderBy("rank").show(10, false)
    model.transform(docs).head.select("doc_id", "bpe_count").show(3, false)
    spark.stop()
  }
}
