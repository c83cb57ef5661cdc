package graft.examples

import org.apache.spark.ml.functions.vector_to_array
import org.apache.spark.sql.functions._

/**
 * Per-stage runnable examples for the feature / stats / evaluation
 * surface (the remainder of the reference's flink-ml-examples set).
 * Each reads the generated sf0.001 parquet tables via [[ExampleData]]
 * — the same I/O shape as a cluster job — applies one stage, and
 * shows a few rows. Run with e.g.
 *
 *   sbt "runMain graft.examples.BinarizerExample"
 */
object BinarizerExample {
  def main(args: Array[String]): Unit = {
    val spark = ExampleSession.spark("BinarizerExample")
    new graft.feature.Binarizer()
      .setInputCols("l_discount").setOutputCols("high_discount").setThresholds(0.05)
      .transform(ExampleData.table(spark, "lineitem")).head
      .select("l_discount", "high_discount").show(5, false)
    spark.stop()
  }
}

object BucketizerExample {
  def main(args: Array[String]): Unit = {
    val spark = ExampleSession.spark("BucketizerExample")
    new graft.feature.Bucketizer()
      .setInputCols("l_quantity").setOutputCols("qty_bucket")
      .setSplitsArray(Array(Array(0.0, 10.0, 20.0, 30.0, 40.0, 51.0)))
      .setHandleInvalid("keep")
      .transform(ExampleData.table(spark, "lineitem")).head
      .groupBy("qty_bucket").count().orderBy("qty_bucket").show(false)
    spark.stop()
  }
}

object CountVectorizerIdfExample {
  def main(args: Array[String]): Unit = {
    val spark = ExampleSession.spark("CountVectorizerIdfExample")
    val toks = new graft.feature.RegexTokenizer()
      .setInputCol("text").setOutputCol("tokens").setPattern("\\W+")
      .transform(ExampleData.table(spark, "documents")).head
    val cv = new graft.feature.CountVectorizer()
      .setVocabularySize(50).setInputCol("tokens").setOutputCol("tf").fit(toks)
    val tf = cv.transform(toks).head
    val idf = new graft.feature.IDF().setInputCol("tf").setOutputCol("tfidf").fit(tf)
    idf.transform(tf).head.select("doc_id", "tfidf").show(3, false)
    spark.stop()
  }
}

object ImputerExample {
  def main(args: Array[String]): Unit = {
    val spark = ExampleSession.spark("ImputerExample")
    val withNulls = new graft.feature.SQLTransformer().setStatement(
      "SELECT o_orderkey, CASE WHEN o_totalprice < 50000 THEN NULL ELSE o_totalprice END AS price FROM __THIS__")
      .transform(ExampleData.table(spark, "orders")).head
    new graft.feature.Imputer()
      .setInputCols("price").setOutputCols("price_filled")
      .fit(withNulls).transform(withNulls).head
      .where(col("price").isNull).select("o_orderkey", "price_filled").show(5, false)
    spark.stop()
  }
}

object OneHotEncoderExample {
  def main(args: Array[String]): Unit = {
    val spark = ExampleSession.spark("OneHotEncoderExample")
    val nat = ExampleData.table(spark, "nation")
      .select(col("n_nationkey"), col("n_regionkey").cast("double").as("rk"))
    new graft.feature.OneHotEncoder()
      .setInputCols("rk").setOutputCols("hot").fit(nat)
      .transform(nat).head.show(5, false)
    spark.stop()
  }
}

object PolynomialExpansionExample {
  def main(args: Array[String]): Unit = {
    val spark = ExampleSession.spark("PolynomialExpansionExample")
    val assembled = new graft.feature.VectorAssembler()
      .setInputCols("l_discount", "l_tax").setOutputCol("features").setInputSizes(1, 1)
      .transform(ExampleData.table(spark, "lineitem")).head
    new graft.feature.PolynomialExpansion()
      .setInputCol("features").setOutputCol("poly").setDegree(2)
      .transform(assembled).head.select("features", "poly").show(3, false)
    spark.stop()
  }
}

object StopWordsRemoverExample {
  def main(args: Array[String]): Unit = {
    val spark = ExampleSession.spark("StopWordsRemoverExample")
    val toks = new graft.feature.RegexTokenizer()
      .setInputCol("text").setOutputCol("tokens").setPattern("\\W+")
      .transform(ExampleData.table(spark, "documents")).head
    new graft.feature.StopWordsRemover()
      .setInputCols("tokens").setOutputCols("filtered")
      .transform(toks).head
      .select(size(col("tokens")).as("before"), size(col("filtered")).as("after"))
      .show(5, false)
    spark.stop()
  }
}

object StringIndexerExample {
  def main(args: Array[String]): Unit = {
    val spark = ExampleSession.spark("StringIndexerExample")
    val cust = ExampleData.table(spark, "customer")
    val model = new graft.feature.StringIndexer()
      .setInputCols("c_mktsegment").setOutputCols("seg_idx")
      .setStringOrderType("frequencyDesc").fit(cust)
    val indexed = model.transform(cust).head
    // IndexToString round-trips the encoding
    val restored = new graft.feature.IndexToStringModel()
      .setInputCols("seg_idx").setOutputCols("seg_restored")
      .setModelData(model.getModelData.head)
      .transform(indexed).head
    restored.select("c_mktsegment", "seg_idx", "seg_restored").distinct().show(false)
    spark.stop()
  }
}

object ChiSqTestExample {
  def main(args: Array[String]): Unit = {
    val spark = ExampleSession.spark("ChiSqTestExample")
    val li = ExampleData.table(spark, "lineitem")
      .withColumn("label", (col("l_returnflag") === "R").cast("double"))
    val assembled = new graft.feature.VectorAssembler()
      .setInputCols("l_linenumber", "l_quantity").setOutputCol("features")
      .setInputSizes(1, 1)
      .transform(li).head
    new graft.stats.ChiSqTest().setFlatten(true).transform(assembled).head.show(false)
    spark.stop()
  }
}

object BinaryClassificationEvaluatorExample {
  def main(args: Array[String]): Unit = {
    val spark = ExampleSession.spark("BinaryClassificationEvaluatorExample")
    val scored = ExampleData.table(spark, "lineitem")
      .withColumn("label", (col("l_returnflag") === "R").cast("double"))
      .withColumn("score", col("l_extendedprice"))
    new graft.evaluation.BinaryClassificationEvaluator()
      .setMetricsNames("areaUnderROC", "areaUnderPR", "ks")
      .setRawPredictionCol("score")
      .transform(scored).head.show(false)
    spark.stop()
  }
}

object LinearSVCExample {
  def main(args: Array[String]): Unit = {
    val spark = ExampleSession.spark("LinearSVCExample")
    val li = ExampleData.table(spark, "lineitem")
      .withColumn("label", (col("l_quantity") > 25).cast("double"))
    val assembled = new graft.feature.VectorAssembler()
      .setInputCols("l_quantity", "l_discount").setOutputCol("features")
      .setInputSizes(1, 1)
      .transform(li).head
    val model = new graft.classification.LinearSVC()
      .setMaxIter(20).setLearningRate(0.01).setGlobalBatchSize(500)
      .fit(assembled)
    model.transform(assembled).head
      .groupBy("label", "prediction").count().orderBy("label", "prediction").show(false)
    spark.stop()
  }
}

object InteractionExample {
  def main(args: Array[String]): Unit = {
    val spark = ExampleSession.spark("InteractionExample")
    val li = ExampleData.table(spark, "lineitem")
    val a1 = new graft.feature.VectorAssembler()
      .setInputCols("l_quantity", "l_discount").setOutputCol("v1")
      .setInputSizes(1, 1).transform(li).head
    val a2 = new graft.feature.VectorAssembler()
      .setInputCols("l_tax").setOutputCol("v2").setInputSizes(1)
      .transform(a1).head
    new graft.feature.Interaction()
      .setInputCols("v1", "v2").setOutputCol("inter")
      .transform(a2).head.select("v1", "v2", "inter").show(3, false)
    spark.stop()
  }
}

object ElementwiseProductExample {
  def main(args: Array[String]): Unit = {
    val spark = ExampleSession.spark("ElementwiseProductExample")
    val assembled = new graft.feature.VectorAssembler()
      .setInputCols("l_quantity", "l_extendedprice").setOutputCol("features")
      .setInputSizes(1, 1)
      .transform(ExampleData.table(spark, "lineitem")).head
    new graft.feature.ElementwiseProduct()
      .setScalingVec(org.apache.spark.ml.linalg.Vectors.dense(0.5, 0.01))
      .setInputCol("features").setOutputCol("prod")
      .transform(assembled).head.select("features", "prod").show(3, false)
    spark.stop()
  }
}

object VectorSlicerExample {
  def main(args: Array[String]): Unit = {
    val spark = ExampleSession.spark("VectorSlicerExample")
    val assembled = new graft.feature.VectorAssembler()
      .setInputCols("l_quantity", "l_discount", "l_tax").setOutputCol("features")
      .setInputSizes(1, 1, 1)
      .transform(ExampleData.table(spark, "lineitem")).head
    new graft.feature.VectorSlicer()
      .setIndices(2, 0).setInputCol("features").setOutputCol("sliced")
      .transform(assembled).head.select("features", "sliced").show(3, false)
    spark.stop()
  }
}

object FeatureHasherExample {
  def main(args: Array[String]): Unit = {
    val spark = ExampleSession.spark("FeatureHasherExample")
    new graft.feature.FeatureHasher()
      .setNumFeatures(1 << 10).setInputCols("n_name", "n_regionkey").setOutputCol("vec")
      .transform(ExampleData.table(spark, "nation")).head
      .select("n_name", "vec").show(5, false)
    spark.stop()
  }
}

object KBinsDiscretizerExample {
  def main(args: Array[String]): Unit = {
    val spark = ExampleSession.spark("KBinsDiscretizerExample")
    val assembled = new graft.feature.VectorAssembler()
      .setInputCols("l_extendedprice").setOutputCol("features").setInputSizes(1)
      .transform(ExampleData.table(spark, "lineitem")).head
    val model = new graft.feature.KBinsDiscretizer()
      .setStrategy("quantile").setNumBins(5)
      .setInputCol("features").setOutputCol("bins").fit(assembled)
    model.transform(assembled).head
      .select(vector_to_array(col("bins")).getItem(0).as("bin"))
      .groupBy("bin").count().orderBy("bin").show(false)
    spark.stop()
  }
}

object UnivariateFeatureSelectorExample {
  def main(args: Array[String]): Unit = {
    val spark = ExampleSession.spark("UnivariateFeatureSelectorExample")
    val li = ExampleData.table(spark, "lineitem")
      .withColumn("label", col("l_extendedprice"))
    val assembled = new graft.feature.VectorAssembler()
      .setInputCols("l_quantity", "l_discount", "l_tax", "l_linenumber")
      .setOutputCol("features").setInputSizes(1, 1, 1, 1)
      .transform(li).head
    val model = new graft.feature.UnivariateFeatureSelector()
      .setFeatureType("continuous").setLabelType("continuous")
      .setSelectionMode("numTopFeatures").setSelectionThreshold(2)
      .fit(assembled)
    println("selected feature indices:")
    model.getModelData.head.show(false)
    spark.stop()
  }
}

object VarianceThresholdSelectorExample {
  def main(args: Array[String]): Unit = {
    val spark = ExampleSession.spark("VarianceThresholdSelectorExample")
    val assembled = new graft.feature.VectorAssembler()
      .setInputCols("l_quantity", "l_discount", "l_tax").setOutputCol("features")
      .setInputSizes(1, 1, 1)
      .transform(ExampleData.table(spark, "lineitem")).head
    val model = new graft.feature.VarianceThresholdSelector()
      .setVarianceThreshold(1.0).setInputCol("features").fit(assembled)
    println("kept dimensions (variance > 1.0):")
    model.getModelData.head.show(false)
    spark.stop()
  }
}

object NGramExample {
  def main(args: Array[String]): Unit = {
    val spark = ExampleSession.spark("NGramExample")
    val toks = new graft.feature.RegexTokenizer()
      .setInputCol("text").setOutputCol("tokens").setPattern("\\W+")
      .transform(ExampleData.table(spark, "documents")).head
    new graft.feature.NGram()
      .setInputCol("tokens").setOutputCol("grams").setN(2)
      .transform(toks).head.select("doc_id", "grams").show(3, false)
    spark.stop()
  }
}

object NormalizerExample {
  def main(args: Array[String]): Unit = {
    val spark = ExampleSession.spark("NormalizerExample")
    val assembled = new graft.feature.VectorAssembler()
      .setInputCols("l_quantity", "l_discount", "l_tax").setOutputCol("features")
      .setInputSizes(1, 1, 1)
      .transform(ExampleData.table(spark, "lineitem")).head
    new graft.feature.Normalizer()
      .setInputCol("features").setOutputCol("norm").setP(2.0)
      .transform(assembled).head.select("features", "norm").show(3, false)
    spark.stop()
  }
}

object DCTExample {
  def main(args: Array[String]): Unit = {
    val spark = ExampleSession.spark("DCTExample")
    val assembled = new graft.feature.VectorAssembler()
      .setInputCols("l_quantity", "l_discount", "l_tax").setOutputCol("features")
      .setInputSizes(1, 1, 1)
      .transform(ExampleData.table(spark, "lineitem")).head
    new graft.feature.DCT()
      .setInputCol("features").setOutputCol("dct")
      .transform(assembled).head.select("features", "dct").show(3, false)
    spark.stop()
  }
}
