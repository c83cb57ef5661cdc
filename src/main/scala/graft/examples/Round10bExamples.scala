package graft.examples

import org.apache.spark.sql.functions._

/**
 * Second round-10 batch: silhouette evaluation, categorical
 * encoders, lag/rolling featurization, and HTML extraction.
 */

/** Score a KMeans clustering with the squared-Euclidean silhouette —
  * the fit-evaluate loop every unsupervised pipeline needs. */
object SilhouetteExample {
  def main(args: Array[String]): Unit = {
    val spark = ExampleSession.spark("SilhouetteExample")
    import spark.implicits._
    val pts = Seq(
      (0.0, 0.1), (0.2, 0.0), (0.1, 0.2),
      (5.0, 5.1), (5.2, 5.0), (5.1, 4.9),
      (9.0, 0.0), (9.1, 0.2)).toDF("x", "y")
      .select(array(col("x"), col("y")).as("f"))
    val assembled = pts.select(
      org.apache.spark.ml.functions.array_to_vector(col("f")).as("features"), col("f"))
    val model = new graft.clustering.KMeans().setK(3).setSeed(1L).fit(assembled)
    val clustered = model.transform(assembled).head
    val eval = new graft.evaluation.ClusteringEvaluator()
      .setFeaturesCol("f").setPredictionCol("prediction")
    eval.transform(clustered).head.orderBy("cluster").show(false)
    println(s"overall=${eval.summary(clustered).silhouette}")
    spark.stop()
  }
}

/** Encode a high-cardinality categorical two ways: training-frequency
  * and smoothed target mean — one numeric column each, where one-hot
  * would explode. */
object CategoricalEncodersExample {
  def main(args: Array[String]): Unit = {
    val spark = ExampleSession.spark("CategoricalEncodersExample")
    import spark.implicits._
    val train = Seq(
      ("sports", 120.0), ("sports", 80.0), ("sports", 100.0),
      ("news", 40.0), ("niche", 900.0)).toDF("topic", "engagement")
    val fe = new graft.feature.FrequencyEncoder()
      .setInputCol("topic").setOutputCol("topic_freq").fit(train)
    val te = new graft.feature.TargetEncoder()
      .setInputCol("topic").setOutputCol("topic_enc")
      .setLabelCol("engagement").setSmoothing(2.0).fit(train)
    val scoring = Seq("sports", "niche", "brand-new").toDF("topic")
    te.transform(fe.transform(scoring).head).head.show(false)
    spark.stop()
  }
}

/** Turn an event log into leakage-safe training rows: lags, gap
  * deltas, and rolling stats over only the PAST. */
object LagFeaturizerExample {
  def main(args: Array[String]): Unit = {
    val spark = ExampleSession.spark("LagFeaturizerExample")
    import spark.implicits._
    val events = Seq(
      ("u1", 1L, 3.0), ("u1", 5L, 4.5), ("u1", 6L, 90.0), ("u1", 9L, 5.0),
      ("u2", 2L, 7.0), ("u2", 4L, 7.5)).toDF("user", "t", "spend")
    new graft.feature.LagFeaturizer()
      .setInputCol("spend").setPartitionCols("user").setOrderCols("t")
      .setNumLags(2).setRollingWindow(3)
      .transform(events).head.orderBy("user", "t").show(false)
    spark.stop()
  }
}

/** Extract title, visible text, and link counts from raw HTML — the
  * crawl-payload step in front of C4/Gopher/dedup. */
object HtmlExtractorExample {
  def main(args: Array[String]): Unit = {
    val spark = ExampleSession.spark("HtmlExtractorExample")
    import spark.implicits._
    val pages = Seq(
      (1L, "<html><head><title>Spark at scale</title></head><body>" +
        "<p>Content &amp; more.</p><a href=\"/a\">a</a><a href=\"/b\">b</a></body></html>"),
      (2L, "<body><script>tracking();</script><p>Just a paragraph.</p></body>"))
      .toDF("doc_id", "html")
    new graft.text.HtmlExtractor().setInputCol("html").setOutputCol("page")
      .transform(pages).head
      .select("doc_id", "page_title", "page_text", "page_links").show(false)
    spark.stop()
  }
}
