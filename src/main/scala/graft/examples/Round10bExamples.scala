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

/** Change log → SCD2 validity intervals → point-in-time features via
  * a BETWEEN join: the leakage-free feature-store pattern. */
object Scd2Example {
  def main(args: Array[String]): Unit = {
    val spark = ExampleSession.spark("Scd2Example")
    import spark.implicits._
    val changes = Seq(
      ("u1", 10L, "bronze"), ("u1", 25L, "silver"), ("u1", 25L + 15L, "gold"),
      ("u2", 12L, "silver")).toDF("user", "ts", "tier")
    val hist = new graft.join.Scd2Builder()
      .setKeyCols("user").setOrderCol("ts").transform(changes).head
    hist.orderBy("user", "valid_from").show(false)
    val events = Seq(("u1", 30L), ("u2", 11L)).toDF("user", "event_ts")
    events.join(hist, Seq("user"), "left")
      .where(col("event_ts") >= col("valid_from") &&
        (col("valid_to").isNull || col("event_ts") < col("valid_to")))
      .select("user", "event_ts", "tier").show(false)
    spark.stop()
  }
}

/** Link records across two tables despite typos: edit-distance join
  * with exact recall via the q-gram prefix filter. */
object FuzzyJoinExample {
  def main(args: Array[String]): Unit = {
    val spark = ExampleSession.spark("FuzzyJoinExample")
    import spark.implicits._
    val crm = Seq((1L, "Jonathan Smith"), (2L, "Acme Corporation"), (3L, "Zelda's Bakery"))
      .toDF("id", "name")
    val billing = Seq((10L, "Jonathon Smith"), (11L, "Acme Corp"), (12L, "Zeldas Bakery"))
      .toDF("id", "name")
    new graft.join.FuzzyJoiner().setIdCol("id").setInputCol("name")
      .setMaxDistance(2).setGramLength(2)
      .transform(crm, billing).head.orderBy("left_id").show(false)
    spark.stop()
  }
}

/** Strip boilerplate repeated INSIDE one document (corpus-level dedup
  * never sees it) and profile the result table in one pass. */
object IntraDocAndProfileExample {
  def main(args: Array[String]): Unit = {
    val spark = ExampleSession.spark("IntraDocAndProfileExample")
    import spark.implicits._
    val docs = Seq(
      (1L, "Subscribe to our newsletter!\nReal content here.\nSubscribe to our newsletter!"),
      (2L, "Only body text, nothing repeated."))
      .toDF("doc_id", "text")
    val deduped = new graft.text.IntraDocDeduplicator()
      .setInputCol("text").setOutputCol("clean").transform(docs).head
    deduped.select("doc_id", "clean_text", "clean_removed").show(false)
    new graft.stats.ColumnProfiler()
      .setInputCols("doc_id", "clean_text").setExactDistinct(true)
      .transform(deduped).head.show(false)
    spark.stop()
  }
}

/** Decompose crawl URLs and flag blocklisted domains. */
object UrlParserExample {
  def main(args: Array[String]): Unit = {
    val spark = ExampleSession.spark("UrlParserExample")
    import spark.implicits._
    val urls = Seq(
      (1L, "https://user@blog.example.com:8443/posts/42?utm=x#c"),
      (2L, "http://tracker.adsite.biz/pixel.gif"),
      (3L, "https://docs.example.com/guide")).toDF("id", "url")
    new graft.text.UrlParser().setInputCol("url").setOutputCol("u")
      .setBlockedDomains("adsite.biz")
      .transform(urls).head
      .select("id", "u_scheme", "u_host", "u_domain", "u_path", "u_blocked")
      .show(false)
    spark.stop()
  }
}

/** Prequential anomaly flags: the 500-spend event stands out from the
  * user's whole history — scored before it joins that history. */
object StreamingAnomalyExample {
  def main(args: Array[String]): Unit = {
    val spark = ExampleSession.spark("StreamingAnomalyExample")
    import spark.implicits._
    val events = ((1 to 30).map(t => ("u1", t.toLong, 10.0 + (t % 5))) :+
      (("u1", 31L, 500.0))).toDF("user", "t", "spend")
    new graft.streaming.StreamingAnomalyDetector()
      .setKeyCol("user").setOrderCol("t").setInputCol("spend")
      .setMinCount(10).setThreshold(3.0)
      .transform(events).head
      .where(org.apache.spark.sql.functions.col("anomaly")).show(false)
    spark.stop()
  }
}

/** Gate a table on a declarative quality suite; inspect what failed. */
object DataValidatorExample {
  def main(args: Array[String]): Unit = {
    val spark = ExampleSession.spark("DataValidatorExample")
    import spark.implicits._
    val batch = Seq(
      (1L, Some(12.0), "AIR"), (2L, Some(990.0), "SHIP"),
      (2L, None, "TELEPORT")).toDF("id", "qty", "mode")
    val suite = new graft.stats.DataValidator()
      .addNotNull("qty").addInRange("qty", 0, 100)
      .addInSet("mode", "AIR", "SHIP", "TRUCK").addUnique("id")
    suite.transform(batch).head.show(false)
    println(s"gate=${suite.validate(batch)}")
    spark.stop()
  }
}

/** Is the scorer's 0.9 actually a 90%? Reliability curve + Brier/ECE
  * for a deliberately over-confident scorer. */
object CalibrationExample {
  def main(args: Array[String]): Unit = {
    val spark = ExampleSession.spark("CalibrationExample")
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    // model predicts p but the true event rate is p^2 — over-confident
    val scored = (0 until 2000).map { _ =>
      val p = rnd.nextDouble()
      (p, if (rnd.nextDouble() < p * p) 1.0 else 0.0)
    }.toDF("p", "y")
    val eval = new graft.evaluation.CalibrationEvaluator()
      .setPredictionCol("p").setLabelCol("y").setNumBins(10)
    eval.transform(scored).head.orderBy("bin").show(false)
    val s = eval.summary(scored)
    println(f"brier=${s.brier}%.4f ece=${s.ece}%.4f")
    spark.stop()
  }
}

/** "Sample 200 docs proportional to quality": weight-proportional
  * selection that replays identically on any cluster size. */
object WeightedSamplerExample {
  def main(args: Array[String]): Unit = {
    val spark = ExampleSession.spark("WeightedSamplerExample")
    import org.apache.spark.sql.functions._
    val docs = ExampleData.table(spark, "documents")
      .withColumn("quality", length(col("text")).cast("double"))
    val sample = new graft.feature.WeightedSampler()
      .setIdCol("doc_id").setWeightCol("quality")
      .setSampleSize(200).setSeed(7L)
      .transform(docs).head
    println(s"sampled ${sample.count()} docs; mean quality " +
      f"${sample.agg(avg("quality")).head.getDouble(0)}%.1f vs corpus " +
      f"${docs.agg(avg("quality")).head.getDouble(0)}%.1f")
    spark.stop()
  }
}

/** Which features are redundant? One scan over lineitem gives every
  * pairwise Pearson correlation. */
object CorrelationMatrixExample {
  def main(args: Array[String]): Unit = {
    val spark = ExampleSession.spark("CorrelationMatrixExample")
    val li = spark.read.parquet(ExampleData.dir + "/lineitem.parquet")
    new graft.stats.CorrelationMatrix()
      .setInputCols("l_quantity", "l_extendedprice", "l_discount", "l_tax")
      .transform(li).head
      .orderBy("col_a", "col_b").show(false)
    spark.stop()
  }
}

/** The over-confident scorer from CalibrationExample, FIXED: fit an
  * isotonic map on held-out data and compare ECE before/after. */
object IsotonicCalibratorExample {
  def main(args: Array[String]): Unit = {
    val spark = ExampleSession.spark("IsotonicCalibratorExample")
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    def draw() = { val p = rnd.nextDouble(); (p, if (rnd.nextDouble() < p * p) 1.0 else 0.0) }
    val heldOut = (0 until 4000).map(_ => draw()).toDF("p", "y")
    val test = (0 until 4000).map(_ => draw()).toDF("p", "y")
    val model = new graft.regression.IsotonicCalibrator()
      .setPredictionCol("p").setLabelCol("y")
      // continuous scores: bucket to bound the knot table
      .fit(heldOut.withColumn("p", round($"p", 2)))
    val calibrated = model.transform(test).head
    val eval = new graft.evaluation.CalibrationEvaluator().setLabelCol("y")
    val before = eval.setPredictionCol("p").summary(test)
    val after = eval.setPredictionCol("calibrated").summary(calibrated)
    println(f"ECE before=${before.ece}%.4f after=${after.ece}%.4f")
    spark.stop()
  }
}

/** Same customer, three typo'd spellings: fuzzy-match, close
  * transitively, and stamp every row with its canonical record id. */
object EntityResolverExample {
  def main(args: Array[String]): Unit = {
    val spark = ExampleSession.spark("EntityResolverExample")
    import spark.implicits._
    val crm = Seq(
      (1L, "john smith"), (2L, "jonh smith"), (3L, "john smiht"),
      (4L, "mary jones"), (5L, "marie jones"), (6L, "bob wilson"))
      .toDF("id", "customer")
    val resolved = new graft.dedup.EntityResolver()
      .setIdCol("id").setInputCol("customer").setMaxDistance(2)
      .transform(crm).head
    resolved.orderBy("id").show(false)
    // 1,2,3 -> entity 1 (distance-2 star around "john smith");
    // 4,5 -> entity 4; 6 stays its own entity
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
