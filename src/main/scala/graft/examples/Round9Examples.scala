package graft.examples

import org.apache.spark.ml.linalg.Vectors
import org.apache.spark.sql.functions._

/**
 * Round-9 capability examples: SemDeDup-style semantic dedup, the
 * int8-quantized IVF index, and versioned delay-gated OnlineKMeans
 * inference.
 */

/** Semantic dedup (SemDeDup, Abbas et al. 2023): cluster embeddings,
  * then within each cluster keep only the min-id member of every
  * cosine-similar pair. Composition of KMeansModel + the codegen
  * cosineSimilarity function — see q_semantic_dedup for the oracle
  * version. */
object SemanticDedupExample {
  def main(args: Array[String]): Unit = {
    val spark = ExampleSession.spark("SemanticDedupExample")
    import spark.implicits._
    // two semantic neighborhoods; 101 and 103 are near-dups of 100/102
    val vecs = Seq(
      (100L, Array(1.0, 0.0, 0.1)), (101L, Array(0.99, 0.01, 0.1)),
      (102L, Array(0.9, 0.1, 0.0)), (103L, Array(0.91, 0.09, 0.01)),
      (200L, Array(0.0, 1.0, 0.2)), (201L, Array(0.1, 0.9, 0.3)))
      .toDF("vec_id", "arr")
    graft.functions.Functions.register(spark)
    val init = Seq((0, Vectors.dense(1.0, 0.0, 0.0)), (1, Vectors.dense(0.0, 1.0, 0.0)))
      .toDF("centroidId", "centroid")
    val assigned = new graft.clustering.KMeansModel()
      .setFeaturesCol("vec").setModelData(init)
      .transform(vecs.withColumn("vec",
        org.apache.spark.ml.functions.array_to_vector(col("arr")))).head
      .select(col("vec_id"), col("prediction").as("cluster"), col("arr"))
    val dups = assigned.select(col("cluster"), col("vec_id").as("id_a"), col("arr").as("arr_a"))
      .join(assigned.select(col("cluster"), col("vec_id").as("id_b"), col("arr").as("arr_b")),
        Seq("cluster"))
      .where(col("id_a") < col("id_b"))
      .where(graft.functions.Functions.cosineSimilarity(col("arr_a"), col("arr_b")) >= 0.98)
      .select(col("id_b").as("vec_id")).distinct().withColumn("dup", lit(true))
    assigned.select("vec_id", "cluster")
      .join(dups, Seq("vec_id"), "left")
      .select(col("vec_id"), col("cluster"),
        coalesce(col("dup"), lit(false)).as("is_semantic_duplicate"))
      .orderBy("vec_id").show(false)
    spark.stop()
  }
}

/** IVF + int8 scalar quantization (FAISS IVF+SQ8): the inverted lists
  * store 1-byte codes (4x less storage/shuffle than float32); probes
  * score the full-precision query against the dequantized list vector. */
object IvfQuantizedExample {
  def main(args: Array[String]): Unit = {
    val spark = ExampleSession.spark("IvfQuantizedExample")
    import spark.implicits._
    val rnd = new scala.util.Random(5)
    val corpus = (0L until 200L).map { id =>
      val c = (id % 2).toInt
      (id, Vectors.dense(Array.tabulate(8)(i =>
        (if (i == c * 4) 5.0 else 0.0) + rnd.nextGaussian() * 0.3)))
    }.toDF("id", "vec")
    val model = new graft.ann.IvfIndexer()
      .setIdCol("id").setVecCol("vec")
      .setNumLists(2).setTrainIters(5).setSeed(7L)
      .setQuantize(true) // int8 lists; probe = asymmetric distance
      .fit(corpus)
    val queries = Seq((1000L, Vectors.dense(5.0, 0.1, 0.0, 0.1, 0.0, 0.0, 0.1, 0.0)))
      .toDF("id", "vec")
    model.setK(3).setNprobe(1).transform(queries).head.show(false)
    spark.stop()
  }
}

/** Streaming drift monitoring: DriftDetector compared per micro-batch
  * against a fixed reference window from foreachBatch — the
  * retrain-alarm loop (PSI > 0.25 is the conventional threshold) a
  * continuously-fed training pipeline runs between every ingest window
  * and its training snapshot. */
object DriftMonitorExample {
  def main(args: Array[String]): Unit = {
    val spark = ExampleSession.spark("DriftMonitorExample")
    import spark.implicits._
    val reference = (0 until 500).map(i => (i % 100).toDouble).toDF("x")
    val det = new graft.stats.DriftDetector().setFeatureCols("x").setNumBins(10)
    val alarms = new java.util.concurrent.CopyOnWriteArrayList[(Long, Double)]()
    val stream = spark.readStream.format("rate").option("rowsPerSecond", 500).load()
      // values drift upward over time relative to the uniform reference
      .select(((col("value") % 100) + col("value") / 10).cast("double").as("x"))
    val q = stream.writeStream.outputMode("append")
      .foreachBatch { (b: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], id: Long) =>
        if (!b.isEmpty) {
          val psi = det.transform(reference, b).head.select("psi").head().getDouble(0)
          alarms.add((id, psi)); ()
        }
      }.start()
    q.awaitTermination(6000)
    q.stop()
    import scala.jdk.CollectionConverters._
    alarms.asScala.foreach { case (id, psi) =>
      println(f"batch $id: psi $psi%.4f ${if (psi > 0.25) "DRIFT ALARM" else "ok"}")
    }
    spark.stop()
  }
}

/** The Gopher quality rules (Rae et al. 2021): the published hard-rule
  * bundle with per-rule pass flags — the practical shape for tuning a
  * corpus filter (which rule fires, not just that one did). */
object GopherFilterExample {
  def main(args: Array[String]): Unit = {
    val spark = ExampleSession.spark("GopherFilterExample")
    import spark.implicits._
    val docs = Seq(
      (0L, "the model trains on data that we have curated with care and effort over time"),
      (1L, "short doc"),
      (2L, "- item one of the list\n- item two of the list\n- item three of the list"))
      .toDF("doc_id", "text")
    new graft.text.GopherFilter().setInputCol("text").setMinWords(10)
      .transform(docs).head
      .select("doc_id", "rule_word_count", "rule_bullet_lines", "rule_stopwords", "gopher_keep")
      .orderBy("doc_id").show(false)
    spark.stop()
  }
}

/** DSIR data selection (Xie et al. 2023): score raw documents by the
  * log-likelihood ratio under a target-domain LM vs the raw-corpus LM;
  * keep the top scorers to build a target-like pretraining mix. */
object DsirExample {
  def main(args: Array[String]): Unit = {
    val spark = ExampleSession.spark("DsirExample")
    import spark.implicits._
    val raw = Seq(
      (0L, "the model trains on curated text data"),
      (1L, "la red se entrena con datos curados"),
      (2L, "the data pipeline filters the text corpus"),
      (3L, "der korpus wird gefiltert und sortiert"))
      .toDF("id", "text")
    val target = Seq(
      (100L, "the corpus holds curated text"),
      (101L, "the pipeline filters training data"))
      .toDF("id", "text")
    val scored = new graft.text.ImportanceScorer()
      .setInputCol("text").setOutputCol("dsir_score").setIdCol("id")
      .transform(raw, target).head
    // top-N selection compiles to TakeOrdered — no global sort at scale
    scored.orderBy(org.apache.spark.sql.functions.col("dsir_score").desc)
      .limit(2).select("id", "text", "dsir_score").show(false)
    spark.stop()
  }
}

/** Versioned OnlineKMeans: each mini-batch becomes a stamped model
  * version; inference under maxAllowedModelDelayMs scores every row by
  * the earliest version fresh enough for its own event time (reference
  * OnlineKMeansModel's model-data version counter). */
object VersionedOnlineKMeansExample {
  def main(args: Array[String]): Unit = {
    val spark = ExampleSession.spark("VersionedOnlineKMeansExample")
    import spark.implicits._
    val init = Seq((0, Vectors.dense(0.0), 1.0), (1, Vectors.dense(10.0), 1.0))
      .toDF("centroidId", "centroid", "weight")
    var model = new graft.streaming.OnlineKMeansModel()
      .setDecayFactor(0.5).setModelData(init)
    def batch(xs: Double*) = xs.toSeq.toDF("x")
      .select(org.apache.spark.ml.functions.array_to_vector(array(col("x"))).as("features"))
    model = model.update(batch(1.0, 9.0), "features", 1000L) // version 1 @ t=1000
    model = model.update(batch(2.0, 8.0), "features", 2000L) // version 2 @ t=2000
    val probes = Seq((1L, 500L, 1.0), (2L, 1500L, 9.0), (3L, 99999L, 1.0))
      .toDF("id", "ts", "x")
      .select(col("id"), col("ts"),
        org.apache.spark.ml.functions.array_to_vector(array(col("x"))).as("features"))
    model.setMaxAllowedModelDelayMs(0L).setTimeCol("ts")
      .transform(probes).head
      .select("id", "ts", "modelVersion", "prediction").orderBy("id").show(false)
    spark.stop()
  }
}
