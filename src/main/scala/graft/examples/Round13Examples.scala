package graft.examples

import org.apache.spark.sql.functions._

/**
 * Round-13 batch: video perceptual dedup, transitive Hamming
 * clustering, the incremental perceptual-hash index, and
 * stopword-composed keyword extraction.
 */

/** Catch re-encoded / re-graded / frame-rate-converted copies of the
  * same clip: the signature is the dHash of the first/mid/last frame
  * by position fraction, so frame duplication and per-frame recolor
  * move zero bits, and the banded join never compares all pairs. */
object VideoDedupExample {
  def main(args: Array[String]): Unit = {
    val spark = ExampleSession.spark("VideoDedupExample")
    import spark.implicits._
    import graft.multimodal.VideoDHasher
    val videos = Seq(
      (0L, VideoDHasher.syntheticCellVideo(1L)),                   // original
      (1L, VideoDHasher.syntheticCellVideo(1L, brightness = 40)),  // re-graded copy
      (2L, VideoDHasher.syntheticCellVideo(1L, stretch = 2)),      // frame-rate converted
      (3L, VideoDHasher.syntheticCellVideo(2L))                    // unrelated clip
    ).toDF("clip_id", "video")
    val hasher = new VideoDHasher().setInputCol("video").setOutputCol("sig")
    val hashed = hasher.transform(videos).head
    hasher.similarityJoin(hashed, "clip_id", maxHamming = 3, numBands = 4)
      .orderBy("id_a", "id_b").show(false) // (0,1), (0,2), (1,2) — never 3
    spark.stop()
  }
}

/** Hamming CHAINS break single-hop clustering: b sits within range of
  * both a and c, but a and c are too far apart — clusterWithRep gives
  * c a non-canonical id, clusterComponents closes the chain through
  * connected components. */
object HammingChainExample {
  def main(args: Array[String]): Unit = {
    val spark = ExampleSession.spark("HammingChainExample")
    import spark.implicits._
    import graft.dedup.HammingJoin
    val fps = Seq(
      (0L, 0x00L),          // a
      (1L, 0x07L),          // b: 3 bits from a
      (2L, 0x3fL),          // c: 3 bits from b, 6 from a
      (9L, 0x5555aaaaL)     // unrelated
    ).toDF("id", "fp")
    println("single-hop (clusterWithRep): c points at b, not the root")
    HammingJoin.clusterWithRep(fps, "id", "fp", maxHamming = 3, numBands = 4)
      .orderBy("id").show(false)
    println("transitive (clusterComponents): one canonical cluster")
    HammingJoin.clusterComponents(fps, "id", "fp", maxHamming = 3, numBands = 4)
      .orderBy("id").show(false)
    spark.stop()
  }
}

/** Index today's corpus fingerprints once, flag tomorrow's batch
  * against it, grow the index batch-over-batch — perceptual hashes get
  * the same incremental workflow MinHashIndexer gives text. */
object IncrementalImageDedupExample {
  def main(args: Array[String]): Unit = {
    val spark = ExampleSession.spark("IncrementalImageDedupExample")
    import spark.implicits._
    import graft.dedup.HammingIndexer
    import graft.multimodal.ImageDHasher
    val hasher = new ImageDHasher().setInputCol("img").setOutputCol("fp")
    val corpus = hasher.transform(Seq(
      (0L, ImageDHasher.syntheticCellImage(1L)),
      (1L, ImageDHasher.syntheticCellImage(2L))).toDF("id", "img")).head
    val model = new HammingIndexer().setMaxHamming(3).fit(corpus)
    val batch1 = hasher.transform(Seq(
      (10L, ImageDHasher.syntheticCellImage(3L))).toDF("id", "img")).head
    model.transform(batch1).head.select("id", "matched_id", "is_duplicate").show() // novel
    val grown = model.addToIndex(batch1)
    val batch2 = hasher.transform(Seq(
      (20L, ImageDHasher.syntheticCellImage(3L, brightness = 40)), // recolor of 10
      (21L, ImageDHasher.syntheticCellImage(1L, flip = true))      // near-dup of 0
    ).toDF("id", "img")).head
    grown.transform(batch2).head.select("id", "matched_id", "is_duplicate").show()
    spark.stop()
  }
}

/** TextRank on real corpora is stopword-dominated; filter with
  * StopWordsRemover BEFORE extraction (the operator deliberately does
  * not hide a tokenizer policy). */
object FilteredKeywordsExample {
  def main(args: Array[String]): Unit = {
    val spark = ExampleSession.spark("FilteredKeywordsExample")
    import spark.implicits._
    val docs = Seq(
      "the spark engine joins the table with a hash join",
      "a hash join beats a sort merge join on the small table",
      "the engine scans the table and builds a hash"
    ).toDF("text")
      .withColumn("toks", split(trim(col("text")), "\\s+"))
    val kept = new graft.feature.StopWordsRemover()
      .setInputCols("toks").setOutputCols("kept")
      .setStopWords(Array("the", "a", "and", "with", "on"))
      .transform(docs).head
      .withColumn("kept_text", concat_ws(" ", col("kept")))
    new graft.text.KeywordExtractor()
      .setInputCol("kept_text").setNumIter(10).setTopK(5)
      .transform(kept).head.show(false)
    spark.stop()
  }
}
