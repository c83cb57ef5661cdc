package graft.examples

import org.apache.spark.sql.functions._

/**
 * Round-12 batch: perceptual multimodal dedup (image dHash, audio
 * energy-envelope hash) and skew-proof quantile z-ordering.
 */

/** Catch re-encoded / recolored copies of the same image that byte
  * hashing cannot see: dHash is invariant to brightness shifts and
  * lossless re-encodes, and the banded Hamming join never compares
  * all pairs. */
object ImageDedupExample {
  def main(args: Array[String]): Unit = {
    val spark = ExampleSession.spark("ImageDedupExample")
    import spark.implicits._
    import graft.multimodal.ImageDHasher
    val images = Seq(
      (0L, ImageDHasher.syntheticCellImage(1L)),                    // original
      (1L, ImageDHasher.syntheticCellImage(1L, brightness = 40)),   // recolored copy
      (2L, ImageDHasher.syntheticCellImage(1L, format = "bmp")),    // re-encoded copy
      (3L, ImageDHasher.syntheticCellImage(2L))                     // unrelated image
    ).toDF("img_id", "img")
    val hasher = new ImageDHasher().setInputCol("img").setOutputCol("dhash")
    val hashed = hasher.transform(images).head
    hashed.select("img_id", "dhash").show(false)
    hasher.similarityJoin(hashed, "img_id", maxHamming = 3, numBands = 4)
      .orderBy("id_a", "id_b").show(false) // (0,1), (0,2), (1,2) — never 3
    spark.stop()
  }
}

/** Catch re-mastered copies of the same recording: the envelope hash
  * is invariant to gain changes and time-stretch, so a louder or
  * slower re-encode of the same audio dedups against the original. */
object AudioDedupExample {
  def main(args: Array[String]): Unit = {
    val spark = ExampleSession.spark("AudioDedupExample")
    import spark.implicits._
    import graft.multimodal.AudioDHasher
    val wavs = Seq(
      (0L, AudioDHasher.syntheticWindowWav(1L)),               // original
      (1L, AudioDHasher.syntheticWindowWav(1L, gain = 2)),     // louder copy
      (2L, AudioDHasher.syntheticWindowWav(1L, stretch = 2)),  // stretched copy
      (3L, AudioDHasher.syntheticWindowWav(9L))                // unrelated track
    ).toDF("track_id", "wav")
    val hasher = new AudioDHasher().setInputCol("wav").setOutputCol("ahash")
    val hashed = hasher.transform(wavs).head
    hasher.similarityJoin(hashed, "track_id", maxHamming = 3, numBands = 4)
      .orderBy("id_a", "id_b").show(false)
    spark.stop()
  }
}

/** Z-order a table whose key is heavily skewed: linear (equi-width)
  * bucketing collapses the dense region into one bucket and range
  * predicates there stop pruning; quantile (equi-depth) bucketing
  * keeps every bucket at ~equal row mass, no pre-transform needed. */
object QuantileZOrderExample {
  def main(args: Array[String]): Unit = {
    val spark = ExampleSession.spark("QuantileZOrderExample")
    import graft.sources.ZOrderWriter
    // log-uniform "latency_ms"-like column: most mass near the origin
    val df = spark.range(0, 50000).select(
      exp(pmod(xxhash64(col("id")), lit(1000L)) / 1000.0 * 10.0).as("latency_ms"),
      (pmod(xxhash64(col("id"), lit(2)), lit(1000L)) / 1.0).as("bytes"),
      col("id"))
    val lin = ZOrderWriter.withZValue(df, Seq("latency_ms", "bytes"), bits = 6)
      .groupBy("__z").count()
    val qnt = ZOrderWriter.withZValue(df, Seq("latency_ms", "bytes"), bits = 6,
      strategy = "quantile").groupBy("__z").count()
    println(s"distinct z-values — linear: ${lin.count()}, quantile: ${qnt.count()}")
    println(s"largest z-bucket — linear: ${lin.agg(max("count")).head.getLong(0)}, " +
      s"quantile: ${qnt.agg(max("count")).head.getLong(0)}")
    spark.stop()
  }
}
