package graft.multimodal

import graft.SparkSpec

class MultimodalSpec extends SparkSpec {

  test("BinaryDecodeStub emits fixed-schema metadata for binary payloads") {
    import spark.implicits._
    val df = Seq((1L, "hello world"), (2L, "")).toDF("id", "s")
      .select(org.apache.spark.sql.functions.col("id"),
        org.apache.spark.sql.functions.col("s").cast("binary").as("payload"))
    val out = new BinaryDecodeStub().setInputCol("payload").setOutputCol("meta")
      .transform(df).head
    val schema = out.schema("meta").dataType.asInstanceOf[org.apache.spark.sql.types.StructType]
    assert(schema.fieldNames.toSeq == Seq("n_bytes", "digest", "header"))
    val r = out.where(org.apache.spark.sql.functions.col("id") === 1L)
      .select("meta.n_bytes", "meta.digest", "meta.header").head()
    assert(r.getLong(0) == 11L)
    assert(r.getString(1) == "5eb63bbbe01eeed093cb22bb8f5acdc3") // md5("hello world")
    assert(r.getString(2).equalsIgnoreCase("68656C6C")) // "hell"
  }

  test("ImageDecoder recovers dimensions from real PNG bytes; non-images decode to null") {
    import spark.implicits._
    val png = ImageDecoder.syntheticPng(17, 9, seed = 5L)
    val df = Seq((1L, png), (2L, "not an image".getBytes("UTF-8")), (3L, null))
      .toDF("id", "img")
    val out = new ImageDecoder().setInputCol("img").setOutputCol("meta")
      .transform(df).head
      .select("id", "meta.width", "meta.height", "meta.format")
      .orderBy("id").collect()
    assert(out(0).getInt(1) == 17 && out(0).getInt(2) == 9 && out(0).getString(3) == "png", out(0))
    assert(out(1).isNullAt(1) && out(2).isNullAt(1))
  }

  test("FrameSampler chunks payloads and keeps every n-th frame") {
    import spark.implicits._
    val payload = ("a" * 10) + ("b" * 10) + ("c" * 10) + ("d" * 5)
    val df = Seq((1L, payload)).toDF("id", "s")
      .select(org.apache.spark.sql.functions.col("id"),
        org.apache.spark.sql.functions.col("s").cast("binary").as("payload"))
    val all = new FrameSampler().setFrameBytes(10).setEveryNth(1)
      .setInputCol("payload").setOutputCol("frames").transform(df).head
      .select("frames").head().getSeq[String](0)
    assert(all.length == 4) // 10+10+10+5 bytes → 4 chunks
    val sampled = new FrameSampler().setFrameBytes(10).setEveryNth(2)
      .setInputCol("payload").setOutputCol("frames").transform(df).head
      .select("frames").head().getSeq[String](0)
    assert(sampled.length == 2) // chunks 0 and 2
    assert(sampled(0) == all(0) && sampled(1) == all(2))
  }

  test("AudioDecoder recovers WAV header fields; non-WAV decodes to null") {
    import spark.implicits._
    val wav = AudioDecoder.syntheticWav(sampleRate = 16000, numSamples = 8000,
      channels = 2, seed = 3L)
    val df = Seq((1L, wav), (2L, "RIFFnot a wav".getBytes("UTF-8")), (3L, null))
      .toDF("id", "audio")
    val out = new AudioDecoder().setInputCol("audio").setOutputCol("meta")
      .transform(df).head
      .select("id", "meta.channels", "meta.sample_rate", "meta.bits_per_sample",
        "meta.n_samples", "meta.duration_sec")
      .collect().map(r => r.getLong(0) -> r).toMap
    val r = out(1L)
    assert(r.getInt(1) == 2 && r.getInt(2) == 16000 && r.getInt(3) == 16)
    assert(r.getLong(4) == 8000L)
    assert(math.abs(r.getDouble(5) - 0.5) < 1e-12) // 8000 samples @ 16 kHz
    assert(out(2L).isNullAt(1) && out(3L).isNullAt(1))
  }

  test("AudioDecoder skips unknown RIFF chunks (word-aligned walk)") {
    // a LIST chunk with an ODD size before fmt/data exercises the
    // +1 padding rule of the RIFF walk
    val base = AudioDecoder.syntheticWav(8000, 100, 1, 1L)
    val extra = java.nio.ByteBuffer.allocate(base.length + 8 + 5 + 1)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    extra.put(base, 0, 12)                        // RIFF....WAVE
    extra.put("LIST".getBytes("US-ASCII")).putInt(5)
      .put("INFOx".getBytes("US-ASCII")).put(0.toByte) // odd size + pad
    extra.put(base, 12, base.length - 12)
    val parsed = AudioDecoder.parseWav(extra.array())
    assert(parsed.exists(m => m.sample_rate == 8000 && m.n_samples == 100L))
  }

  test("VideoDecoder recovers MP4 header fields; non-MP4 decodes to null") {
    import spark.implicits._
    val mp4 = VideoDecoder.syntheticMp4(timescale = 600, duration = 9000L,
      numTracks = 2, brand = "mp42")
    val df = Seq((1L, mp4), (2L, "plainly not a video".getBytes("UTF-8")), (3L, null))
      .toDF("id", "video")
    val out = new VideoDecoder().setInputCol("video").setOutputCol("meta")
      .transform(df).head
      .select("id", "meta.brand", "meta.timescale", "meta.duration",
        "meta.duration_sec", "meta.n_tracks")
      .collect().map(r => r.getLong(0) -> r).toMap
    val r = out(1L)
    assert(r.getString(1) == "mp42" && r.getLong(2) == 600L && r.getLong(3) == 9000L)
    assert(math.abs(r.getDouble(4) - 15.0) < 1e-12)
    assert(r.getInt(5) == 2)
    assert(out(2L).isNullAt(1) && out(3L).isNullAt(1))
  }

  test("av decoders round-trip through param save/load") {
    val d1 = tmpDir(); val d2 = tmpDir()
    new AudioDecoder().setInputCol("a").setOutputCol("am").save(d1)
    new VideoDecoder().setInputCol("v").setOutputCol("vm").save(d2)
    assert(AudioDecoder.load(spark, d1).getInputCol == "a")
    assert(VideoDecoder.load(spark, d2).getOutputCol == "vm")
  }
}
