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

  test("parseWav terminates on crafted chunk sizes (no infinite loop, no throw)") {
    // chunk size 0xFFFFFFF8 truncated to Int used to advance the offset
    // by exactly 0 — a hung executor task; the walk must finish and
    // return None (or valid meta) in bounded time
    val hostile = java.nio.ByteBuffer.allocate(64)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    hostile.put("RIFF".getBytes("US-ASCII")).putInt(56)
      .put("WAVE".getBytes("US-ASCII"))
    hostile.put("JUNK".getBytes("US-ASCII")).putInt(0xFFFFFFF8) // unsigned 4294967288
    val deadline = System.nanoTime() + 2_000_000_000L
    assert(AudioDecoder.parseWav(hostile.array()).isEmpty)
    assert(System.nanoTime() < deadline, "parseWav did not terminate promptly")
    // other large sizes must not drive the offset negative / throw
    for (sz <- Seq(0x80000000L, 0xFFFFFFFFL, 0x7FFFFFFFL, 0xFFFFFFF9L)) {
      val b = java.nio.ByteBuffer.allocate(64).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      b.put("RIFF".getBytes("US-ASCII")).putInt(56).put("WAVE".getBytes("US-ASCII"))
      b.put("fmt ".getBytes("US-ASCII")).putInt(sz.toInt)
      AudioDecoder.parseWav(b.array()) // must not throw or loop
    }
  }

  test("parseWav/parseMp4 survive fuzzed corruption of valid payloads") {
    // flip bytes / truncate a few hundred valid payloads: every parse
    // must return None or a valid meta — never throw, never hang
    val rnd = new scala.util.Random(42)
    val wav = AudioDecoder.syntheticWav(16000, 200, 2, 7L)
    val mp4 = VideoDecoder.syntheticMp4(600, 9000L, 2)
    val t0 = System.nanoTime()
    for (_ <- 0 until 400) {
      val base = if (rnd.nextBoolean()) wav.clone() else mp4.clone()
      // corrupt 1-8 random bytes
      for (_ <- 0 to rnd.nextInt(8))
        base(rnd.nextInt(base.length)) = rnd.nextInt(256).toByte
      // sometimes truncate
      val payload = if (rnd.nextInt(3) == 0) base.take(rnd.nextInt(base.length)) else base
      AudioDecoder.parseWav(payload)
      VideoDecoder.parseMp4(payload) // no throw, no hang is the assertion
    }
    assert(System.nanoTime() - t0 < 30_000_000_000L, "fuzz loop took too long")
  }

  test("parseMp4 rejects truncated mvhd boxes instead of reading past the buffer") {
    val good = VideoDecoder.syntheticMp4(600, 9000L, 1)
    // rewrite the mvhd box size to a value between 8 and the v0 field
    // span (28) so the fields would read past the box
    val bb = java.nio.ByteBuffer.wrap(good.clone()).order(java.nio.ByteOrder.BIG_ENDIAN)
    // layout: ftyp(16) | moov hdr(8) | mvhd size at offset 24
    bb.putInt(24, 16) // truncated mvhd
    assert(VideoDecoder.parseMp4(bb.array()).isEmpty)
    // truncated v1 mvhd (version byte = 1, size below the v1 span 40)
    val v1 = good.clone()
    val b1 = java.nio.ByteBuffer.wrap(v1).order(java.nio.ByteOrder.BIG_ENDIAN)
    b1.putInt(24, 36)       // below 40
    v1(32) = 1.toByte       // mvhd version = 1
    assert(VideoDecoder.parseMp4(v1).isEmpty)
  }

  test("av decoders round-trip through param save/load") {
    val d1 = tmpDir(); val d2 = tmpDir()
    new AudioDecoder().setInputCol("a").setOutputCol("am").save(d1)
    new VideoDecoder().setInputCol("v").setOutputCol("vm").save(d2)
    assert(AudioDecoder.load(spark, d1).getInputCol == "a")
    assert(VideoDecoder.load(spark, d2).getOutputCol == "vm")
  }
}
