package graft.multimodal

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.api.{StageLoader, Transformer}
import graft.param._
import graft.util.ReadWrite

/**
 * Multimodal column plumbing: image/audio/video payloads travel as
 * opaque `binary` columns with typed metadata structs. The Spark-side
 * contract — schema, partitioning, batched per-partition execution —
 * is real and tested. The codec seam has one REAL implementation
 * ([[ImageDecoder]], JDK javax.imageio header parse) plus a
 * deterministic fake ([[BinaryDecodeStub]]) standing in for codecs
 * that need native media libraries not present in this environment.
 */

/**
 * "Decode" a binary payload into a fixed-schema metadata struct
 * (n_bytes, digest, header hex). A real deployment replaces
 * [[BinaryDecodeStub.decode]] with an actual codec (JPEG dimensions,
 * audio sample counts, ...); everything else — the binary column in,
 * the fixed-schema struct out, the codegen-friendly projection — is
 * the production shape.
 */
class BinaryDecodeStub extends Transformer[BinaryDecodeStub]
    with HasInputCol[BinaryDecodeStub] with HasOutputCol[BinaryDecodeStub] {

  override def transform(inputs: DataFrame*): Array[DataFrame] = {
    require(inputs.size == 1)
    Array(inputs.head.withColumn(getOutputCol, BinaryDecodeStub.decode(col(getInputCol))))
  }
}
object BinaryDecodeStub extends StageLoader[BinaryDecodeStub] {
  /** The codec seam: swap for a real decoder expression / UDF. */
  def decode(payload: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    struct(
      length(payload).cast("long").as("n_bytes"),
      md5(payload).as("digest"),
      hex(substring(payload, 1, 4)).as("header"))

  def load(spark: SparkSession, path: String): BinaryDecodeStub =
    ReadWrite.applyParams(new BinaryDecodeStub, path)
}

/** Decoded image metadata (fixed output schema of [[ImageDecoder]]). */
case class ImageMeta(width: Int, height: Int, format: String)

/**
 * A REAL image decoder on the [[BinaryDecodeStub]] seam: parses the
 * payload's image header via javax.imageio (JDK built-in: PNG, JPEG,
 * GIF, BMP) and emits (width, height, format). Header-only — the
 * reader is asked for dimensions without decoding pixel data, so a
 * 100 TB image corpus pays bytes-to-header IO per row, not a full
 * raster decode. Rows whose payload is not a readable image decode to
 * null (filter or route them with a downstream `where`).
 */
class ImageDecoder extends Transformer[ImageDecoder]
    with HasInputCol[ImageDecoder] with HasOutputCol[ImageDecoder] {

  override def transform(inputs: DataFrame*): Array[DataFrame] = {
    require(inputs.size == 1)
    val decode = udf { payload: Array[Byte] =>
      if (payload == null) None
      else {
        // MemoryCacheImageInputStream, NOT ImageIO.createImageInputStream:
        // the factory defaults to a FileCache stream, which would create
        // and delete a temp FILE on executor disk for every row
        val iis = new javax.imageio.stream.MemoryCacheImageInputStream(
          new java.io.ByteArrayInputStream(payload))
        try {
          val readers = javax.imageio.ImageIO.getImageReaders(iis)
          if (!readers.hasNext) None
          else {
            val r = readers.next()
            try {
              r.setInput(iis, true, true)
              Some(ImageMeta(r.getWidth(0), r.getHeight(0), r.getFormatName.toLowerCase(java.util.Locale.ROOT)))
            } catch { case _: Exception => None }
            finally r.dispose()
          }
        } finally iis.close()
      }
    }
    Array(inputs.head.withColumn(getOutputCol, decode(col(getInputCol))))
  }
}
object ImageDecoder extends StageLoader[ImageDecoder] {
  def load(spark: SparkSession, path: String): ImageDecoder =
    ReadWrite.applyParams(new ImageDecoder, path)

  /** Deterministic PNG payload for tests/benchmarks: a w×h RGB image
    * whose pixels derive from (x, y, seed). */
  def syntheticPng(width: Int, height: Int, seed: Long): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      width, height, java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < height) {
      var x = 0
      while (x < width) {
        img.setRGB(x, y, ((seed + x * 31 + y * 131) & 0xffffff).toInt)
        x += 1
      }
      y += 1
    }
    val baos = new java.io.ByteArrayOutputStream()
    // MemoryCacheImageOutputStream: the OutputStream overload defaults
    // to a FileCache stream — a temp file per image on executor disk
    // in the per-row bench paths (same lesson as the read side)
    val ios = new javax.imageio.stream.MemoryCacheImageOutputStream(baos)
    try require(javax.imageio.ImageIO.write(img, "png", ios), "no PNG writer")
    finally ios.close()
    baos.toByteArray
  }
}

/**
 * Sample fixed-size "frames" from a binary payload: split into
 * frameBytes chunks, keep every everyNth chunk, emit one digest per
 * kept frame. Stands in for video frame sampling / audio windowing;
 * the chunk walk runs per row inside the executors, so payload bytes
 * never leave their partition.
 */
class FrameSampler extends Transformer[FrameSampler]
    with HasInputCol[FrameSampler] with HasOutputCol[FrameSampler] {

  final val frameBytes: Param[Int] =
    param[Int]("frameBytes", "Frame (chunk) size in bytes.", 64, ParamValidators.gt(0))
  final val everyNth: Param[Int] =
    param[Int]("everyNth", "Keep every n-th frame.", 1, ParamValidators.gt(0))
  def setFrameBytes(v: Int): FrameSampler = set(frameBytes, v)
  def setEveryNth(v: Int): FrameSampler = set(everyNth, v)
  def getFrameBytes: Int = get(frameBytes)
  def getEveryNth: Int = get(everyNth)

  override def transform(inputs: DataFrame*): Array[DataFrame] = {
    require(inputs.size == 1)
    val (fb, nth) = (getFrameBytes, getEveryNth)
    val sample = udf { payload: Array[Byte] =>
      if (payload == null) null
      else {
        val digest = java.security.MessageDigest.getInstance("MD5")
        payload.grouped(fb).zipWithIndex.collect {
          case (chunk, i) if i % nth == 0 =>
            digest.reset()
            digest.digest(chunk).map("%02x".format(_)).mkString
        }.toSeq
      }
    }
    Array(inputs.head.withColumn(getOutputCol, sample(col(getInputCol))))
  }
}
object FrameSampler extends StageLoader[FrameSampler] {
  def load(spark: SparkSession, path: String): FrameSampler =
    ReadWrite.applyParams(new FrameSampler, path)
}

/** Decoded WAV metadata (fixed output schema of [[AudioDecoder]]). */
case class WavMeta(channels: Int, sample_rate: Int, bits_per_sample: Int,
    n_samples: Long, duration_sec: Double)

/**
 * A REAL audio header decoder on the [[BinaryDecodeStub]] seam: parses
 * RIFF/WAVE headers (the public WAV container format — chunked RIFF
 * with a little-endian `fmt ` chunk and a `data` chunk) and emits
 * (channels, sample_rate, bits_per_sample, n_samples, duration_sec).
 * Header-only: the sample data is never touched, so a 100 TB audio
 * corpus pays header IO per row, not a PCM decode. Non-WAV payloads
 * decode to null.
 */
class AudioDecoder extends Transformer[AudioDecoder]
    with HasInputCol[AudioDecoder] with HasOutputCol[AudioDecoder] {

  override def transform(inputs: DataFrame*): Array[DataFrame] = {
    require(inputs.size == 1)
    val decode = udf { payload: Array[Byte] => AudioDecoder.parseWav(payload) }
    Array(inputs.head.withColumn(getOutputCol, decode(col(getInputCol))))
  }
}
object AudioDecoder extends StageLoader[AudioDecoder] {
  def load(spark: SparkSession, path: String): AudioDecoder =
    ReadWrite.applyParams(new AudioDecoder, path)

  /** Raw RIFF/WAVE chunk-walk result: everything the header declares,
    * plus where the sample data starts ([[graft.multimodal.AudioDHash]]
    * needs the PCM bytes, [[AudioDecoder]] only the metadata). */
  private[multimodal] final case class WavChunks(channels: Int, rate: Long,
      bits: Int, blockAlign: Int, dataOff: Long, dataSize: Long)

  /** RIFF/WAVE header walk; null/garbage → None. THE single shared
    * untrusted-bytes walk (parseWav and AudioDHash both ride it): the
    * chunk size is a raw UNSIGNED 32-bit field, so the walk keeps both
    * the offset and the size as Long (a crafted size like 0xFFFFFFF8
    * truncated to Int would advance the offset by 0 — an executor task
    * hung forever on one bad payload) and any read past the buffer
    * ends the walk instead of throwing. */
  private[multimodal] def walkWav(b: Array[Byte]): Option[WavChunks] = try {
    if (b == null || b.length < 44) return None
    def le16(o: Long): Int = (b(o.toInt) & 0xff) | ((b(o.toInt + 1) & 0xff) << 8)
    def le32(o: Long): Long = (b(o.toInt) & 0xffL) | ((b(o.toInt + 1) & 0xffL) << 8) |
      ((b(o.toInt + 2) & 0xffL) << 16) | ((b(o.toInt + 3) & 0xffL) << 24)
    def tag(o: Long): String = new String(b, o.toInt, 4, "US-ASCII")
    if (tag(0) != "RIFF" || tag(8) != "WAVE") return None
    var off = 12L
    var channels = -1; var rate = 0L; var bits = -1
    var blockAlign = -1; var dataOff = -1L; var dataSize = -1L
    while (off + 8 <= b.length) {
      val id = tag(off); val sz = le32(off + 4) // unsigned: 0 <= sz < 2^32
      if (id == "fmt " && off + 24 <= b.length) {
        channels = le16(off + 10); rate = le32(off + 12)
        blockAlign = le16(off + 20); bits = le16(off + 22)
      } else if (id == "data") { dataOff = off + 8; dataSize = sz }
      off += 8L + sz + (sz & 1L) // RIFF chunks are word-aligned; always advances >= 8
    }
    if (channels <= 0 || dataSize < 0) None
    else Some(WavChunks(channels, rate, bits, blockAlign, dataOff, dataSize))
  } catch { case _: RuntimeException => None }

  private[multimodal] def parseWav(b: Array[Byte]): Option[WavMeta] =
    walkWav(b).flatMap { w =>
      if (w.rate <= 0 || w.blockAlign <= 0) None
      else Some(WavMeta(w.channels, w.rate.toInt, w.bits, w.dataSize / w.blockAlign,
        w.dataSize.toDouble / (w.rate * w.blockAlign)))
    }

  /** 44-byte-header 16-bit PCM WAV around the given interleaved
    * samples — the single header builder syntheticWav and
    * [[AudioDHasher.syntheticWindowWav]] share. */
  private[multimodal] def wavBytes(sampleRate: Int, channels: Int,
      samples: Array[Short]): Array[Byte] = {
    val blockAlign = channels * 2
    val dataSize = samples.length * 2
    val buf = java.nio.ByteBuffer.allocate(44 + dataSize)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    buf.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataSize)
      .put("WAVE".getBytes("US-ASCII"))
    buf.put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1.toShort)                      // PCM
      .putShort(channels.toShort)
      .putInt(sampleRate)
      .putInt(sampleRate * blockAlign)           // byte rate
      .putShort(blockAlign.toShort)
      .putShort(16.toShort)                      // bits per sample
    buf.put("data".getBytes("US-ASCII")).putInt(dataSize)
    samples.foreach(buf.putShort)
    buf.array()
  }

  /** Deterministic 16-bit PCM WAV payload for tests/benchmarks:
    * samples derive from (index, seed). */
  def syntheticWav(sampleRate: Int, numSamples: Int, channels: Int,
      seed: Long): Array[Byte] = {
    val samples = new Array[Short](numSamples * channels)
    var i = 0
    while (i < samples.length) {
      samples(i) = ((seed + i * 2654435761L) & 0xffff).toShort
      i += 1
    }
    wavBytes(sampleRate, channels, samples)
  }
}

/** Decoded MP4 metadata (fixed output schema of [[VideoDecoder]]). */
case class Mp4Meta(brand: String, timescale: Long, duration: Long,
    duration_sec: Double, n_tracks: Int)

/**
 * A REAL video container decoder on the [[BinaryDecodeStub]] seam:
 * walks the ISO BMFF (MP4) box structure — `ftyp` for the major
 * brand, `moov`/`mvhd` (version 0 and 1) for timescale and duration,
 * and one `trak` child per track — and emits (brand, timescale,
 * duration, duration_sec, n_tracks). Header-only: media data (`mdat`)
 * is skipped by box size, so the scan cost is bytes-to-moov, not a
 * frame decode. Non-MP4 payloads decode to null.
 */
class VideoDecoder extends Transformer[VideoDecoder]
    with HasInputCol[VideoDecoder] with HasOutputCol[VideoDecoder] {

  override def transform(inputs: DataFrame*): Array[DataFrame] = {
    require(inputs.size == 1)
    val decode = udf { payload: Array[Byte] => VideoDecoder.parseMp4(payload) }
    Array(inputs.head.withColumn(getOutputCol, decode(col(getInputCol))))
  }
}
object VideoDecoder extends StageLoader[VideoDecoder] {
  def load(spark: SparkSession, path: String): VideoDecoder =
    ReadWrite.applyParams(new VideoDecoder, path)

  /** ISO BMFF top-level box walk; null/garbage → None. */
  private[multimodal] def parseMp4(b: Array[Byte]): Option[Mp4Meta] = try {
    if (b == null || b.length < 16) return None
    def be32(o: Int): Long = ((b(o) & 0xffL) << 24) | ((b(o + 1) & 0xffL) << 16) |
      ((b(o + 2) & 0xffL) << 8) | (b(o + 3) & 0xffL)
    def tag(o: Int): String = new String(b, o, 4, "US-ASCII")
    if (tag(4) != "ftyp") return None // first box must be ftyp
    var off = 0
    var brand: String = null
    var timescale = -1L; var duration = -1L; var tracks = 0; var sawMoov = false
    while (off + 8 <= b.length) {
      val sz = be32(off); val typ = tag(off + 4)
      if (sz < 8 || off + sz > b.length) return None
      if (typ == "ftyp") brand = tag(off + 8)
      else if (typ == "moov") {
        sawMoov = true
        var c = off + 8
        val end = off + sz.toInt
        while (c + 8 <= end) {
          val csz = be32(c); val ctyp = tag(c + 4)
          if (csz < 8 || c + csz > end) return None
          if (ctyp == "mvhd") {
            // a truncated mvhd (csz between 8 and the field span) must
            // decode to None, not read past the buffer: v0 fields end at
            // c+27 (need csz >= 28), v1 at c+39 (need csz >= 40)
            if (csz < 12) return None
            val version = b(c + 8) & 0xff
            if (version == 0) {
              if (csz < 28) return None
              timescale = be32(c + 20); duration = be32(c + 24)
            } else {
              if (csz < 40) return None
              timescale = be32(c + 28); duration = (be32(c + 32) << 32) | be32(c + 36)
            }
          } else if (ctyp == "trak") tracks += 1
          c += csz.toInt
        }
      }
      off += sz.toInt
    }
    if (!sawMoov || timescale <= 0) None
    else Some(Mp4Meta(brand, timescale, duration,
      duration.toDouble / timescale, tracks))
  } catch { case _: RuntimeException => None }

  /** Deterministic minimal MP4 payload for tests/benchmarks: an ftyp
    * box, a moov with a version-0 mvhd and `numTracks` stub trak
    * boxes, and an empty mdat. */
  def syntheticMp4(timescale: Int, duration: Long, numTracks: Int,
      brand: String = "isom"): Array[Byte] = {
    require(brand.length == 4, "brand must be 4 chars")
    val mvhdSize = 108
    val trakSize = 16
    val moovSize = 8 + mvhdSize + numTracks * trakSize
    val buf = java.nio.ByteBuffer.allocate(16 + moovSize + 8)
      .order(java.nio.ByteOrder.BIG_ENDIAN)
    buf.putInt(16).put("ftyp".getBytes("US-ASCII"))
      .put(brand.getBytes("US-ASCII")).putInt(0)
    buf.putInt(moovSize).put("moov".getBytes("US-ASCII"))
    buf.putInt(mvhdSize).put("mvhd".getBytes("US-ASCII"))
      .putInt(0)                                  // version 0 + flags
      .putInt(0).putInt(0)                        // creation, modification
      .putInt(timescale).putInt(duration.toInt)
      .putInt(0x00010000).putShort(0x0100.toShort) // rate 1.0, volume 1.0
      .putShort(0.toShort).putInt(0).putInt(0)    // reserved
    // identity matrix
    buf.putInt(0x00010000).putInt(0).putInt(0)
      .putInt(0).putInt(0x00010000).putInt(0)
      .putInt(0).putInt(0).putInt(0x40000000)
    (0 until 6).foreach(_ => buf.putInt(0))       // pre_defined
    buf.putInt(numTracks + 1)                     // next_track_ID
    (0 until numTracks).foreach { _ =>
      buf.putInt(trakSize).put("trak".getBytes("US-ASCII"))
        .putInt(8).put("free".getBytes("US-ASCII"))
    }
    buf.putInt(8).put("mdat".getBytes("US-ASCII"))
    buf.array()
  }
}
