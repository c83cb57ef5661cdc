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
    javax.imageio.ImageIO.write(img, "png", baos)
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
