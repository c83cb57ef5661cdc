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
 * is real and tested; the codec itself is a pluggable seam, stubbed
 * here with a deterministic fake because no media libraries ship in
 * this environment.
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
