package graft.text

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.api.{StageLoader, Transformer}
import graft.param._
import graft.util.ReadWrite

/**
 * Splits documents into overlapping fixed-size token windows — the
 * standard pre-embedding chunking step of a retrieval/similarity
 * pipeline (context-window-sized pieces with `stride` tokens between
 * window starts; `stride < chunkSize` gives overlap). One output row
 * per chunk: `chunk_index` (0-based), the chunk text (`outputCol`),
 * and `chunk_tokens`. Documents with no tokens produce no rows.
 *
 * Chunk starts are 0, stride, 2·stride, … while start < n_tokens, so
 * the final chunk may be shorter than `chunkSize`.
 *
 * Scale shape: chunk construction is a pure in-row projection over
 * higher-order array functions (sequence/transform/slice) — fully
 * codegen'd, no UDF — followed by one explode. Nothing shuffles; the
 * output is written partition-local, which is exactly what you want
 * when chunking a 100 TB corpus for embedding.
 *
 * No reference counterpart — beyond-reference LLM-data-pipeline tier.
 */
class ChunkSplitter extends Transformer[ChunkSplitter]
    with HasInputCol[ChunkSplitter] with HasOutputCol[ChunkSplitter] {

  final val chunkSize: Param[Int] =
    param[Int]("chunkSize", "Tokens per chunk.", 256, ParamValidators.gt(0))
  def getChunkSize: Int = get(chunkSize)
  def setChunkSize(v: Int): ChunkSplitter = set(chunkSize, v)

  final val stride: Param[Int] =
    param[Int]("stride", "Tokens between consecutive chunk starts.", 128, ParamValidators.gt(0))
  def getStride: Int = get(stride)
  def setStride(v: Int): ChunkSplitter = set(stride, v)

  override def transform(inputs: DataFrame*): Array[DataFrame] = {
    require(inputs.size == 1)
    val size_ = getChunkSize
    val stride_ = getStride
    val text = col(getInputCol)
    val words: Column = when(length(trim(text)) === 0, array().cast("array<string>"))
      .otherwise(split(trim(text), "\\s+"))
    val n = size(words)
    // starts = [0, stride, …) below n; empty doc → empty starts → no rows
    val starts = when(n === 0, array().cast("array<int>"))
      .otherwise(sequence(lit(0), n - 1, lit(stride_)))
    val chunks = org.apache.spark.sql.functions.transform(starts, s => struct(
      // Column `/` is floating-point; starts are exact multiples of
      // stride so the quotient is integral — cast back to int
      (s / stride_).cast("int").as("idx"),
      concat_ws(" ", slice(words, s + 1, lit(size_))).as("text"),
      least(lit(size_), n - s).as("m")))
    Array(inputs.head
      .withColumn("__chunk", explode(chunks))
      .withColumn("chunk_index", col("__chunk.idx"))
      .withColumn(getOutputCol, col("__chunk.text"))
      .withColumn("chunk_tokens", col("__chunk.m"))
      .drop("__chunk"))
  }
}
object ChunkSplitter extends StageLoader[ChunkSplitter] {
  def load(spark: SparkSession, path: String): ChunkSplitter =
    ReadWrite.applyParams(new ChunkSplitter, path)
}
