package graft.ann

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.api.{Estimator, Model, StageLoader}
import graft.param._
import graft.util.ReadWrite

/**
 * Per-dimension scalar quantization of embedding columns to int8 —
 * the standard 4× memory compression step before large-scale ANN
 * (FAISS's SQ8 / "scalar quantizer"): each dimension d maps linearly
 * from its corpus [min_d, max_d] range onto 256 levels,
 *
 *   code = clamp(⌊(x − min_d)·255/(max_d − min_d) + 0.5⌋, 0, 255) − 128
 *
 * `fit` computes the per-dimension ranges; `transform` appends the
 * int8 code array (`outputCol`) and a dequantized reconstruction
 * (`outputCol_dequant`) for distance computation. Constant dimensions
 * (max = min) quantize to code −128 and reconstruct to the constant.
 *
 * Scale shape: fitting is posexplode → per-dim min/max — one partial
 * agg whose output is O(dim) rows; the model is collected to the
 * driver (O(dim) doubles) and inlined into the transform projection
 * as literal arrays, so encoding is a pure in-row, shuffle-free
 * Column expression over the corpus scan — exactly what you want when
 * compressing 100 TB of embeddings.
 *
 * No reference counterpart — beyond-reference LLM-data-pipeline tier.
 */
class ScalarQuantizer extends Estimator[ScalarQuantizer, ScalarQuantizerModel]
    with HasInputCol[ScalarQuantizer] with HasOutputCol[ScalarQuantizer] {

  override def fit(inputs: DataFrame*): ScalarQuantizerModel = {
    require(inputs.size == 1)
    val spark = inputs.head.sparkSession
    // materialize the O(dim) ranges NOW: a lazy plan here would re-scan
    // the training corpus on every transform/save, and decode ranges
    // could silently diverge from the encode if the source moved
    val collected = inputs.head
      .select(posexplode(col(getInputCol).cast("array<double>")).as(Seq("dim", "x")))
      .groupBy("dim")
      .agg(min("x").as("lo"), max("x").as("hi"))
      .collect().map(r => (r.getInt(0), r.getDouble(1), r.getDouble(2)))
    import spark.implicits._
    val ranges = collected.toSeq.toDF("dim", "lo", "hi")
    val m = new ScalarQuantizerModel().setModelData(ranges)
    copyParamsTo(m)
    m
  }
}
object ScalarQuantizer extends StageLoader[ScalarQuantizer] {
  def load(spark: SparkSession, path: String): ScalarQuantizer =
    ReadWrite.applyParams(new ScalarQuantizer, path)
}

/** Applies the fitted per-dimension ranges. Model data: (dim, lo, hi). */
class ScalarQuantizerModel extends Model[ScalarQuantizerModel]
    with HasInputCol[ScalarQuantizerModel] with HasOutputCol[ScalarQuantizerModel] {

  private var ranges: DataFrame = _
  override def setModelData(data: DataFrame*): ScalarQuantizerModel = {
    ranges = data.head; this
  }
  override def getModelData: Array[DataFrame] = Array(ranges)

  override def transform(inputs: DataFrame*): Array[DataFrame] = {
    require(inputs.size == 1)
    // O(dim) driver copy, inlined as plan literals → shuffle-free encode
    val collected = ranges.orderBy("dim").collect()
      .map(r => (r.getInt(0), r.getDouble(1), r.getDouble(2)))
    val lows = lit(collected.map(_._2))
    val highs = lit(collected.map(_._3))

    val x = col(getInputCol).cast("array<double>")
    val idxs = sequence(lit(1), size(x))
    val codes = zip_with(x, idxs, (v, i) => {
      val lo = element_at(lows, i)
      val hi = element_at(highs, i)
      val scaled = floor((v - lo) * 255.0 / (hi - lo) + 0.5)
      when(hi === lo, lit(-128))
        .otherwise(greatest(least(scaled, lit(255.0)), lit(0.0)) - 128)
        .cast("tinyint")
    })
    val dequant = zip_with(codes, idxs, (c, i) => {
      val lo = element_at(lows, i)
      val hi = element_at(highs, i)
      when(hi === lo, lo)
        .otherwise((c.cast("double") + 128.0) * (hi - lo) / 255.0 + lo)
    })
    Array(inputs.head
      .withColumn(getOutputCol, codes)
      .withColumn(getOutputCol + "_dequant", dequant))
  }
}
object ScalarQuantizerModel extends StageLoader[ScalarQuantizerModel] {
  def load(spark: SparkSession, path: String): ScalarQuantizerModel = {
    val m = ReadWrite.applyParams(new ScalarQuantizerModel, path)
    m.setModelData(ReadWrite.loadModelData(spark, path))
  }
}
