package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SaveMode}
import org.apache.spark.sql.functions._

/**
 * Z-order (Morton) table layout for multi-dimensional data skipping —
 * the lakehouse trick that makes range predicates on SEVERAL columns
 * prune files/row-groups at once (Delta Lake's OPTIMIZE ZORDER,
 * Hudi/Iceberg clustering). Sorting by one column prunes only that
 * column's predicates; sorting by the interleaved bits of k columns
 * gives every file a small hyper-rectangle of the key space, so
 * parquet min/max statistics skip most of the table for a predicate
 * on ANY subset of the z-ordered columns.
 *
 * Pipeline: each column is linearly bucketized to [0, 2^bits) from
 * its global min/max (one scalar-aggregate scan), buckets are
 * bit-interleaved into one long (column i contributes bit j at
 * position j·k+i), and the table is written range-partitioned +
 * sorted by that z-value — every output file owns a contiguous,
 * disjoint z-range.
 *
 * Skew caveat (documented, deliberate): linear min/max bucketing is
 * exactly engine-replayable (the oracle recomputes z-values
 * bit-for-bit) but equi-WIDTH, so a heavily skewed column wastes
 * bucket resolution — pre-transform (log, rank) skewed columns before
 * z-ordering, the same advice Delta gives for timestamp-like keys.
 * All Column math, zero UDF, zero extra shuffle beyond the final
 * range partition (which any clustered write pays).
 */
object ZOrderWriter {

  /** Max total interleaved bits that fit a positive long. */
  val MaxTotalBits = 62

  /** Linear bucketization of a numeric column to [0, 2^bits):
    * floor((v − min)·2^bits / (max − min)), clamped into range (the
    * max value lands in the top bucket; a constant column — max ==
    * min — collapses to bucket 0). Null values sort first (bucket 0).
    * The expression shape is fixed so any engine replays it. */
  def bucketize(c: Column, min: Double, max: Double, bits: Int): Column = {
    val n = 1L << bits
    if (max <= min) lit(0L)
    else {
      val raw = floor((c.cast("double") - lit(min)) * lit(n.toDouble) / lit(max - min))
        .cast("long")
      coalesce(least(lit(n - 1), greatest(lit(0L), raw)), lit(0L))
    }
  }

  /** Interleave k bucket columns (each in [0, 2^bits)) into one long:
    * column i's bit j lands at position j·k + i. Pure bitwise Column
    * math — bits·k terms, whole-stage codegen'd. */
  def interleaveBits(buckets: Seq[Column], bits: Int): Column = {
    val k = buckets.size
    require(k >= 1, "interleaveBits needs at least one column")
    require(bits >= 1 && bits * k <= MaxTotalBits,
      s"$k columns at $bits bits = ${bits * k} interleaved bits; max $MaxTotalBits")
    val terms = for {
      (b, i) <- buckets.zipWithIndex
      j <- 0 until bits
    } yield shiftleft(shiftright(b, j).bitwiseAND(lit(1L)), j * k + i)
    terms.reduce(_ + _)
  }

  /** Append a `zCol` long column = the Morton interleave of `cols`
    * after min/max bucketization (one scalar-aggregate scan computes
    * every column's range). */
  def withZValue(df: DataFrame, cols: Seq[String], bits: Int,
      zCol: String = "__z"): DataFrame = {
    require(cols.nonEmpty, "zorder needs at least one column")
    require(!df.columns.contains(zCol),
      s"ZOrderWriter: input already has a '$zCol' column; drop or rename it first")
    val aggs = cols.flatMap(c =>
      Seq(min(col(c).cast("double")).as(s"__min_$c"), max(col(c).cast("double")).as(s"__max_$c")))
    val r = df.agg(aggs.head, aggs.tail: _*).head()
    require(!r.anyNull, s"ZOrderWriter: a z-order column is entirely null")
    val buckets = cols.zipWithIndex.map { case (c, i) =>
      bucketize(col(c), r.getDouble(2 * i), r.getDouble(2 * i + 1), bits)
    }
    df.withColumn(zCol, interleaveBits(buckets, bits))
  }

  /** Write `df` z-ordered by `cols` into `numFiles` parquet files,
    * each owning a contiguous disjoint z-range (repartitionByRange +
    * in-partition sort on the z-value; the helper column is dropped
    * from the written schema). */
  def write(df: DataFrame, cols: Seq[String], path: String, numFiles: Int,
      bits: Int = 12, mode: SaveMode = SaveMode.ErrorIfExists): Unit = {
    require(numFiles > 0, "numFiles must be positive")
    withZValue(df, cols, bits)
      .repartitionByRange(numFiles, col("__z"))
      .sortWithinPartitions("__z")
      .drop("__z")
      .write.mode(mode).parquet(path)
  }
}
