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
 * Bucketing strategies:
 *   - "linear" (default): equi-width from the global min/max (one
 *     scalar-aggregate scan). Exactly engine-replayable (the oracle
 *     recomputes z-values bit-for-bit), but a heavily skewed column
 *     wastes bucket resolution — most rows collapse into a handful of
 *     buckets and pruning on that dim degrades toward a full scan.
 *   - "quantile": equi-DEPTH buckets from approxQuantile boundaries
 *     (the same Greenwald–Khanna sketch RobustScaler uses; one pass).
 *     Every bucket holds ~equal row mass regardless of distribution,
 *     so Zipf/log-normal keys keep their pruning power natively —
 *     no pre-transform (log, rank) needed. Boundary lookup is a
 *     two-level counting search over literal arrays (~2·√2^bits
 *     comparisons/row via the `aggregate` higher-order function) —
 *     still zero UDF, still whole-stage codegen. Not oracle-replayable
 *     (sketch boundaries are engine-specific); layout choices don't
 *     change query results, so correctness stays gated through the
 *     linear path and quantile is verified by footer-measured pruning
 *     (ScaleUp `zorder_skew`).
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

  /** Equi-depth bucketization against precomputed ascending quantile
    * `boundaries` (2^bits − 1 inner cut points): bucket ≈ count of
    * boundaries ≤ v, evaluated as a TWO-LEVEL counting search — a
    * coarse pass over per-chunk maxima then a fine pass inside the one
    * selected chunk (both `aggregate` higher-order functions over
    * literal arrays, ~2·√(2^bits) comparisons/row instead of 2^bits).
    * Duplicate boundaries (a heavy hitter spanning many quantiles) can
    * make the count land anywhere inside the duplicate run — the
    * mapping stays MONOTONE in v, which is the only property a z-order
    * layout needs. Nulls bucket to 0 (sort first, like linear). */
  def quantileBucketize(c: Column, boundaries: Array[Double], bits: Int): Column = {
    val n = 1L << bits
    require(boundaries.length == (n - 1).toInt,
      s"need ${n - 1} boundaries for $bits bits, got ${boundaries.length}")
    require(boundaries.sameElements(boundaries.sorted),
      "quantile boundaries must be ascending")
    val cs = math.max(1, math.ceil(math.sqrt(boundaries.length.toDouble)).toInt)
    val numChunks = (boundaries.length + cs - 1) / cs
    // pad the tail chunk with +inf so every chunk has exactly cs
    // elements (the monotonicity argument needs equal chunk sizes);
    // +inf is never <= v, so padding never counts
    val padded = boundaries ++
      Array.fill(numChunks * cs - boundaries.length)(Double.PositiveInfinity)
    val chunks = padded.grouped(cs).map(_.toSeq).toSeq
    val chunkMax = chunks.map(_.max)
    val vd = c.cast("double")
    def countLe(arr: Column): Column =
      aggregate(arr, lit(0L), (acc, b) => acc + when(vd >= b, 1L).otherwise(0L))
    val coarse = countLe(typedLit(chunkMax))
    val cidx = least(coarse, lit(numChunks - 1L))
    val fine = countLe(element_at(typedLit(chunks), (cidx + 1L).cast("int")))
    val bucket = least(lit(n - 1), cidx * cs + fine)
    coalesce(when(vd.isNull, lit(0L)).otherwise(bucket), lit(0L))
  }

  /** One-pass GK-sketch quantile boundaries for every column (2^bits−1
    * inner cut points each); relativeError scales with the bucket
    * width so neighbour buckets stay distinguishable. */
  def quantileBoundaries(df: DataFrame, cols: Seq[String], bits: Int): Map[String, Array[Double]] = {
    val n = 1 << bits
    val probs = (1 until n).map(_.toDouble / n).toArray
    val relErr = math.max(1e-5, 1.0 / (4.0 * n))
    val all = df.stat.approxQuantile(cols.toArray, probs, relErr)
    cols.zip(all).map { case (c, b) =>
      require(b.nonEmpty, s"ZOrderWriter: z-order column '$c' is entirely null")
      c -> b
    }.toMap
  }

  /** Append a `zCol` long column = the Morton interleave of `cols`
    * after bucketization — "linear" (min/max equi-width, one
    * scalar-aggregate scan) or "quantile" (equi-depth via one
    * approxQuantile pass; skew-proof — see class doc). */
  def withZValue(df: DataFrame, cols: Seq[String], bits: Int,
      zCol: String = "__z", strategy: String = "linear"): DataFrame = {
    require(cols.nonEmpty, "zorder needs at least one column")
    require(!df.columns.contains(zCol),
      s"ZOrderWriter: input already has a '$zCol' column; drop or rename it first")
    val buckets = strategy match {
      case "linear" =>
        val aggs = cols.flatMap(c =>
          Seq(min(col(c).cast("double")).as(s"__min_$c"), max(col(c).cast("double")).as(s"__max_$c")))
        val r = df.agg(aggs.head, aggs.tail: _*).head()
        require(!r.anyNull, s"ZOrderWriter: a z-order column is entirely null")
        cols.zipWithIndex.map { case (c, i) =>
          bucketize(col(c), r.getDouble(2 * i), r.getDouble(2 * i + 1), bits)
        }
      case "quantile" =>
        val bnd = quantileBoundaries(df, cols, bits)
        cols.map(c => quantileBucketize(col(c), bnd(c), bits))
      case other =>
        throw new IllegalArgumentException(
          s"ZOrderWriter: unknown bucketStrategy '$other' (linear | quantile)")
    }
    df.withColumn(zCol, interleaveBits(buckets, bits))
  }

  /** Write `df` z-ordered by `cols` into `numFiles` parquet files,
    * each owning a contiguous disjoint z-range (repartitionByRange +
    * in-partition sort on the z-value; the helper column is dropped
    * from the written schema). */
  def write(df: DataFrame, cols: Seq[String], path: String, numFiles: Int,
      bits: Int = 12, mode: SaveMode = SaveMode.ErrorIfExists,
      strategy: String = "linear"): Unit = {
    require(numFiles > 0, "numFiles must be positive")
    withZValue(df, cols, bits, strategy = strategy)
      .repartitionByRange(numFiles, col("__z"))
      .sortWithinPartitions("__z")
      .drop("__z")
      .write.mode(mode).parquet(path)
  }
}
