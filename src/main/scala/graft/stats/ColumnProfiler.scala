package graft.stats

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.api.{AlgoOperator, StageLoader}
import graft.param._
import graft.util.ReadWrite

/**
 * Per-column profiling for data discovery and drift triage: one row
 * per profiled column — `(column, total, nulls, distinct_cnt, mean,
 * std, vmin, vmax, min_len, max_len)`. Numeric columns fill
 * mean/std/vmin/vmax (as doubles); string columns fill
 * min_len/max_len; every column gets total/nulls/distinct_cnt.
 *
 * Distinct counting: `exactDistinct = false` (default) uses
 * HyperLogLog++ (`approx_count_distinct`, rsd 2%) so the WHOLE
 * profile — every column — runs in ONE scan + one global aggregation
 * with no shuffle of the fact table. `true` switches to exact
 * `count(distinct)`, which Catalyst plans via EXPAND: the input is
 * replicated once per distinct-aggregate and shuffled — the honest
 * cost of exact answers, and the reason approximate is the 100 TB
 * default (a profile tolerates ±2%; a dedup decision does not — use
 * ExactDeduplicator's machinery for that).
 */
class ColumnProfiler extends AlgoOperator[ColumnProfiler]
    with HasInputCols[ColumnProfiler] {

  final val exactDistinct: Param[Boolean] = param[Boolean](
    "exactDistinct", "Exact count(distinct) instead of HyperLogLog (EXPAND shuffle)",
    false)
  def getExactDistinct: Boolean = get(exactDistinct)
  def setExactDistinct(v: Boolean): ColumnProfiler = set(exactDistinct, v)

  override def transform(inputs: DataFrame*): Array[DataFrame] = {
    require(inputs.size == 1)
    val df = inputs.head
    val cols = getInputCols
    val spark = df.sparkSession
    import spark.implicits._

    val aggs = cols.flatMap { c =>
      val isNum = df.schema(c).dataType match {
        case _: NumericType => true
        case _ => false
      }
      val isStr = df.schema(c).dataType == StringType
      val num = col(c).cast("double")
      Seq(
        count(col(c)).as(s"__cnt_$c"),
        (if (getExactDistinct) count_distinct(col(c))
         else approx_count_distinct(col(c))).as(s"__dist_$c"),
        (if (isNum) avg(num) else lit(null).cast("double")).as(s"__mean_$c"),
        (if (isNum) stddev_samp(num) else lit(null).cast("double")).as(s"__std_$c"),
        (if (isNum) min(num) else lit(null).cast("double")).as(s"__min_$c"),
        (if (isNum) max(num) else lit(null).cast("double")).as(s"__max_$c"),
        (if (isStr) min(length(col(c))) else lit(null).cast("int")).as(s"__minl_$c"),
        (if (isStr) max(length(col(c))) else lit(null).cast("int")).as(s"__maxl_$c"))
    } :+ count(lit(1)).as("__total")

    val r = df.agg(aggs.head, aggs.tail: _*).head()
    val total = r.getLong(r.fieldIndex("__total"))
    def d(n: String): Option[Double] =
      if (r.isNullAt(r.fieldIndex(n))) None else Some(r.getDouble(r.fieldIndex(n)))
    def i(n: String): Option[Int] =
      if (r.isNullAt(r.fieldIndex(n))) None else Some(r.getInt(r.fieldIndex(n)))

    val rows = cols.toSeq.map { c =>
      (c, total, total - r.getLong(r.fieldIndex(s"__cnt_$c")),
        r.getLong(r.fieldIndex(s"__dist_$c")),
        d(s"__mean_$c"), d(s"__std_$c"), d(s"__min_$c"), d(s"__max_$c"),
        i(s"__minl_$c"), i(s"__maxl_$c"))
    }
    Array(rows.toDF("column", "total", "nulls", "distinct_cnt",
      "mean", "std", "vmin", "vmax", "min_len", "max_len"))
  }
}

object ColumnProfiler extends StageLoader[ColumnProfiler] {
  def load(spark: SparkSession, path: String): ColumnProfiler =
    ReadWrite.applyParams(new ColumnProfiler, path)
}
