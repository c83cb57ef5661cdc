package graft.stats

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.api.{AlgoOperator, StageLoader}
import graft.param._
import graft.util.ReadWrite

/**
 * Pairwise Pearson correlation matrix over numeric columns — the
 * drop-correlated-features step of a feature-selection pass, and the
 * quick collinearity check before fitting linear models. Emits one
 * row per unordered column pair `(col_a, col_b, corr)` with
 * `col_a < col_b` (the matrix is symmetric with a unit diagonal, so
 * pairs are the whole content).
 *
 * Scale shape: ALL d·(d−1)/2 pairs run in ONE scan + one map-side-
 * combined global aggregation (Catalyst shares the pass), so the
 * corpus is read once and the shuffle is O(d²) partials — never
 * O(rows). Rows where either column is null are excluded per pair
 * (each pair sees its own maximal data), matching SQL `corr`. A
 * zero-variance column yields null corr, again matching SQL — which
 * is why the ratio is assembled from guarded covar_samp/var_samp
 * co-moments instead of the builtin `corr` (whose internal division
 * RAISES under Spark's default ANSI mode on constant columns);
 * callers wanting a hard failure can check for nulls in the output.
 *
 * Spearman is deliberately absent: a distributed global rank needs a
 * per-column sort (d shuffles of the full table); compose it
 * explicitly (rank each column, then this operator) when the cost is
 * intended, rather than having a method flag quietly multiply the
 * scan cost by d.
 */
class CorrelationMatrix extends AlgoOperator[CorrelationMatrix]
    with HasInputCols[CorrelationMatrix] {

  override def transform(inputs: DataFrame*): Array[DataFrame] = {
    require(inputs.size == 1)
    val df = inputs.head
    val cols = getInputCols
    require(cols.length >= 2,
      s"CorrelationMatrix needs at least 2 input columns, got ${cols.length}")
    val pairs = for {
      i <- cols.indices; j <- (i + 1) until cols.length
    } yield (cols(i), cols(j))

    // pairwise-complete co-moments: variances restricted to the rows
    // where the OTHER column is also non-null, so each pair's corr is
    // computed over exactly its own complete cases
    val aggs = pairs.flatMap { case (a, b) =>
      val ca = col(a).cast("double")
      val cb = col(b).cast("double")
      Seq(
        covar_samp(ca, cb).as(s"cv__${a}__$b"),
        var_samp(when(cb.isNotNull, ca)).as(s"va__${a}__$b"),
        var_samp(when(ca.isNotNull, cb)).as(s"vb__${a}__$b"))
    }
    val r = df.agg(aggs.head, aggs.tail: _*).head()

    val spark = df.sparkSession
    import spark.implicits._
    val rows = pairs.zipWithIndex.map { case ((a, b), i) =>
      def get(k: Int): Option[Double] =
        if (r.isNullAt(3 * i + k)) None else Some(r.getDouble(3 * i + k))
      val c = for {
        cv <- get(0); va <- get(1); vb <- get(2)
        if va > 0.0 && vb > 0.0
      } yield cv / math.sqrt(va * vb)
      (a, b, c)
    }
    Array(rows.toDF("col_a", "col_b", "corr"))
  }
}

object CorrelationMatrix extends StageLoader[CorrelationMatrix] {
  def load(spark: SparkSession, path: String): CorrelationMatrix =
    ReadWrite.applyParams(new CorrelationMatrix, path)
}
