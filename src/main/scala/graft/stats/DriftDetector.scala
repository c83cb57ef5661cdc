package graft.stats

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.api.{AlgoOperator, StageLoader}
import graft.param._
import graft.util.ReadWrite

/**
 * Distribution-drift detection between a REFERENCE table (the
 * training/baseline window) and a CURRENT table (the window being
 * monitored): per numeric feature, the Population Stability Index and
 * a binned Kolmogorov–Smirnov statistic, both computed over the same
 * equal-width histogram whose edges come from the reference min/max.
 * The monitoring primitive a continuously-fed training pipeline runs
 * between every ingest window and its training snapshot (PSI > 0.25 is
 * the conventional "retrain" alarm). No reference counterpart —
 * beyond-reference LLM-data-pipeline tier.
 *
 * Choices made for engine-portable determinism (the DuckDB oracle
 * replays them bit-for-bit):
 *  - bins are equal-width over the REFERENCE [min, max]; current
 *    values outside the range clamp into the edge bins (standard PSI
 *    practice, and exact in any engine — reference-quantile edges
 *    would depend on a sketch);
 *  - bin proportions are Laplace-smoothed, p = (c + 0.5) / (n + 0.5·B),
 *    so empty bins never produce ±∞ in the PSI log term;
 *  - KS is the max absolute gap between the two binned CDFs — a lower
 *    bound on the exact statistic that converges as bins grow, without
 *    the per-feature global sort exact KS needs at corpus scale.
 *
 * Scale shape (100 TB design): one pass over each table per call —
 * min/max aggregation on the reference, then one groupBy(feature, bin)
 * count per side (map-side partial aggregation, B·F tiny result), a
 * broadcast-joined histogram compare, and a per-feature fold. Nothing
 * driver-side beyond the F×B histogram; no sort, no window over raw
 * rows.
 */
class DriftDetector extends AlgoOperator[DriftDetector] {

  final val featureCols: Param[Array[String]] =
    param[Array[String]]("featureCols", "Numeric columns to test for drift.",
      Array.empty[String], (a: Array[String]) => a != null && a.nonEmpty)
  def getFeatureCols: Array[String] = get(featureCols)
  def setFeatureCols(v: String*): DriftDetector = set(featureCols, v.toArray)

  final val numBins: Param[Int] =
    param[Int]("numBins", "Histogram bins over the reference range.", 10,
      ParamValidators.gt(1))
  def getNumBins: Int = get(numBins)
  def setNumBins(v: Int): DriftDetector = set(numBins, v)

  /** inputs = (reference, current). One output row per feature:
    * (feature, psi, ks, n_ref, n_cur). */
  override def transform(inputs: DataFrame*): Array[DataFrame] = {
    require(inputs.size == 2, "DriftDetector expects (reference, current)")
    val Seq(ref, cur) = inputs.toSeq
    val feats = getFeatureCols.toSeq
    val bins = getNumBins

    // one narrow frame per side: (feature, value) — a stack so every
    // feature shares the single aggregation pass
    def long(df: DataFrame): DataFrame = {
      val pairs = feats.flatMap(f => Seq(lit(f), col(f).cast("double")))
      df.select(explode(map(pairs: _*)).as(Seq("feature", "value")))
        .where(col("value").isNotNull && !isnan(col("value")))
    }
    val refLong = long(ref)
    val curLong = long(cur)

    // reference range per feature (drives both histograms)
    val range = refLong.groupBy("feature")
      .agg(min("value").as("lo"), max("value").as("hi"))

    def binned(df: DataFrame, cntName: String): DataFrame =
      df.join(broadcast(range), "feature")
        .withColumn("bin",
          when(col("hi") === col("lo"), lit(0))
            .otherwise(least(lit(bins - 1), greatest(lit(0),
              floor((col("value") - col("lo")) / ((col("hi") - col("lo")) / bins)).cast("int")))))
        .groupBy("feature", "bin").agg(count(lit(1)).as(cntName))

    val refH = binned(refLong, "c_ref")
    val curH = binned(curLong, "c_cur")

    // dense histogram: every (feature, bin) cell present on both sides
    val cells = range.select(col("feature"),
      explode(sequence(lit(0), lit(bins - 1))).as("bin"))
    val joined = cells
      .join(refH, Seq("feature", "bin"), "left")
      .join(curH, Seq("feature", "bin"), "left")
      .na.fill(0L, Seq("c_ref", "c_cur"))

    val totals = joined.groupBy("feature")
      .agg(sum("c_ref").as("n_ref"), sum("c_cur").as("n_cur"))

    val out = joined.join(broadcast(totals), "feature")
      .withColumn("p_ref", (col("c_ref") + 0.5) / (col("n_ref") + 0.5 * bins))
      .withColumn("p_cur", (col("c_cur") + 0.5) / (col("n_cur") + 0.5 * bins))
      .withColumn("psi_term", (col("p_cur") - col("p_ref")) * log(col("p_cur") / col("p_ref")))
      // binned-CDF gap needs the running sums in bin order; an empty
      // side has NO distribution, so its CDF — and hence ks — is an
      // EXPLICIT null rather than a divide-by-zero artifact
      .withColumn("cdf_ref", when(col("n_ref") > 0, sum(col("c_ref")).over(
        org.apache.spark.sql.expressions.Window.partitionBy("feature").orderBy("bin")) / col("n_ref")))
      .withColumn("cdf_cur", when(col("n_cur") > 0, sum(col("c_cur")).over(
        org.apache.spark.sql.expressions.Window.partitionBy("feature").orderBy("bin")) / col("n_cur")))
      .groupBy("feature")
      .agg(
        sum("psi_term").as("psi"),
        max(abs(col("cdf_ref") - col("cdf_cur"))).as("ks"))

    // a feature with zero non-null reference rows never enters `range`
    // and would silently VANISH; surface it with null metrics instead.
    // The reported n_ref/n_cur count each side's non-null rows
    // DIRECTLY — routing them through the ref-derived histogram would
    // report n_cur = 0 for a ref-empty feature even when current rows
    // exist (the monitor would read "no data arrived").
    val spark = ref.sparkSession
    import spark.implicits._
    val allFeats = feats.toDF("feature")
    val refN = refLong.groupBy("feature").agg(count(lit(1)).as("n_ref"))
    val curN = curLong.groupBy("feature").agg(count(lit(1)).as("n_cur"))
    Array(allFeats.join(out, Seq("feature"), "left")
      .join(refN, Seq("feature"), "left")
      .join(curN, Seq("feature"), "left")
      .na.fill(0L, Seq("n_ref", "n_cur")))
  }
}

object DriftDetector extends StageLoader[DriftDetector] {
  def load(spark: SparkSession, path: String): DriftDetector =
    ReadWrite.applyParams(new DriftDetector, path)
}
