package graft.stats

import org.apache.commons.math3.distribution.{ChiSquaredDistribution, FDistribution}
import org.apache.spark.ml.linalg.{Vector, Vectors}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.api._
import graft.param._
import graft.util.ReadWrite

private[stats] object StatsOutput {
  /** Assemble per-feature (idx, pValue, dof, statistic) rows into the
    * reference's output shape: flattened rows or a single nested row. */
  def build(
      spark: SparkSession,
      rows: Seq[(Int, Double, Long, Double)],
      flatten: Boolean,
      statName: String): DataFrame = {
    import spark.implicits._
    if (flatten) {
      rows.toDF("featureIndex", "pValue", "degreeOfFreedom", statName)
    } else {
      val sorted = rows.sortBy(_._1)
      val statsName = statName + "s"
      Seq((sorted.map(_._2).toArray, sorted.map(_._3).toArray, sorted.map(_._4).toArray))
        .toDF("pValues", "degreesOfFreedom", statsName)
        .select(
          org.apache.spark.ml.functions.array_to_vector(col("pValues")).as("pValues"),
          col("degreesOfFreedom"),
          org.apache.spark.ml.functions.array_to_vector(col(statsName)).as(statsName))
    }
  }
}

/**
 * Pearson's χ² independence test of each (categorical) feature against
 * the label. Output: pValues/degreesOfFreedom/statistics (single row)
 * or flattened per-feature rows.
 * Reference: stats/chisqtest/ChiSqTest.java:110.
 */
class ChiSqTest extends AlgoOperator[ChiSqTest] with OneToOne[ChiSqTest]
    with HasFeaturesCol[ChiSqTest] with HasLabelCol[ChiSqTest] with HasFlatten[ChiSqTest] {

  override protected def transformOne(df: DataFrame): DataFrame = {
    // one shuffle: (featureIdx, value, label) → count; the contingency
    // tables are O(distinct) and finish on the driver. The limit bounds
    // driver memory against continuous columns fed as categorical
    val counts = df.select(col(getLabelCol).cast("double").as("label"),
        posexplode(org.apache.spark.ml.functions.vector_to_array(col(getFeaturesCol)))
          .as(Seq("fidx", "value")))
      .groupBy("fidx", "value", "label").agg(count(lit(1)).as("cnt"))
      .limit(graft.classification.NaiveBayes.MaxContingencyCells + 1)
      .collect()
      .map(r => (r.getInt(0), r.getDouble(1), r.getDouble(2), r.getLong(3)))
    require(counts.length <= graft.classification.NaiveBayes.MaxContingencyCells,
      s"ChiSqTest contingency table exceeds ${graft.classification.NaiveBayes.MaxContingencyCells} " +
        "(feature, value, label) cells; both features and label must be categorical")

    val results = counts.groupBy(_._1).map { case (fidx, cells) =>
      val values = cells.map(_._2).distinct.sorted
      val labels = cells.map(_._3).distinct.sorted
      val total = cells.map(_._4).sum.toDouble
      val rowSum = values.map(v => v -> cells.filter(_._2 == v).map(_._4).sum.toDouble).toMap
      val colSum = labels.map(l => l -> cells.filter(_._3 == l).map(_._4).sum.toDouble).toMap
      val obs = cells.map(c => (c._2, c._3) -> c._4.toDouble).toMap
      var stat = 0.0
      values.foreach { v =>
        labels.foreach { l =>
          val e = rowSum(v) * colSum(l) / total
          val o = obs.getOrElse((v, l), 0.0)
          stat += (o - e) * (o - e) / e
        }
      }
      val dof = (values.length - 1).toLong * (labels.length - 1)
      val p = if (dof == 0) 1.0 else 1.0 - new ChiSquaredDistribution(dof.toDouble).cumulativeProbability(stat)
      (fidx, p, dof, stat)
    }.toSeq

    StatsOutput.build(df.sparkSession, results, getFlatten, "statistic")
  }
}
object ChiSqTest extends StageLoader[ChiSqTest] {
  def load(spark: SparkSession, path: String): ChiSqTest = ReadWrite.applyParams(new ChiSqTest, path)
}

/**
 * One-way ANOVA F-test per feature against a categorical label.
 * F = (SSB/(k-1)) / (SSW/(n-k)); dof output = (k-1)+(n-k).
 * Reference: stats/anovatest/ANOVATest.java:88.
 */
class ANOVATest extends AlgoOperator[ANOVATest] with OneToOne[ANOVATest]
    with HasFeaturesCol[ANOVATest] with HasLabelCol[ANOVATest] with HasFlatten[ANOVATest] {

  override protected def transformOne(df: DataFrame): DataFrame = {
    // one shuffle: per (featureIdx, label): n, sum, sumSq. The limit
    // bounds driver memory against a continuous label column
    val grouped = df.select(col(getLabelCol).cast("double").as("label"),
        posexplode(org.apache.spark.ml.functions.vector_to_array(col(getFeaturesCol)))
          .as(Seq("fidx", "value")))
      .groupBy("fidx", "label")
      .agg(count(lit(1)).as("n"), sum("value").as("s"), sum(col("value") * col("value")).as("ss"))
      .limit(graft.classification.NaiveBayes.MaxContingencyCells + 1)
      .collect()
      .map(r => (r.getInt(0), r.getDouble(1), r.getLong(2), r.getDouble(3), r.getDouble(4)))
    require(grouped.length <= graft.classification.NaiveBayes.MaxContingencyCells,
      s"ANOVATest group table exceeds ${graft.classification.NaiveBayes.MaxContingencyCells} " +
        "(feature, label) cells; the label must be categorical")

    val results = grouped.groupBy(_._1).map { case (fidx, classes) =>
      val n = classes.map(_._3).sum
      val k = classes.length
      val totalSum = classes.map(_._4).sum
      val grandMean = totalSum / n
      val ssTot = classes.map(_._5).sum - n * grandMean * grandMean
      val ssb = classes.map { case (_, _, ni, si, _) =>
        val mi = si / ni
        ni * (mi - grandMean) * (mi - grandMean)
      }.sum
      val ssw = ssTot - ssb
      val dofB = (k - 1).toLong
      val dofW = (n - k).toLong
      val f = (ssb / dofB) / (ssw / dofW)
      val p = 1.0 - new FDistribution(dofB.toDouble, dofW.toDouble).cumulativeProbability(f)
      (fidx, p, dofB + dofW, f)
    }.toSeq

    StatsOutput.build(df.sparkSession, results, getFlatten, "fValue")
  }
}
object ANOVATest extends StageLoader[ANOVATest] {
  def load(spark: SparkSession, path: String): ANOVATest = ReadWrite.applyParams(new ANOVATest, path)
}

/**
 * F-test for regression (Pearson-correlation based): per feature
 * corr = cov(x, y) / (std_y · std_x); F = corr²/(1-corr²)·(n-2);
 * p = 1 - F(1, n-2).cdf(F). Reference: stats/fvaluetest/FValueTest.java:93.
 */
class FValueTest extends AlgoOperator[FValueTest] with OneToOne[FValueTest]
    with HasFeaturesCol[FValueTest] with HasLabelCol[FValueTest] with HasFlatten[FValueTest] {

  override protected def transformOne(df: DataFrame): DataFrame = {
    val exploded = df.select(col(getLabelCol).cast("double").as("label"),
      posexplode(org.apache.spark.ml.functions.vector_to_array(col(getFeaturesCol)))
        .as(Seq("fidx", "value")))
    // per-feature sufficient statistics in one shuffle
    val grouped = exploded.groupBy("fidx")
      .agg(count(lit(1)).as("n"),
        avg("value").as("xmean"), stddev_samp("value").as("xstd"),
        avg("label").as("ymean"), stddev_samp("label").as("ystd"),
        sum(col("value") * col("label")).as("sxy"))
      .collect()

    val results = grouped.map { r =>
      val fidx = r.getInt(0)
      val n = r.getLong(1)
      val (xm, xs, ym, ys, sxy) = (r.getDouble(2), r.getDouble(3), r.getDouble(4), r.getDouble(5), r.getDouble(6))
      val cov = (sxy - n * xm * ym) / (n - 1)
      val corr = cov / (ys * xs)
      val dof = n - 2
      // clamp r² at 1: float noise can push |corr| past 1, which would
      // flip the denominator sign; a perfectly correlated feature gets
      // F = +∞, p = 0 instead of NaN
      val r2 = math.min(corr * corr, 1.0)
      val f = if (r2 == 1.0) Double.PositiveInfinity else r2 / (1 - r2) * dof
      val p = if (f.isPosInfinity) 0.0
        else 1.0 - new FDistribution(1.0, dof.toDouble).cumulativeProbability(f)
      (fidx, p, dof, f)
    }.toSeq

    StatsOutput.build(df.sparkSession, results, getFlatten, "fValue")
  }
}
object FValueTest extends StageLoader[FValueTest] {
  def load(spark: SparkSession, path: String): FValueTest = ReadWrite.applyParams(new FValueTest, path)
}
