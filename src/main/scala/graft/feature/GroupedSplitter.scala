package graft.feature

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.api.{AlgoOperator, StageLoader}
import graft.param._
import graft.util.ReadWrite

/**
 * Leakage-free train/validation/test splitting: every row of a GROUP
 * (user, document, session, …) lands in the same split, so features
 * learned on train never see a test group's rows — the standard
 * protection [[RandomSplitter]] cannot give, since row-level sampling
 * scatters a group across splits.
 *
 * Assignment is a pure function of (group key, seed): split i is
 * chosen when md5(groupCols ⊕ seed) falls inside the i-th interval of
 * [0, 2¹²⁸) sized by the normalized weights (thresholds precomputed
 * as hex literals — see [[StratifiedSampler.fractionThreshold]]).
 * Each output is therefore a plain codegen'd filter over the input:
 * NO shuffle, no RNG state, identical assignment on every run,
 * cluster size, and partitioning, and any engine with md5 can
 * reproduce it (the DuckDB oracle replays the same CASE).
 *
 * No reference counterpart — beyond-reference LLM-data-pipeline tier
 * (the reference's RandomSplitter, feature/randomsplitter/
 * RandomSplitter.java:46-76, splits per-row with parallelism-dependent
 * RNG draws).
 */
class GroupedSplitter extends AlgoOperator[GroupedSplitter]
    with HasSeed[GroupedSplitter] {

  final val groupCols: Param[Array[String]] =
    param[Array[String]]("groupCols",
      "Columns identifying the leakage unit; all rows sharing them land in one split.",
      Array.empty[String], (a: Array[String]) => a != null)
  def getGroupCols: Array[String] = get(groupCols)
  def setGroupCols(v: String*): GroupedSplitter = set(groupCols, v.toArray)

  final val weights: Param[Array[Double]] =
    param[Array[Double]]("weights", "Relative weights of the output tables",
      Array(1.0, 1.0), (a: Array[Double]) => a != null && a.length >= 2 && a.forall(_ > 0))
  def setWeights(v: Double*): GroupedSplitter = set(weights, v.toArray)
  def getWeights: Array[Double] = get(weights)

  /** The group's md5 selection key (0x01-separated fields + seed). */
  private def key: Column =
    md5(concat_ws("\u0001",
      getGroupCols.toSeq.map(c => col(c).cast("string")) :+ lit(getSeed.toString): _*))

  /** Upper hex thresholds of each split's interval; last is "g" (above
    * every md5). */
  def thresholds: Array[String] = {
    val w = getWeights
    val total = w.sum
    val cum = w.scanLeft(0.0)(_ + _).drop(1)
    cum.init.map(c => StratifiedSampler.fractionThreshold(c / total)) :+ "g"
  }

  override def transform(inputs: DataFrame*): Array[DataFrame] = {
    require(inputs.size == 1, "GroupedSplitter expects exactly one input table")
    require(getGroupCols.nonEmpty, "groupCols must be set — that is the leakage unit.")
    val df = inputs.head
    val ts = thresholds
    val k = key
    ts.zipWithIndex.map { case (hi, i) =>
      val lo = if (i == 0) None else Some(ts(i - 1))
      lo.foldLeft(df.where(k < lit(hi)))((d, l) => d.where(k >= lit(l)))
    }
  }

  /** The input plus `splitCol` holding the 0-based split index — the
    * single-table view of [[transform]] for pipelines that carry the
    * assignment as a column instead of separate tables. */
  def assign(df: DataFrame, splitCol: String = "split"): DataFrame = {
    require(getGroupCols.nonEmpty, "groupCols must be set — that is the leakage unit.")
    val ts = thresholds
    val k = key
    val expr = ts.init.zipWithIndex.reverse.foldLeft(lit(ts.length - 1)) {
      case (acc, (hi, i)) => when(k < lit(hi), i).otherwise(acc)
    }
    df.withColumn(splitCol, expr)
  }
}
object GroupedSplitter extends StageLoader[GroupedSplitter] {
  def load(spark: SparkSession, path: String): GroupedSplitter =
    ReadWrite.applyParams(new GroupedSplitter, path)
}
