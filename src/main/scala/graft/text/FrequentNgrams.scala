package graft.text

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.api.{AlgoOperator, StageLoader}
import graft.param._
import graft.util.ReadWrite

/**
 * Corpus-wide frequent n-gram mining (heavy hitters): every `n`-token
 * gram occurring at least `minCount` times across the whole corpus,
 * with its exact count — the discovery pass that feeds boilerplate
 * removal ([[LineDeduplicator]]), contamination screens
 * ([[graft.dedup.Decontaminator]]) and template detection.
 *
 * Input: a token-array column (compose with Tokenizer/RegexTokenizer).
 * Output: one table (gram, cnt), exact, cnt ≥ minCount.
 *
 * Two physical strategies, identical output:
 *  - `exact`: in-row gram expansion → groupBy(gram).count — Spark's
 *    partial hash aggregation does the map-side combine; the shuffle
 *    carries every distinct gram. Right whenever the distinct-gram
 *    set is shuffle-sized.
 *  - `sketch`: Manku–Motwani lossy counting per partition with
 *    ε = minCount/(2·N) (N = total gram count, one cheap agg job).
 *    Σ_p εN_p = minCount/2 < minCount, so any gram with global count
 *    ≥ minCount has count_p > εN_p in at least one partition and
 *    SURVIVES that partition's sketch — recall 1 by construction.
 *    The surviving candidate set (≤ ~2N/minCount entries corpus-wide)
 *    is broadcast back and only candidate grams enter the exact
 *    recount shuffle. At 100 TB this turns a
 *    billions-of-distinct-grams shuffle into (candidate-only count)
 *    + one broadcast, when minCount/N is large enough for the
 *    candidate set to fit the broadcast budget.
 *  - `auto` (default): sketch when its candidate bound 2N/minCount ≤
 *    `sketchBudget` (per-partition map entries), else exact.
 *
 * No reference counterpart — beyond-reference LLM-data-pipeline tier.
 */
class FrequentNgrams extends AlgoOperator[FrequentNgrams]
    with HasInputCol[FrequentNgrams] {

  final val n: Param[Int] =
    param[Int]("n", "Gram length in tokens.", 3, ParamValidators.gt(0))
  def getN: Int = get(n)
  def setN(v: Int): FrequentNgrams = set(n, v)

  final val minCount: Param[Long] =
    param[Long]("minCount", "Minimum corpus-wide occurrences to report.",
      100L, ParamValidators.gt(0))
  def getMinCount: Long = get(minCount)
  def setMinCount(v: Long): FrequentNgrams = set(minCount, v)

  final val strategy: Param[String] =
    param[String]("strategy", "exact | sketch | auto.",
      "auto", ParamValidators.inArray("exact", "sketch", "auto"))
  def getStrategy: String = get(strategy)
  def setStrategy(v: String): FrequentNgrams = set(strategy, v)

  final val sketchBudget: Param[Int] =
    param[Int]("sketchBudget",
      "Candidate-set bound for the sketch strategy (per-partition map entries).",
      1 << 21, ParamValidators.gt(0))
  def getSketchBudget: Int = get(sketchBudget)
  def setSketchBudget(v: Int): FrequentNgrams = set(sketchBudget, v)

  override def transform(inputs: DataFrame*): Array[DataFrame] = {
    require(inputs.size == 1)
    val df = inputs.head
    val win = getN
    // guard: sequence(0, negative) DESCENDS in Spark, so short rows must
    // yield an empty gram array, not inverted slices
    val grams = df.select(explode(expr(
      s"CASE WHEN size(${getInputCol}) >= $win THEN " +
        s"transform(sequence(0, size(${getInputCol}) - $win), i -> array_join(slice(${getInputCol}, i + 1, $win), ' ')) " +
        s"ELSE array() END"))
      .as("gram"))

    def exactCount(g: DataFrame): DataFrame =
      g.groupBy("gram").agg(count(lit(1)).as("cnt")).where(col("cnt") >= getMinCount)

    val pick = getStrategy match {
      case "exact" => "exact"
      case s =>
        // N: one agg job over in-row sizes — no explode, no shuffle of grams
        val nGrams = df.agg(sum(greatest(size(col(getInputCol)) - (win - 1), lit(0))))
          .head.getLong(0)
        val feasible = nGrams > 0 && 2.0 * nGrams / getMinCount <= getSketchBudget.toDouble
        if (s == "sketch") {
          require(feasible, s"sketch needs sketchBudget >= 2N/minCount = ${2.0 * nGrams / getMinCount}; " +
            s"raise sketchBudget/minCount or use strategy=exact")
          "sketch"
        } else if (feasible) "sketch" else "exact"
    }

    val out = if (pick == "exact") exactCount(grams) else {
      val spark = df.sparkSession
      import spark.implicits._
      val nGrams = df.agg(sum(greatest(size(col(getInputCol)) - (win - 1), lit(0))))
        .head.getLong(0)
      // bucket width w = ceil(1/ε), ε = minCount/(2N)
      val w = math.max(1L, math.ceil(2.0 * nGrams / getMinCount).toLong)
      val candidates = grams.as[String].mapPartitions { it =>
        FrequentNgrams.lossySurvivors(it, w)
      }.toDF("gram").distinct()
      // candidate set is bounded (~2N/minCount corpus-wide before distinct);
      // broadcast it so only candidate grams reach the recount shuffle
      exactCount(grams.join(broadcast(candidates), Seq("gram"), "leftsemi"))
    }
    Array(out)
  }
}

object FrequentNgrams extends StageLoader[FrequentNgrams] {
  def load(spark: SparkSession, path: String): FrequentNgrams =
    ReadWrite.applyParams(new FrequentNgrams, path)

  /** One partition's Manku–Motwani lossy counting pass: bucket width `w`
    * (= ceil(1/ε)); returns the grams still tracked at partition end.
    * Guarantee used by the caller: any item with partition count > N_p/w
    * is still tracked (its stored count + Δ can't fall to the eviction
    * floor before the stream ends). */
  private[text] def lossySurvivors(it: Iterator[String], w: Long): Iterator[String] = {
    val counts = new java.util.HashMap[String, Array[Long]]() // (count, delta)
    var processed = 0L
    var bucket = 1L
    while (it.hasNext) {
      val g = it.next()
      processed += 1
      val e = counts.get(g)
      if (e != null) e(0) += 1
      else counts.put(g, Array(1L, bucket - 1))
      if (processed % w == 0) {
        bucket += 1
        val iter = counts.entrySet().iterator()
        while (iter.hasNext) {
          val en = iter.next()
          if (en.getValue()(0) + en.getValue()(1) < bucket) iter.remove()
        }
      }
    }
    import scala.jdk.CollectionConverters._
    counts.keySet().iterator().asScala
  }
}
