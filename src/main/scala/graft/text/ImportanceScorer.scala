package graft.text

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.api.{AlgoOperator, StageLoader}
import graft.param._
import graft.util.ReadWrite

/**
 * DSIR-style importance scoring for data selection (Xie et al. 2023,
 * "Data Selection for Language Models via Importance Resampling"):
 * score every RAW-corpus document by the log-likelihood ratio of its
 * text under a TARGET-domain language model vs the raw-corpus language
 * model. DSIR's hashed-n-gram bag-of-ngrams LM is here the engine's
 * [[NgramLm]] (add-k–smoothed bigram model — same family, exact and
 * oracle-replayable); the per-document score is in bits per bigram:
 *
 *   score = bits_raw − bits_target
 *         = (1/m)·Σ log2 p_target(w2|w1) − (1/m)·Σ log2 p_raw(w2|w1)
 *
 * Positive score = the document looks more like the target domain than
 * like the average raw document — DSIR keeps the highest-scoring (or
 * importance-resamples with Gumbel noise; a deterministic top-N over
 * this score is the noise-free variant).
 *
 * `transform(raw, target)` — the reference's multi-input
 * AlgoOperator signature (AlgoOperator.java:38) — appends
 * `<outputCol>` (the score; null when the document has no bigrams)
 * to every raw row.
 *
 * Scale shape (100 TB design): two NgramLm fits (groupBy bigram with
 * map-side partial aggregation — the target side is small by
 * definition) and two scoring passes over the raw corpus (explode →
 * equi-join on the bigram → per-doc fold); no driver materialization
 * beyond each LM's vocab scalar, no sort. At web scale set
 * `hashBuckets` (e.g. 1 << 22): the raw-corpus LM's exact bigram
 * vocabulary is unbounded, and hashing bounds both count tables to
 * ≤ hashBuckets rows — small enough to broadcast-join the scoring
 * passes instead of shuffling the exploded corpus. Selection on top is the
 * caller's: a threshold filter is shuffle-free; top-N compiles to
 * TakeOrdered.
 *
 * No reference counterpart — beyond-reference LLM-data-pipeline tier.
 */
class ImportanceScorer extends AlgoOperator[ImportanceScorer]
    with HasInputCol[ImportanceScorer] with HasOutputCol[ImportanceScorer] {

  final val idCol: Param[String] =
    param[String]("idCol", "Unique document id column in the raw input.", "id")
  def getIdCol: String = get(idCol)
  def setIdCol(v: String): ImportanceScorer = set(idCol, v)

  final val smoothing: Param[Double] =
    param[Double]("smoothing", "Add-k smoothing constant for both language models.", 0.1,
      ParamValidators.gt(0))
  def getSmoothing: Double = get(smoothing)
  def setSmoothing(v: Double): ImportanceScorer = set(smoothing, v)

  /** DSIR's actual construction hashes n-grams into a fixed feature
    * space (Xie et al. 2023 §2) precisely because the exact raw-corpus
    * bigram vocabulary is unbounded at web scale. > 0 bounds BOTH LMs
    * to ≤ hashBuckets rows per count table; 0 keeps exact keys. */
  final val hashBuckets: Param[Int] =
    param[Int]("hashBuckets", "When > 0, hash both LMs' n-gram keys into this many " +
      "buckets (bounded model tables); 0 = exact.", 0, ParamValidators.gtEq(0))
  def getHashBuckets: Int = get(hashBuckets)
  def setHashBuckets(v: Int): ImportanceScorer = set(hashBuckets, v)

  /** inputs = (raw corpus, target-domain corpus). */
  override def transform(inputs: DataFrame*): Array[DataFrame] = {
    require(inputs.size == 2, "ImportanceScorer expects (raw, target)")
    val Seq(raw, target) = inputs.toSeq
    require(!raw.columns.contains(getOutputCol),
      s"ImportanceScorer: raw input already has a ${getOutputCol} column")

    def bits(corpus: DataFrame, scoreCol: String): DataFrame = {
      val lm = new NgramLm().setInputCol(getInputCol).setOutputCol(scoreCol)
        .setSmoothing(getSmoothing).setHashBuckets(getHashBuckets).fit(corpus)
      lm.setIdCol(getIdCol).transform(raw).head
        .select(col(getIdCol).as("__isid"), col(scoreCol + "_bits").as(scoreCol))
    }
    val t = bits(target, "__t")
    val r = bits(raw, "__r")
    val scores = t.join(r.withColumnRenamed("__isid", "__isid2"),
        col("__isid") === col("__isid2"))
      .select(col("__isid"), (col("__r") - col("__t")).as(getOutputCol))
    Array(raw.join(scores, raw(getIdCol) === scores("__isid"), "left").drop("__isid"))
  }
}

object ImportanceScorer extends StageLoader[ImportanceScorer] {
  def load(spark: SparkSession, path: String): ImportanceScorer =
    ReadWrite.applyParams(new ImportanceScorer, path)
}
