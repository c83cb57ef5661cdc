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

  /** inputs = (raw corpus, target-domain corpus).
    *
    * Scoring is ONE pass over the raw corpus: the per-document bigram
    * explode happens once and BOTH models' count tables join against
    * the same exploded stream, with both log-prob folds running inside
    * one per-document aggregate. (The original shape scored raw twice —
    * one full NgramLmModel.transform per LM — then joined the two bits
    * tables and joined raw a third time; every per-position log-prob
    * and the position-ordered fold are reproduced here EXACTLY, so the
    * scores are bit-identical — the probability expressions mirror
    * NgramLmModel.transform and ImportanceScorerSpec + the q_dsir
    * oracles pin the parity.) */
  override def transform(inputs: DataFrame*): Array[DataFrame] = {
    require(inputs.size == 2, "ImportanceScorer expects (raw, target)")
    val Seq(raw, target) = inputs.toSeq
    require(!raw.columns.contains(getOutputCol),
      s"ImportanceScorer: raw input already has a ${getOutputCol} column")

    def fitLm(corpus: DataFrame): NgramLmModel =
      new NgramLm().setInputCol(getInputCol).setOutputCol("__lm")
        .setSmoothing(getSmoothing).setHashBuckets(getHashBuckets).fit(corpus)
    val tLm = fitLm(target)
    val rLm = fitLm(raw)

    val k = getSmoothing
    val id = getIdCol
    val words = NgramLm.tokens(col(getInputCol))
    val docBigrams = raw
      .select(col(id).as("__isid"), NgramLm.bigrams(words).as("__bgs"))
      .withColumn("__m", size(col("__bgs")))
      .select(col("__isid"), col("__m"),
        posexplode_outer(col("__bgs")).as(Seq("__p", "__bg")))

    // attach one LM's bigram / context count to the shared exploded
    // stream — the same joins NgramLmModel.transform builds, with
    // side-prefixed count columns so two LMs can ride one stream. The
    // two BIGRAM joins run back-to-back and the two CONTEXT joins run
    // back-to-back: all four key on the same expressions ((w1,w2) /
    // hash(w1,w2), then w1 / hash(w1)), so when the count tables are
    // too big to broadcast the sort-merge joins share ONE sort of the
    // stream per key instead of re-sorting per LM.
    def joinBg(df: DataFrame, m: NgramLmModel, pre: String): DataFrame = {
      val data = m.getModelData
      if (getHashBuckets > 0) {
        val b = getHashBuckets.toLong
        df.join(data(0).select(col("bg").as(s"${pre}bgk"), col("c").as(s"${pre}c")),
            pmod(xxhash64(col("__bg.w1"), col("__bg.w2")), lit(b)) === col(s"${pre}bgk"),
            "left")
          .drop(s"${pre}bgk")
      } else {
        df.join(data(0).select(col("w1").as(s"${pre}w1"), col("w2").as(s"${pre}w2"),
              col("c").as(s"${pre}c")),
            col("__bg.w1") === col(s"${pre}w1") && col("__bg.w2") === col(s"${pre}w2"),
            "left")
          .drop(s"${pre}w1", s"${pre}w2")
      }
    }
    def joinCtx(df: DataFrame, m: NgramLmModel, pre: String): DataFrame = {
      val data = m.getModelData
      if (getHashBuckets > 0) {
        val b = getHashBuckets.toLong
        df.join(data(2).select(col("ctx").as(s"${pre}ctxk"), col("c").as(s"${pre}ctx")),
            pmod(xxhash64(col("__bg.w1")), lit(b)) === col(s"${pre}ctxk"), "left")
          .drop(s"${pre}ctxk")
      } else {
        val contexts = data(0).groupBy(col("w1").as(s"${pre}w1k"))
          .agg(sum("c").as(s"${pre}ctx"))
        df.join(contexts, col("__bg.w1") === col(s"${pre}w1k"), "left")
          .drop(s"${pre}w1k")
      }
    }
    // P(w2|w1) = (c + k) / (ctx + k·V) — NgramLmModel.transform's logp,
    // per side; the __p-null guard masks the empty-doc row (and, in
    // hashed mode, its spurious bucket matches) exactly as there
    def logp(pre: String, vocab: Long) = log(2.0,
      (coalesce(col(s"${pre}c"), lit(0L)).cast("double") + k) /
        (coalesce(col(s"${pre}ctx"), lit(0L)).cast("double") + k * vocab))
    val tVocab = tLm.getModelData(1).head().getLong(0)
    val rVocab = rLm.getModelData(1).head().getLong(0)

    val joined = joinCtx(joinCtx(joinBg(joinBg(docBigrams, tLm, "__t"), rLm, "__r"),
        tLm, "__t"), rLm, "__r")
      .withColumn("__lt", when(col("__p").isNull, lit(null)).otherwise(logp("__t", tVocab)))
      .withColumn("__lr", when(col("__p").isNull, lit(null)).otherwise(logp("__r", rVocab)))
    // per-document position-ordered folds, both LMs from ONE collected
    // list (sort_array orders by __p — unique per doc — so each fold
    // adds the same values in the same order as the single-LM transform)
    val perDoc = joined
      .groupBy("__isid")
      .agg(max("__m").as("__m"),
        sort_array(collect_list(struct(col("__p"), col("__lt"), col("__lr"))))
          .as("__lps"))
      .select(col("__isid"), col("__m"),
        aggregate(col("__lps"), lit(0.0), (acc, x) => acc + x.getField("__lt")).as("__st"),
        aggregate(col("__lps"), lit(0.0), (acc, x) => acc + x.getField("__lr")).as("__sr"))
    val scores = perDoc.select(col("__isid"),
      (when(col("__m") < 1, lit(null)).otherwise(-col("__sr") / col("__m")) -
        when(col("__m") < 1, lit(null)).otherwise(-col("__st") / col("__m")))
        .as(getOutputCol))
    Array(raw.join(scores, raw(getIdCol) === scores("__isid"), "left").drop("__isid"))
  }
}

object ImportanceScorer extends StageLoader[ImportanceScorer] {
  def load(spark: SparkSession, path: String): ImportanceScorer =
    ReadWrite.applyParams(new ImportanceScorer, path)
}
