package graft.text

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** DSIR importance scoring: log-likelihood ratio under target vs raw
  * bigram LMs (Xie et al. 2023). */
class ImportanceScorerSpec extends SparkSpec {

  private def corpus = {
    import spark.implicits._
    Seq(
      (0L, "the cat sat on the mat", "target"),
      (1L, "the cat ate the fish", "target"),
      (2L, "der hund lief durch den park", "other"),
      (3L, "el gato come pescado fresco hoy", "other"),
      (4L, "the cat sat on the fish", "raw"),      // target-like
      (5L, "der hund come on den mat", "raw"),     // mixed
      (6L, "zzz", "raw"))                          // single token: no bigrams
      .toDF("id", "text", "kind")
  }

  private def scorer = new ImportanceScorer()
    .setInputCol("text").setOutputCol("dsir").setIdCol("id")

  test("target-like documents score higher than off-domain ones; no-bigram docs get null") {
    val target = corpus.where(col("kind") === "target")
    val out = scorer.transform(corpus, target).head
      .select("id", "dsir").collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getDouble(1)))).toMap
    assert(out(6L).isEmpty, "single-token doc must score null")
    // the target-like raw doc beats the mixed one and the off-domain ones
    assert(out(4L).get > out(5L).get, s"${out(4L)} vs ${out(5L)}")
    assert(out(4L).get > out(2L).get && out(4L).get > out(3L).get)
    // documents IN the target set score positive (they define the target LM)
    assert(out(0L).get > 0 && out(1L).get > 0)
  }

  test("score equals the two NgramLm bits subtracted (composition identity)") {
    val target = corpus.where(col("kind") === "target")
    val t = new NgramLm().setInputCol("text").setOutputCol("t").setSmoothing(0.1)
      .fit(target).setIdCol("id").transform(corpus).head.select(col("id"), col("t_bits"))
    val r = new NgramLm().setInputCol("text").setOutputCol("r").setSmoothing(0.1)
      .fit(corpus).setIdCol("id").transform(corpus).head
      .select(col("id").as("id2"), col("r_bits"))
    val want = t.join(r, col("id") === col("id2"))
      .select(col("id"), (col("r_bits") - col("t_bits")).as("w"))
      .where(col("w").isNotNull)
      .collect().map(x => x.getLong(0) -> x.getDouble(1)).toMap
    val got = scorer.transform(corpus, target).head
      .where(col("dsir").isNotNull)
      .select("id", "dsir").collect().map(x => x.getLong(0) -> x.getDouble(1)).toMap
    assert(got.keySet == want.keySet)
    got.foreach { case (k, v) => assert(math.abs(v - want(k)) < 1e-12, k.toString) }
  }

  test("guards: arity and output-column collision") {
    intercept[IllegalArgumentException] { scorer.transform(corpus) }
    val clash = corpus.withColumn("dsir", lit(1.0))
    val ex = intercept[IllegalArgumentException] {
      scorer.transform(clash, clash.where(col("kind") === "target"))
    }
    assert(ex.getMessage.contains("dsir"), ex.getMessage)
  }

  test("param save/load round-trip") {
    val dir = tmpDir()
    scorer.setSmoothing(0.5).save(dir)
    val back = ImportanceScorer.load(spark, dir)
    assert(back.getIdCol == "id" && back.getSmoothing == 0.5 &&
      back.getOutputCol == "dsir")
  }
}
