package graft.text

import graft.SparkSpec

class TextAnalysisSpec extends SparkSpec {

  test("TextQualityScorer: counts, ratios, and score components") {
    import spark.implicits._
    val df = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"), // 9 tokens, 2 stopwords
      (2L, "!!! ??? ..."),                                 // all punctuation
      (3L, "")).toDF("id", "text")
    val out = new TextQualityScorer().setInputCol("text").transform(df).head
      .select("id", "n_chars", "n_tokens", "stopword_ratio", "punct_ratio", "quality_score")
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4), r.getDouble(5))).toMap
    val (nc, nt, sw, _, q1) = out(1L)
    assert(nc == 43 && nt == 9)
    assert(math.abs(sw - 2.0 / 9) < 1e-12)
    // 9 tokens in [5,2000]=1, mean len in [2,12]=1, punct 0→1, stop 2/9*5 capped 1 → (1+1+1+1)/4
    assert(q1 == 1.0)
    val (_, nt2, _, pr2, q2) = out(2L)
    assert(nt2 == 3 && pr2 > 0.5 && q2 < 0.5)
    val (_, nt3, _, _, _) = out(3L)
    assert(nt3 == 0)
  }

  test("LanguageDetector: stopword profiles with und fallback") {
    import spark.implicits._
    val df = Seq(
      (1L, "the cat sat on the mat and it is happy"),
      (2L, "der hund ist nicht auf der couch und die katze"),
      (3L, "xyzzy plugh qwerty")).toDF("id", "text")
    val out = new LanguageDetector().setInputCol("text").transform(df).head
      .select("id", "detected_lang").collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out === Map(1L -> "en", 2L -> "de", 3L -> "und"))
  }

  test("TokenCounter: whitespace, BPE-ish, and chars/4 counts") {
    import spark.implicits._
    val df = Seq((1L, "hello world, it's 42!")).toDF("id", "text")
    val r = new TokenCounter().setInputCol("text").transform(df).head
      .select("n_ws_tokens", "n_bpe_tokens", "n_est_tokens").head()
    assert(r.getLong(0) == 4)
    // hello | world | , | it | ' | s | 42 | !
    assert(r.getLong(1) == 8)
    assert(r.getLong(2) == math.ceil(21 / 4.0).toLong)
  }

  test("ExactDeduplicator: normalization-equal docs share a canonical id") {
    import spark.implicits._
    val df = Seq(
      (10L, "Hello   World"),
      (11L, "hello world"),
      (12L, "something else")).toDF("id", "text")
    val out = new ExactDeduplicator().setIdCol("id").setInputCol("text")
      .transform(df).head
      .select("id", "canonical_id", "is_exact_duplicate")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2))).toSet
    assert(out === Set((10L, 10L, false), (11L, 10L, true), (12L, 12L, false)))
  }

  test("DocumentFingerprinter: winnowing guarantee, short-text empty, determinism") {
    import spark.implicits._
    val shared = "the quick brown fox jumps over the lazy dog"
    val df = Seq(
      (1L, s"AAAA $shared BBBB"),
      (2L, s"XXXX $shared YYYY"),   // shares a long substring with 1
      (3L, "completely different words here altogether"),
      (4L, "tiny")                  // shorter than k → empty
    ).toDF("id", "text")
    val out = new DocumentFingerprinter().setK(5).setWindowSize(4)
      .setInputCol("text").setOutputCol("fp")
      .transform(df).head
      .select("id", "fp").collect()
      .map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    // two docs sharing a substring of length >= k + w - 1 share a fingerprint
    assert(out(1L).toSet.intersect(out(2L).toSet).nonEmpty)
    assert(out(1L).toSet.intersect(out(3L).toSet).isEmpty)
    assert(out(4L).isEmpty)
    // sorted distinct
    assert(out(1L) == out(1L).distinct.sorted)
    // deterministic across evaluations
    val again = new DocumentFingerprinter().setK(5).setWindowSize(4)
      .setInputCol("text").setOutputCol("fp")
      .transform(df).head.select("id", "fp").collect()
      .map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    assert(again == out)
  }
}
