package graft.text

import graft.SparkSpec

class TextFiltersSpec extends SparkSpec {

  test("RepetitionStats: distinct/top-word/dup-ngram fractions") {
    import spark.implicits._
    val df = Seq(
      (1L, "a a a a b"),          // 5 words, 2 distinct, mode=4
      (2L, "x y z"),              // all distinct
      (3L, "go go go go"),        // one word repeated
      (4L, "solo"),               // single word: no 2-grams
      (5L, "")).toDF("id", "text")
    val out = new RepetitionStats().setInputCol("text").transform(df).head
      .select("id", "n_words", "distinct_word_ratio", "top_word_fraction",
        "dup_2gram_fraction", "dup_3gram_fraction")
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4), r.getDouble(5))).toMap

    val (n1, d1, t1, g21, g31) = out(1L)
    assert(n1 == 5 && math.abs(d1 - 0.4) < 1e-12 && math.abs(t1 - 0.8) < 1e-12)
    // 2-grams: [a a, a a, a a, a b] -> 2 distinct of 4 -> dup 0.5
    assert(math.abs(g21 - 0.5) < 1e-12)
    // 3-grams: [a a a, a a a, a a b] -> 2 distinct of 3 -> dup 1/3
    assert(math.abs(g31 - 1.0 / 3) < 1e-12)

    val (_, d2, t2, g22, _) = out(2L)
    assert(d2 == 1.0 && math.abs(t2 - 1.0 / 3) < 1e-12 && g22 == 0.0)

    val (_, _, t3, g23, g33) = out(3L)
    assert(t3 == 1.0 && g23 > 0.6 && g33 == 0.5)

    val (n4, d4, _, g24, g34) = out(4L)
    assert(n4 == 1 && d4 == 1.0 && g24 == 0.0 && g34 == 0.0)

    val (n5, d5, t5, _, _) = out(5L)
    assert(n5 == 0 && d5 == 0.0 && t5 == 0.0)
  }

  test("PiiRedactor: emails, IPs, phones redacted in order with counts") {
    import spark.implicits._
    val df = Seq(
      (1L, "mail bob.smith+x@corp.example.com and 192.168.0.1 then +1 555 123 4567 done"),
      (2L, "no pii here at all"),
      (3L, "two mails a@b.io c@d.org one ip 10.0.0.255")).toDF("id", "text")
    val out = new PiiRedactor().setInputCol("text").setOutputCol("red")
      .transform(df).head
      .select("id", "red", "n_emails", "n_ips", "n_phones")
      .collect().map(r => r.getLong(0) ->
        (r.getString(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap

    val (r1, e1, i1, p1) = out(1L)
    assert(e1 == 1 && i1 == 1 && p1 == 1, s"counts: $e1 $i1 $p1")
    assert(r1 == "mail <EMAIL> and <IP> then <PHONE> done", r1)

    val (r2, e2, i2, p2) = out(2L)
    assert(r2 == "no pii here at all" && e2 == 0 && i2 == 0 && p2 == 0)

    val (r3, e3, i3, _) = out(3L)
    assert(e3 == 2 && i3 == 1)
    assert(r3 == "two mails <EMAIL> <EMAIL> one ip <IP>", r3)
  }

  test("Bm25Scorer: scores match a hand-computed corpus") {
    import spark.implicits._
    val df = Seq(
      (1L, "cat dog cat"),
      (2L, "dog dog dog dog"),
      (3L, "bird song"),
      (4L, "")).toDF("id", "text")
    val out = new Bm25Scorer().setInputCol("text").setIdCol("id")
      .setOutputCol("score").setQueryTerms("cat", "dog")
      .transform(df).head
      .select("id", "score").collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap

    // N=4, dls = 3,4,2,0, avgdl = 9/4 = 2.25, k1=1.2, b=0.75
    val (k1, b, avgdl, n) = (1.2, 0.75, 2.25, 4.0)
    def idf(dfq: Double) = math.log(1.0 + (n - dfq + 0.5) / (dfq + 0.5))
    def term(tf: Double, dl: Double, dfq: Double) =
      idf(dfq) * tf * (k1 + 1) / (tf + k1 * (1 - b + b * dl / avgdl))
    val exp1 = term(2, 3, 1) + term(1, 3, 2) // cat df=1, dog df=2
    val exp2 = term(4, 4, 2)
    assert(math.abs(out(1L) - exp1) < 1e-12, s"${out(1L)} vs $exp1")
    assert(math.abs(out(2L) - exp2) < 1e-12)
    assert(out(3L) == 0.0 && out(4L) == 0.0)
  }

  test("param save/load round-trips") {
    val dir = java.nio.file.Files.createTempDirectory("graft-textfilters").toString
    val pii = new PiiRedactor().setInputCol("t").setOutputCol("r")
    pii.save(s"$dir/pii")
    assert(PiiRedactor.load(spark, s"$dir/pii").getOutputCol == "r")
    val bm = new Bm25Scorer().setInputCol("t").setIdCol("doc_id")
      .setQueryTerms("x", "y").setK1(2.0).setB(0.5)
    bm.save(s"$dir/bm")
    val bm2 = Bm25Scorer.load(spark, s"$dir/bm")
    assert(bm2.getQueryTerms.toSeq == Seq("x", "y") && bm2.getK1 == 2.0 && bm2.getB == 0.5)
    val rep = new RepetitionStats().setInputCol("t")
    rep.save(s"$dir/rep")
    assert(RepetitionStats.load(spark, s"$dir/rep").getInputCol == "t")
  }
}
