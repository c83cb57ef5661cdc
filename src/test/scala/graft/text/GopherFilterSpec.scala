package graft.text

import graft.SparkSpec

/** Gopher quality rules (Rae et al. 2021 Appendix A). */
class GopherFilterSpec extends SparkSpec {

  private def filter = new GopherFilter().setInputCol("text")
    .setMinWords(5).setMaxWords(20)

  private def run(rows: (Long, String)*): Map[Long, org.apache.spark.sql.Row] = {
    import spark.implicits._
    filter.transform(rows.toSeq.toDF("id", "text")).head
      .collect().map(r => r.getLong(0) -> r).toMap
  }

  private def b(r: org.apache.spark.sql.Row, name: String): Boolean =
    r.getBoolean(r.fieldIndex(name))

  test("each rule fires on its designed violation and only there") {
    val out = run(
      (0L, "the cat and the dog have dinner with all of that food"), // clean
      (1L, "the cat and dog"),                                       // too few words
      (2L, "a b c d e f g h i j the of"),                            // mean word len < 3
      (3L, "the # cat # and # the # dog # have # some # of # it"),   // symbol ratio
      (4L, "- the first item\n- the second item\n- some of them"),   // all bullet lines
      (5L, "the start of it...\nthe middle of it...\nthe end here"), // 2/3 ellipsis lines
      (6L, "the 11 22 33 44 55 66 77 88 99 00 of one"),              // alpha ratio low
      (7L, "uno dos tres cuatro cinco seis siete ocho nueve diez"))  // no stopwords
    assert(b(out(0L), "gopher_keep"), out(0L).toString)
    assert(!b(out(1L), "rule_word_count") && !b(out(1L), "gopher_keep"))
    assert(!b(out(2L), "rule_mean_word_len"))
    assert(!b(out(3L), "rule_symbol_ratio"), out(3L).toString)
    assert(!b(out(4L), "rule_bullet_lines"), out(4L).toString)
    assert(!b(out(5L), "rule_ellipsis_lines"), out(5L).toString)
    assert(!b(out(6L), "rule_alpha_words"), out(6L).toString)
    assert(!b(out(7L), "rule_stopwords") && !b(out(7L), "gopher_keep"))
    // the clean doc passes every individual rule
    Seq("rule_word_count", "rule_mean_word_len", "rule_symbol_ratio", "rule_bullet_lines",
      "rule_ellipsis_lines", "rule_alpha_words", "rule_stopwords")
      .foreach(rule => assert(b(out(0L), rule), rule))
  }

  test("empty text fails closed (no NaN/null keep flags)") {
    val out = run((0L, ""), (1L, "   "))
    Seq(0L, 1L).foreach { id =>
      assert(!b(out(id), "gopher_keep"))
      assert(!out(id).anyNull, out(id).toString)
    }
  }

  test("unicode ellipsis and bullets count like their ASCII forms") {
    val out = run(
      (0L, "the start of it…\nthe middle of it…\nthe end of it here"),
      (1L, "• the first of them\n• the second of them\n• the third one"))
    assert(!b(out(0L), "rule_ellipsis_lines"), out(0L).toString)
    assert(!b(out(1L), "rule_bullet_lines"), out(1L).toString)
  }

  test("the whole pass is shuffle-free (no Exchange in the plan)") {
    import spark.implicits._
    val plan = filter.transform(Seq((1L, "the of and")).toDF("id", "text")).head
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan)
  }

  test("param save/load round-trip") {
    val dir = tmpDir()
    filter.setMinStopwordHits(3).setMaxSymbolRatio(0.2).save(dir)
    val back = GopherFilter.load(spark, dir)
    assert(back.getMinWords == 5 && back.getMinStopwordHits == 3 &&
      back.getMaxSymbolRatio == 0.2)
  }
}
