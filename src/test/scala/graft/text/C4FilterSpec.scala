package graft.text

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** C4 cleaning rules (Raffel et al. 2020 §2.2). */
class C4FilterSpec extends SparkSpec {

  private def page(lines: String*): String = lines.mkString("\n")

  test("line rules: terminal punctuation, min words, javascript drop") {
    import spark.implicits._
    val df = Seq((1L, page(
      "This first sentence has enough words and punctuation.",
      "no terminal punctuation so this line drops",
      "Too short.",
      "Enable javascript to view this page properly.",
      "A second good sentence keeps the page alive!",
      "Is a question also terminal punctuation for line three?"
    ))).toDF("id", "text")
    val out = new C4Filter().setInputCol("text").transform(df).head
      .select("c4_text", "n_lines_kept", "n_sentences", "c4_keep").head()
    val kept = out.getString(0).split("\n")
    assert(kept.length == 3 && out.getInt(1) == 3)
    assert(!kept.exists(_.contains("javascript")))
    assert(!kept.exists(_ == "Too short."))
    assert(out.getInt(2) == 3) // . ! ?
    assert(out.getBoolean(3))
  }

  test("page rules: lorem ipsum, curly brace, min sentences") {
    import spark.implicits._
    val good = page(
      "The quick brown fox jumps over the lazy dog.",
      "A second sentence with plenty of words here.",
      "And a third sentence to clear the minimum bar.")
    val df = Seq(
      (1L, good),
      (2L, good + "\nBut lorem ipsum dolor sit amet poisons the page."),
      (3L, good + "\nfunction f() { return 1 }"),
      (4L, "Only one complete sentence with enough words here."),
      (5L, "")
    ).toDF("id", "text")
    val out = new C4Filter().setInputCol("text").transform(df).head
      .select("id", "c4_keep", "rule_not_banned", "rule_min_sentences")
      .collect().map(r => r.getLong(0) -> (r.getBoolean(1), r.getBoolean(2), r.getBoolean(3))).toMap
    assert(out(1L) == ((true, true, true)))
    assert(out(2L)._1 == false && out(2L)._2 == false)
    assert(out(3L)._1 == false && out(3L)._2 == false)
    assert(out(4L)._1 == false && out(4L)._3 == false) // one sentence < 3
    assert(out(5L)._1 == false)
  }

  test("closing double quote counts as terminal; params adjustable") {
    import spark.implicits._
    val df = Seq((1L, "He said the magic words were \"open sesame now.\"")).toDF("id", "text")
    val out = new C4Filter().setInputCol("text").setMinSentences(1)
      .transform(df).head.select("n_lines_kept", "c4_keep").head()
    assert(out.getInt(0) == 1 && out.getBoolean(1))
    val strict = new C4Filter().setInputCol("text").setMinLineWords(20)
      .transform(df).head.select("n_lines_kept").head()
    assert(strict.getInt(0) == 0)
  }

  test("param save/load round-trip") {
    val dir = tmpDir()
    new C4Filter().setInputCol("text").setMinLineWords(7)
      .setBannedSubstrings(Array("spam")).save(dir)
    val back = C4Filter.load(spark, dir)
    assert(back.getMinLineWords == 7)
    assert(back.getBannedSubstrings.toSeq == Seq("spam"))
  }
}
