package graft.text

import graft.SparkSpec
import org.apache.spark.sql.functions._

class AnchorTextRollupSpec extends SparkSpec {

  private def rows(df: org.apache.spark.sql.DataFrame): Set[(String, String, Long, Int)] =
    df.select("d", "a_text", "a_count", "a_rank").collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getInt(3))).toSet

  test("counts, deterministic ranks, lowercase merge, null/empty drops") {
    import spark.implicits._
    val df = Seq(
      ("ex.com", "Home"), ("ex.com", "home"), ("ex.com", "  home "),
      ("ex.com", "docs"), ("ex.com", "blog"),
      ("ex.com", ""), ("ex.com", "   "), (null, "orphan"),
      ("other.org", "x")).toDF("d", "t")
    val got = rows(new AnchorTextRollup()
      .setTargetCol("d").setTextCol("t").setOutputCol("a").setTopK(2)
      .transform(df).head)
    // 'home' rolls up 3 spellings; the count-1 tie between blog/docs
    // breaks ascending by text, and topK=2 keeps only blog
    assert(got == Set(
      ("ex.com", "home", 3L, 1),
      ("ex.com", "blog", 1L, 2),
      ("other.org", "x", 1L, 1)))
  }

  test("lowercase=false keeps spellings distinct; minCount prunes before ranking") {
    import spark.implicits._
    val df = Seq(
      ("d", "Home"), ("d", "Home"), ("d", "home"),
      ("d", "rare")).toDF("d", "t")
    val keep = new AnchorTextRollup().setTargetCol("d").setTextCol("t")
      .setOutputCol("a").setLowercase(false).setTopK(10)
    assert(rows(keep.transform(df).head) == Set(
      ("d", "Home", 2L, 1), ("d", "home", 1L, 2), ("d", "rare", 1L, 3)))
    // minCount=2 removes the count-1 texts, so ranks compact
    assert(rows(keep.setMinCount(2).transform(df).head) ==
      Set(("d", "Home", 2L, 1)))
  }

  test("saltBuckets pre-ranking returns the identical top-k") {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    val df = Seq.fill(5000)(
      (s"d${rnd.nextInt(7)}", s"t${rnd.nextInt(40)}")).toDF("d", "t")
    val base = new AnchorTextRollup().setTargetCol("d").setTextCol("t")
      .setOutputCol("a").setTopK(5)
    val plain = rows(base.transform(df).head)
    val salted = rows(base.setSaltBuckets(8).transform(df).head)
    assert(salted == plain)
  }

  test("composes on LinkGraphExtractor defaults (lk_domain / lk_text)") {
    import spark.implicits._
    val pages = Seq(
      ("https://a.example.com/", "<a href=\"https://t.example.org/\">Docs</a>" +
        "<a href=\"https://t.example.org/x\">docs</a>"),
      ("https://b.example.com/", "<a href=\"https://t.example.org/y\">API</a>"))
      .toDF("url", "html")
    val links = new LinkGraphExtractor()
      .setInputCol("html").setUrlCol("url").setOutputCol("lk")
      .transform(pages).head
    val got = new AnchorTextRollup().setOutputCol("a").setTopK(1)
      .transform(links).head
      .select("lk_domain", "a_text", "a_count", "a_rank").collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getInt(3))).toSet
    assert(got == Set(("example.org", "docs", 2L, 1)))
  }

  test("param save/load round-trip") {
    val dir = java.nio.file.Files.createTempDirectory("anchortext").toString
    new AnchorTextRollup().setTargetCol("tg").setTextCol("tx").setOutputCol("o")
      .setTopK(3).setMinCount(2).setLowercase(false).setSaltBuckets(4).save(dir)
    val loaded = AnchorTextRollup.load(spark, dir)
    assert(loaded.getTargetCol == "tg" && loaded.getTextCol == "tx" &&
      loaded.getOutputCol == "o" && loaded.getTopK == 3 &&
      loaded.getMinCount == 2 && !loaded.getLowercase &&
      loaded.getSaltBuckets == 4)
  }
}
