package graft.text

import graft.SparkSpec
import org.apache.spark.sql.functions._

class FrequentNgramsSpec extends SparkSpec {
  import spark.implicits._

  test("param defaults and round-trip") {
    val f = new FrequentNgrams()
    assert(f.getN == 3 && f.getMinCount == 100L && f.getStrategy == "auto")
    val dir = tmpDir()
    f.setN(2).setMinCount(5L).setStrategy("sketch").setInputCol("toks").save(dir)
    val back = FrequentNgrams.load(spark, dir)
    assert(back.getN == 2 && back.getMinCount == 5L && back.getStrategy == "sketch")
  }

  test("exact counts on a known corpus") {
    val df = Seq(
      "the quick brown fox",
      "the quick brown dog",
      "a quick brown fox ran",
      "the slow brown fox").toDF("text")
      .select(split(col("text"), " ").as("toks"))
    val out = new FrequentNgrams().setN(2).setMinCount(2L).setStrategy("exact")
      .setInputCol("toks").transform(df).head
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(out == Map("the quick" -> 2L, "quick brown" -> 3L, "brown fox" -> 3L))
  }

  test("short and empty rows contribute nothing (no inverted-slice grams)") {
    val df = Seq(Seq("a", "b"), Seq("x"), Seq.empty[String], Seq("a", "b", "c"))
      .toDF("toks")
    val out = new FrequentNgrams().setN(3).setMinCount(1L).setStrategy("exact")
      .setInputCol("toks").transform(df).head.collect()
    assert(out.map(_.getString(0)).toSet == Set("a b c"))
  }

  test("sketch output is identical to exact (randomized corpus, many partitions)") {
    val rnd = new scala.util.Random(42)
    // Zipf-ish: popular tokens repeat a lot, tail is unique
    val docs = (0 until 400).map { i =>
      (0 until 30).map { _ =>
        val r = rnd.nextInt(100)
        if (r < 40) s"tok${rnd.nextInt(5)}" else s"rare${rnd.nextInt(2000)}"
      }.mkString(" ")
    }
    val df = docs.toDF("text").repartition(8)
      .select(split(col("text"), " ").as("toks"))
    val base = new FrequentNgrams().setN(2).setMinCount(4L).setInputCol("toks")
    val exact = base.setStrategy("exact").transform(df).head
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    val sketch = base.setStrategy("sketch").setSketchBudget(1 << 21)
      .transform(df).head
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    assert(exact.nonEmpty)
    assert(sketch == exact)
  }

  test("sketch keeps a threshold gram spread thinly across partitions") {
    // "needle x" occurs exactly minCount times, one per partition slice,
    // drowned in per-partition noise — recall must still be 1.
    val minCount = 8L
    val noise = (0 until 4000).map(i => s"n$i n${i + 1} end$i")
    val needles = (0 until minCount.toInt).map(_ => "needle x filler")
    val df = (noise ++ needles).toDF("text").repartition(8)
      .select(split(col("text"), " ").as("toks"))
    val out = new FrequentNgrams().setN(2).setMinCount(minCount)
      .setStrategy("sketch").setInputCol("toks").transform(df).head
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(out("needle x") == minCount)
  }

  test("sketch refuses when the candidate bound exceeds the budget") {
    val df = Seq.fill(100)("a b c d e f g h").toDF("text")
      .select(split(col("text"), " ").as("toks"))
    val err = intercept[IllegalArgumentException] {
      new FrequentNgrams().setN(2).setMinCount(2L).setStrategy("sketch")
        .setSketchBudget(10).setInputCol("toks").transform(df)
    }
    assert(err.getMessage.contains("sketchBudget"))
  }

  test("lossySurvivors: heavy item always survives one partition pass") {
    val heavy = Iterator.fill(50)("HOT")
    val noise = (0 until 5000).iterator.map(i => s"u$i")
    // interleave
    val stream = noise.grouped(100).zip(heavy.grouped(1))
      .flatMap { case (a, b) => a ++ b }
    val out = FrequentNgrams.lossySurvivors(stream, w = 200L).toSet
    assert(out.contains("HOT"))
  }
}
