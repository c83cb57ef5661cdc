package graft.join

import graft.SparkSpec

class FuzzyJoinerSpec extends SparkSpec {

  private def joiner = new FuzzyJoiner().setIdCol("id").setInputCol("s")

  private def lev(a: String, b: String): Int = {
    val d = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
      if (i == 0) j else if (j == 0) i else 0
    }
    for (i <- 1 to a.length; j <- 1 to b.length)
      d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
        d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
    d(a.length)(b.length)
  }

  test("hand-checked pairs at k=1: substitutions, indels, misses") {
    import spark.implicits._
    val l = Seq((1L, "kitten"), (2L, "flaw"), (3L, "abc")).toDF("id", "s")
    val r = Seq((10L, "mitten"), (11L, "flaws"), (12L, "xyz"), (13L, "kittin"))
      .toDF("id", "s")
    val out = joiner.setMaxDistance(1).transform(l, r).head
      .collect().map(x => (x.getLong(0), x.getLong(1), x.getInt(2))).toSet
    assert(out == Set((1L, 10L, 1), (1L, 13L, 1), (2L, 11L, 1)))
  }

  test("differential vs brute force on random strings (both paths exercised)") {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    def word(): String = {
      val n = 1 + rnd.nextInt(12) // 1..12 chars: spans short AND gram zones
      Array.fill(n)(('a' + rnd.nextInt(4)).toChar).mkString // small alphabet -> dense matches
    }
    val ls = (0 until 80).map(i => (i.toLong, word()))
    val rs = (0 until 80).map(i => (i.toLong + 1000, word()))
    val expected = (for {
      (li, lsr) <- ls; (ri, rsr) <- rs
      d = lev(lsr, rsr) if d <= 2
    } yield (li, ri, d)).toSet
    val got = joiner.setMaxDistance(2).setGramLength(2)
      .transform(ls.toDF("id", "s"), rs.toDF("id", "s")).head
      .collect().map(x => (x.getLong(0), x.getLong(1), x.getInt(2))).toSet
    assert(got == expected,
      s"missing=${(expected -- got).take(5)} extra=${(got -- expected).take(5)}")
  }

  test("k=0 degenerates to exact string equality") {
    import spark.implicits._
    val l = Seq((1L, "same"), (2L, "other")).toDF("id", "s")
    val r = Seq((10L, "same"), (11L, "sams")).toDF("id", "s")
    val out = joiner.setMaxDistance(0).transform(l, r).head
      .collect().map(x => (x.getLong(0), x.getLong(1))).toSet
    assert(out == Set((1L, 10L)))
  }

  test("gram-3 differential on longer strings") {
    import spark.implicits._
    val base = "connecticut avenue northwest"
    val l = Seq((1L, base)).toDF("id", "s")
    val r = Seq((10L, base), (11L, base.replace("avenue", "avenoo")),
      (12L, "completely different street"), (13L, base + " apt 4")).toDF("id", "s")
    val out = joiner.setMaxDistance(3).setGramLength(3).transform(l, r).head
      .collect().map(x => (x.getLong(1), x.getInt(2))).toMap
    assert(out == Map(10L -> 0, 11L -> 2))
  }

  test("self-join fast path equals the two-sided path on identical inputs") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    def word(): String = {
      val n = 1 + rnd.nextInt(12) // spans the short AND gram zones
      Array.fill(n)(('a' + rnd.nextInt(4)).toChar).mkString
    }
    val rows = (0 until 80).map(i => (i.toLong, word()))
    val df = rows.toDF("id", "s")
    val j = joiner.setMaxDistance(2).setGramLength(2)
    // same object -> shared-table fast path
    val self = j.transform(df, df).head
      .collect().map(x => (x.getLong(0), x.getLong(1), x.getInt(2))).toSet
    // equal-but-distinct objects -> the general two-sided path
    val twoSided = j.transform(df, rows.toDF("id", "s")).head
      .collect().map(x => (x.getLong(0), x.getLong(1), x.getInt(2))).toSet
    assert(self == twoSided,
      s"missing=${(twoSided -- self).take(5)} extra=${(self -- twoSided).take(5)}")
  }

  test("param save/load round-trip") {
    val dir = tmpDir()
    joiner.setMaxDistance(3).setGramLength(4).save(dir)
    val back = FuzzyJoiner.load(spark, dir)
    assert(back.getMaxDistance == 3 && back.getGramLength == 4)
  }
}
