package graft.text

import graft.SparkSpec
import org.apache.spark.sql.functions._

class CollocationScorerSpec extends SparkSpec {

  /** Reference PMI/G² from raw bigram counts. */
  private def ref(bigrams: Seq[(String, String)]): Map[(String, String), (Double, Double)] = {
    val n12 = bigrams.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val n1 = bigrams.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    val n2 = bigrams.groupBy(_._2).view.mapValues(_.size.toLong).toMap
    val n = bigrams.size.toDouble
    n12.map { case (p, c12) =>
      val (c1, c2) = (n1(p._1).toDouble, n2(p._2).toDouble)
      val pmi = math.log(c12 * n / (c1 * c2)) / math.log(2.0)
      def term(k: Double, row: Double, c: Double) =
        if (k > 0) k * math.log(k * n / (row * c)) else 0.0
      val llr = 2.0 * (term(c12, c1, c2) + term(c1 - c12, c1, n - c2) +
        term(c2 - c12, n - c1, c2) + term(n - c1 - c2 + c12, n - c1, n - c2))
      p -> (pmi, llr)
    }
  }

  test("pmi and llr match the reference on a hand corpus; real collocation ranks first") {
    import spark.implicits._
    val docs = Seq(
      "new york is big", "new york is far", "i love new york",
      "a new day", "york here", "is is is").toDF("text")
    val out = new CollocationScorer().setInputCol("text").setMinCount(1L)
      .transform(docs).head.collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getDouble(5), r.getDouble(6))).toMap
    val bigrams = Seq(
      ("new", "york"), ("york", "is"), ("is", "big"),
      ("new", "york"), ("york", "is"), ("is", "far"),
      ("i", "love"), ("love", "new"), ("new", "york"),
      ("a", "new"), ("new", "day"), ("york", "here"), ("is", "is"), ("is", "is"))
    val want = ref(bigrams)
    assert(out.keySet == want.keySet)
    out.foreach { case (p, (c, pmi, llr)) =>
      assert(c == bigrams.count(_ == p).toLong, p)
      assert(math.abs(pmi - want(p)._1) < 1e-9, s"$p pmi")
      assert(math.abs(llr - want(p)._2) < 1e-9, s"$p llr")
    }
    // "new york" (3 of 14 bigrams, tight margins) must outrank everything
    val top = new CollocationScorer().setInputCol("text").setMinCount(1L)
      .transform(docs).head.head()
    assert(top.getString(0) == "new" && top.getString(1) == "york", top)
  }

  test("minCount prunes, topK caps deterministically") {
    import spark.implicits._
    val docs = Seq("a b a b a b c d").toDF("text")
    val all = new CollocationScorer().setInputCol("text").setMinCount(2L)
      .transform(docs).head.collect()
    assert(all.map(r => (r.getString(0), r.getString(1))).toSet ==
      Set(("a", "b"), ("b", "a")), all.mkString(", "))
    val one = new CollocationScorer().setInputCol("text").setMinCount(1L).setTopK(1)
      .transform(docs).head.collect()
    assert(one.length == 1)
  }

  test("null/blank text contributes nothing; param save/load round-trip") {
    import spark.implicits._
    val docs = Seq(Some("x y x y"), None, Some("   ")).toDF("text")
    val out = new CollocationScorer().setInputCol("text").setMinCount(1L)
      .transform(docs).head.collect()
    assert(out.nonEmpty && out.forall(r => Seq("x", "y").contains(r.getString(0))))
    val dir = tmpDir()
    new CollocationScorer().setInputCol("text").setMinCount(7L).setTopK(42).save(dir)
    val back = CollocationScorer.load(spark, dir)
    assert(back.getMinCount == 7L && back.getTopK == 42 && back.getInputCol == "text")
  }
}
