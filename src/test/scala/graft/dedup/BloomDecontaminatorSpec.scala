package graft.dedup

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Bloom-filter decontamination: recall 1 by construction, bounded
  * false-positive overcount. */
class BloomDecontaminatorSpec extends SparkSpec {

  private def tables = {
    import spark.implicits._
    val train = Seq(
      (1L, Seq("a b c", "b c d", "c d e")),   // shares 2 grams with eval
      (2L, Seq("x y z", "y z w")),            // clean
      (3L, Seq("a b c")),                     // shares 1
      (4L, Seq.empty[String]),                // empty grams
      (5L, null.asInstanceOf[Seq[String]])    // null grams
    ).toDF("doc_id", "grams")
    val eval = Seq((100L, Seq("a b c", "b c d", "q r s"))).toDF("doc_id", "grams")
    (train, eval)
  }

  test("matches the exact Decontaminator on disjoint/overlapping docs") {
    val (train, eval) = tables
    val bloom = new BloomDecontaminator().setIdCol("doc_id").setInputCol("grams")
      .setMinMatches(2)
      .transform(train, eval).head
      .select("doc_id", "matched_ngrams", "contaminated")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2))).toSet
    assert(bloom === Set((1L, 2L, true), (2L, 0L, false), (3L, 1L, false),
      (4L, 0L, false), (5L, 0L, false)))
    val exact = new Decontaminator().setIdCol("doc_id").setInputCol("grams")
      .setMinMatches(2)
      .transform(train.where(col("doc_id") <= 3), eval).head
      .select("doc_id", "matched_ngrams", "contaminated")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2))).toSet
    assert(exact.subsetOf(bloom))
  }

  test("no false negatives across a larger random corpus (recall 1 by construction)") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    def gram() = s"g${rnd.nextInt(5000)}"
    val train = (0L until 300L).map(i => (i, Seq.fill(20)(gram()))).toDF("doc_id", "grams")
    val eval = (0L until 30L).map(i => (i, Seq.fill(20)(gram()))).toDF("doc_id", "grams")
    def flags(df: org.apache.spark.sql.DataFrame) = df
      .select("doc_id", "contaminated")
      .collect().map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    val exact = flags(new Decontaminator().setIdCol("doc_id").setInputCol("grams")
      .transform(train, eval).head)
    val bloom = flags(new BloomDecontaminator().setIdCol("doc_id").setInputCol("grams")
      .transform(train, eval).head)
    // every exact-contaminated doc must be bloom-flagged
    exact.foreach { case (id, c) => if (c) assert(bloom(id), s"false negative on $id") }
    // at fpp 1e-6 over ~6k probed grams, expect zero false positives
    assert(bloom == exact)
  }

  test("param save/load round-trip") {
    val dir = tmpDir()
    new BloomDecontaminator().setIdCol("doc_id").setInputCol("grams")
      .setFpp(1e-4).setMinMatches(3).setExpectedItems(1000L).save(dir)
    val back = BloomDecontaminator.load(spark, dir)
    assert(back.getFpp == 1e-4 && back.getMinMatches == 3 && back.getExpectedItems == 1000L)
  }
}
