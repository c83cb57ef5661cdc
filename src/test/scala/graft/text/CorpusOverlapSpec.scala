package graft.text

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Cross-source exact-content overlap matrix. */
class CorpusOverlapSpec extends SparkSpec {

  private def corpus = {
    import spark.implicits._
    Seq(
      (0L, "alpha doc", "A"), (1L, "beta doc", "A"), (2L, "gamma doc", "A"),
      (3L, "Alpha  DOC", "B"),   // normalizes equal to doc 0
      (4L, "delta doc", "B"),
      (5L, "alpha doc", "C"), (6L, "delta doc", "C"), (7L, "epsilon doc", "C"),
      (8L, "alpha doc", "A"))    // in-source duplicate: must not inflate n_A
      .toDF("id", "text", "source")
  }

  private def run() = new CorpusOverlap().setInputCol("text").setSourceCol("source")
    .transform(corpus).head
    .collect()
    .map(r => (r.getString(0), r.getString(1)) ->
      (r.getLong(2), r.getLong(3), r.getLong(4), r.getDouble(5))).toMap

  test("pairwise shared fingerprints and jaccard; zero-overlap pairs still appear") {
    val out = run()
    assert(out.keySet == Set(("A", "B"), ("A", "C"), ("B", "C")))
    // A={alpha,beta,gamma} (dup alpha deduped), B={alpha,delta}, C={alpha,delta,epsilon}
    assert(out(("A", "B")) == (3L, 2L, 1L, 1.0 / 4))
    assert(out(("A", "C")) == (3L, 3L, 1L, 1.0 / 5))
    assert(out(("B", "C")) == (2L, 3L, 2L, 2.0 / 3))
  }

  test("disjoint sources report shared 0, not a missing row") {
    import spark.implicits._
    val df = Seq((0L, "one", "X"), (1L, "two", "Y")).toDF("id", "text", "source")
    val out = new CorpusOverlap().setInputCol("text").setSourceCol("source")
      .transform(df).head.collect()
    assert(out.length == 1)
    assert(out.head.getLong(4) == 0L && out.head.getDouble(5) == 0.0)
  }

  test("agreement with ExactDeduplicator: shared content is exactly what dedup would flag") {
    import spark.implicits._
    // cross-source duplicate pairs in the overlap matrix == distinct
    // fingerprints whose copies span >1 source in the dedup view
    val flagged = new ExactDeduplicator().setIdCol("id").setInputCol("text")
      .transform(corpus).head
    val multiSource = flagged.groupBy("content_fingerprint")
      .agg(countDistinct("source").as("ns")).where(col("ns") > 1).count()
    val totalShared = run().values.map(_._3).sum
    // alpha spans A,B,C -> 3 pairwise entries from 1 fingerprint;
    // delta spans B,C -> 1 entry
    assert(multiSource == 2L && totalShared == 4L)
  }

  test("param save/load round-trip") {
    val dir = tmpDir()
    new CorpusOverlap().setInputCol("body").setSourceCol("corpus").save(dir)
    val back = CorpusOverlap.load(spark, dir)
    assert(back.getInputCol == "body" && back.getSourceCol == "corpus")
  }
}
