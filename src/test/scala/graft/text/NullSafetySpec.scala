package graft.text

import graft.SparkSpec

/** Null text must never crash a corpus operator: rows pass through
  * with null/zero outputs (or drop where the doc has no content). */
class NullSafetySpec extends SparkSpec {

  private def docs = {
    import spark.implicits._
    Seq((1L, "real words here", "s0"), (2L, null.asInstanceOf[String], "s0"),
      (3L, "", "s1")).toDF("id", "text", "src")
  }

  test("SequencePacker packs null text as zero tokens") {
    val out = new SequencePacker().setInputCol("text").setIdCol("id")
      .setGroupCol("src").setTokenBudget(10).transform(docs).head
      .select("id", "n_tokens", "bin_index").collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(out(2L)._1 == 0L && out.size == 3)
  }

  test("RepetitionStats, PiiRedactor, TextQualityScorer survive null text") {
    val rep = new RepetitionStats().setInputCol("text").transform(docs).head.collect()
    assert(rep.length == 3)
    val pii = new PiiRedactor().setInputCol("text").setOutputCol("r")
      .transform(docs).head.collect()
    assert(pii.length == 3)
    val q = new TextQualityScorer().setInputCol("text").transform(docs).head.collect()
    assert(q.length == 3)
  }

  test("ChunkSplitter and Bm25Scorer treat null text like empty text") {
    val chunks = new ChunkSplitter().setInputCol("text").setOutputCol("c")
      .setChunkSize(2).setStride(2).transform(docs).head
      .select("id").collect().map(_.getLong(0))
    assert(!chunks.contains(2L) && !chunks.contains(3L) && chunks.contains(1L))
    val bm = new Bm25Scorer().setInputCol("text").setIdCol("id")
      .setOutputCol("s").setQueryTerms("real")
      .transform(docs).head.select("id", "s").collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(bm.size == 3 && bm(2L) == 0.0 && bm(1L) > 0.0)
  }

  test("NgramLm and LineDeduplicator survive null text") {
    val lm = new NgramLm().setInputCol("text").setOutputCol("p").fit(docs)
    val scored = lm.setIdCol("id").transform(docs).head.select("id", "p").collect()
    assert(scored.length == 3)
    val ld = new LineDeduplicator().setIdCol("id").setInputCol("text")
      .setOutputCol("c").transform(docs).head.select("id").collect()
    assert(ld.length == 3)
  }
}
