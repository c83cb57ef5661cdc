package graft.dedup

import org.apache.spark.ml.linalg.Vectors
import graft.SparkSpec

/** Incremental dedup: index a corpus once, flag later batches against
  * it, grow the index batch-over-batch, survive save/load. */
class MinHashIndexerSpec extends SparkSpec {

  private def vec(indices: Int*) =
    Vectors.sparse(200, indices.sorted.toArray, Array.fill(indices.size)(1.0))

  private def corpus = {
    import spark.implicits._
    Seq(
      (0L, vec(1, 2, 3, 4, 5, 6, 7, 8, 9, 10)),
      (2L, vec(50, 51, 52, 53, 54, 55, 56, 57, 58, 59)),
      (4L, vec(100, 101, 102, 103, 104, 105, 106, 107, 108, 109))
    ).toDF("id", "features")
  }

  private def batch = {
    import spark.implicits._
    Seq(
      // near-dup of doc 0: 9/11 shared shingles → dist = 1 - 9/11 ≈ 0.18
      (11L, vec(1, 2, 3, 4, 5, 6, 7, 8, 9, 42)),
      // exact copy of doc 2
      (13L, vec(50, 51, 52, 53, 54, 55, 56, 57, 58, 59)),
      // unrelated
      (15L, vec(150, 151, 152, 153, 154, 155, 156, 157, 158, 159))
    ).toDF("id", "features")
  }

  private def indexer = new MinHashIndexer()
    .setInputCol("features").setOutputCol("hashes")
    .setNumHashTables(10).setThreshold(0.3).setSeed(7L)

  test("batch rows match the indexed corpus, not each other") {
    val model = indexer.fit(corpus)
    val out = model.transform(batch).head
      .select("id", "matched_id", "is_duplicate").collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getLong(1)), r.getBoolean(2)))
      .toMap
    assert(out(11L) == (Some(0L), true))
    assert(out(13L) == (Some(2L), true))
    assert(out(15L) == (None, false))
  }

  test("addToIndex grows the index so later batches see earlier ones") {
    import spark.implicits._
    val model = indexer.fit(corpus).addToIndex(batch)
    // a copy of batch doc 15 (absent from the original corpus) now matches
    val later = Seq((20L, vec(150, 151, 152, 153, 154, 155, 156, 157, 158, 159)))
      .toDF("id", "features")
    val r = model.transform(later).head.select("matched_id", "is_duplicate").head()
    assert(r.getLong(0) == 15L && r.getBoolean(1))
  }

  test("index survives save/load") {
    val dir = tmpDir()
    indexer.fit(corpus).save(dir)
    val loaded = MinHashIndexModel.load(spark, dir)
    val out = loaded.transform(batch).head
      .select("id", "is_duplicate").collect().map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    assert(out == Map(11L -> true, 13L -> true, 15L -> false))
  }
}
