package graft.dedup

import graft.SparkSpec
import org.apache.spark.sql.functions._

class HammingJoinSpec extends SparkSpec {

  // a planted Hamming CHAIN over raw 64-bit fingerprints:
  //   id 0: 0b000000  id 1: 0b000111  id 2: 0b111111
  // consecutive distance exactly 3, endpoints 6 apart; id 3 duplicates
  // id 2 exactly; id 9 is far from everything; id 10 has a null fp
  private def chainDf = {
    import spark.implicits._
    Seq(
      (0L, Some(0L)),
      (1L, Some(0x07L)),
      (2L, Some(0x3fL)),
      (3L, Some(0x3fL)),
      (9L, Some(0xaaaa5555aaaaL)),
      (10L, None: Option[Long])).toDF("id", "fp")
  }

  test("clusterWithRep is single-hop: a chain yields non-canonical ids (documented)") {
    val out = HammingJoin.clusterWithRep(chainDf, "id", "fp", maxHamming = 3, numBands = 4)
      .orderBy("id").collect()
    val byId = out.map(r => r.getLong(0) -> r.getLong(1)).toMap
    // direct neighbors only: 2's min direct neighbor is 1, but 1's is 0
    assert(byId(0L) == 0L && byId(1L) == 0L)
    assert(byId(2L) == 1L, "single-hop: 2 points at 1, not at the chain root")
    assert(byId(9L) == 9L && byId(10L) == 10L)
  }

  test("clusterComponents closes chains transitively to one canonical id") {
    val out = HammingJoin.clusterComponents(chainDf, "id", "fp", maxHamming = 3, numBands = 4)
      .orderBy("id").collect()
    assert(out.length == 6)
    val byId = out.map(r => (r.getLong(0),
      (r.getLong(1), r.getBoolean(2), if (r.isNullAt(3)) -1 else r.getInt(3)))).toMap
    // the whole chain (plus the exact dup on its end) roots at 0
    assert(byId(0L) == ((0L, false, 0)))
    assert(byId(1L) == ((0L, true, 3)))
    assert(byId(2L) == ((0L, true, 6)), "rep_hamming measures the closure's reach past maxHamming")
    assert(byId(3L) == ((0L, true, 6)))
    // far row is its own singleton; null fp clusters alone with null rep
    assert(byId(9L) == ((9L, false, 0)))
    assert(byId(10L)._1 == 10L && !byId(10L)._2 && byId(10L)._3 == -1)
  }

  test("clusterComponentsMulti closes across modalities and reports via") {
    import spark.implicits._
    // image links 0-1 (equal fp), text links 1-2 (1 bit), text links
    // 4-5; 3 is a singleton; 4 has an undecodable image (null fp) but
    // still dedups by text; 6 is null in BOTH modalities
    val df = Seq(
      (0L, Some(0x7L), Some(0x1L)),
      (1L, Some(0x7L), Some(0xFF00L)),
      (2L, Some(0xF0F0L), Some(0xFF01L)),
      (3L, Some(0xFF000000L), Some(0xF0F0F0F0L)),
      (4L, None: Option[Long], Some(0xAAAA00000000L)),
      (5L, Some(0x123400000000L), Some(0xAAAA00000001L)),
      (6L, None: Option[Long], None: Option[Long]))
      .toDF("id", "img_fp", "text_fp")
    val out = HammingJoin.clusterComponentsMulti(df, "id",
      Seq(("image", "img_fp", 3, 4), ("text", "text_fp", 3, 4)))
      .orderBy("id").collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getBoolean(2), r.getString(3)))).toMap
    assert(out(0L) == ((0L, false, "image")))
    assert(out(1L) == ((0L, true, "image,text")), "cross-modal chain roots at 0")
    assert(out(2L) == ((0L, true, "text")))
    assert(out(3L) == ((3L, false, "")))
    assert(out(4L) == ((4L, false, "text")), "null image fp still dedups by text")
    assert(out(5L) == ((4L, true, "text")))
    assert(out(6L) == ((6L, false, "")))
  }

  test("clusterComponentsMulti py4j overload shares one threshold") {
    import spark.implicits._
    val df = Seq((0L, 0x7L, 0x1L), (1L, 0x7L, 0xFF00L)).toDF("id", "a_fp", "b_fp")
    val out = HammingJoin.clusterComponentsMulti(df, "id",
      Seq("a", "b"), Seq("a_fp", "b_fp"), 3, 4)
      .orderBy("id").collect().map(r => (r.getLong(0), r.getLong(1), r.getString(3)))
    assert(out.toSeq == Seq((0L, 0L, "a"), (1L, 0L, "a")))
  }

  test("clusterComponents agrees with clusterWithRep on clique-shaped groups") {
    import spark.implicits._
    // two 3-cliques (pairwise <= 2 bits) and a singleton
    val df = Seq(
      (0L, 0L), (1L, 1L), (2L, 3L),
      (10L, 0xf0f0L), (11L, 0xf0f1L), (12L, 0xf0f3L),
      (20L, 0x5555aaaa5555L)).map { case (i, f) => (i, f) }.toDF("id", "fp")
    val a = HammingJoin.clusterWithRep(df, "id", "fp", 3, 4)
      .orderBy("id").collect().map(_.toSeq)
    val b = HammingJoin.clusterComponents(df, "id", "fp", 3, 4)
      .orderBy("id").collect().map(_.toSeq)
    assert(a.toSeq == b.toSeq)
  }
}
