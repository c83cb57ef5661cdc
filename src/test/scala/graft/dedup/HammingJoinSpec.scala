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
