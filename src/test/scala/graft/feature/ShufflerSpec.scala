package graft.feature

import graft.SparkSpec

class ShufflerSpec extends SparkSpec {

  test("DeterministicShuffler: contiguous positions, stable under partitioning") {
    import spark.implicits._
    val rows = (1L to 300L).map(i => (i, s"payload$i"))
    val df1 = rows.toDF("id", "v")
    val df2 = rows.reverse.toDF("id", "v").repartition(7)
    val sh = new DeterministicShuffler().setIdCol("id").setSeed(5L).setNumShards(4)
    def res(df: org.apache.spark.sql.DataFrame) =
      sh.transform(df).head.select("id", "shard", "shard_pos").collect()
        .map(r => r.getLong(0) -> (r.getInt(1), r.getLong(2))).toMap
    val a = res(df1)
    assert(a == res(df2), "assignment must not depend on input partitioning")
    // downstream coalesce runs parent partitions inside one task —
    // ranks must survive it (regression: TaskContext-based offsets)
    val coalesced = sh.transform(df2).head.coalesce(1)
      .select("id", "shard", "shard_pos").collect()
      .map(r => r.getLong(0) -> (r.getInt(1), r.getLong(2))).toMap
    assert(a == coalesced, "assignment must survive a downstream coalesce(1)")
    // every shard's positions are exactly 0..count-1
    a.values.groupBy(_._1).foreach { case (s, members) =>
      val ps = members.map(_._2).toSeq.sorted
      assert(ps == (0L until ps.length).toSeq, s"shard $s positions $ps")
    }
    // all 4 shards populated, roughly balanced (md5 is uniform)
    val sizes = a.values.groupBy(_._1).view.mapValues(_.size).toMap
    assert(sizes.keySet == Set(0, 1, 2, 3), sizes)
    assert(sizes.values.min > 40, sizes)
  }

  test("DeterministicShuffler: different seeds give different orders") {
    import spark.implicits._
    val df = (1L to 100L).map(Tuple1(_)).toDF("id")
    def order(seed: Long) =
      new DeterministicShuffler().setIdCol("id").setSeed(seed).setNumShards(1)
        .transform(df).head.orderBy("shard_pos").select("id").collect().map(_.getLong(0)).toSeq
    val o1 = order(1L)
    val o2 = order(2L)
    assert(o1 != o2)
    assert(o1.sorted == o2.sorted)
    // and neither is the identity order (it IS a shuffle)
    assert(o1 != (1L to 100L).toSeq)
  }

  test("param save/load round-trips") {
    val sh = new DeterministicShuffler().setIdCol("doc_id").setSeed(9L).setNumShards(16)
    val dir = java.nio.file.Files.createTempDirectory("graft-shuf").toString
    sh.save(dir)
    val l = DeterministicShuffler.load(spark, dir)
    assert(l.getNumShards == 16 && l.getSeed == 9L && l.getIdCol == "doc_id")
  }
}
