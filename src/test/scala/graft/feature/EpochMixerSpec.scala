package graft.feature

import org.apache.spark.sql.functions._
import graft.SparkSpec

class EpochMixerSpec extends SparkSpec {

  private def docs = {
    import spark.implicits._
    (0L until 1000L).map(i => (i, s"s${i % 4}")).toDF("id", "source")
  }

  test("integer weights emit exactly w copies with 0-based epoch ordinals") {
    val out = new EpochMixer().setIdCol("id").setStratumCol("source").setSeed(1L)
      .setWeights("s0" -> 3.0, "s1" -> 1.0, "s2" -> 0.0)
      .setDefaultWeight(2.0)
      .transform(docs).head
    val bySource = out.groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(bySource == Map("s0" -> 750L, "s1" -> 250L, "s3" -> 500L)) // s2 dropped
    val epochs = out.where(col("source") === "s0").groupBy("epoch").count()
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(epochs == Map(0L -> 250L, 1L -> 250L, 2L -> 250L))
  }

  test("fractional weight: ~frac of rows get the extra copy, deterministically") {
    val mixer = new EpochMixer().setIdCol("id").setStratumCol("source").setSeed(7L)
      .setWeights("s0" -> 2.3).setDefaultWeight(0.0)
    val a = mixer.transform(docs).head.select("id", "epoch").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val b = mixer.transform(docs).head.select("id", "epoch").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(a == b) // rerun-deterministic
    val n = a.size
    assert(n > 250 * 2.3 * 0.85 && n < 250 * 2.3 * 1.15, n) // ~575 ± noise
    // every selected id has epochs 0..count-1 contiguous
    val byId = a.groupBy(_._1).view.mapValues(_.map(_._2).toSeq.sorted).toMap
    assert(byId.values.forall(e => e == (0L until e.size).toSeq))
    assert(byId.values.map(_.size).toSet == Set(2, 3))
  }

  test("for w <= 1 the selected base rows equal WeightedMixer's row set") {
    val em = new EpochMixer().setIdCol("id").setStratumCol("source").setSeed(5L)
      .setWeights("s0" -> 0.4).setDefaultWeight(0.0)
      .transform(docs).head.select("id").collect().map(_.getLong(0)).toSet
    val wm = new WeightedMixer().setIdCol("id").setStratumCol("source").setSeed(5L)
      .setWeights("s0" -> 0.4).setDefaultFraction(0.0)
      .transform(docs).head.select("id").collect().map(_.getLong(0)).toSet
    assert(em == wm && em.nonEmpty)
  }

  test("raising a weight past 1 never changes which base rows appear") {
    def ids(w: Double) = new EpochMixer().setIdCol("id").setStratumCol("source").setSeed(3L)
      .setWeights("s0" -> w).setDefaultWeight(0.0)
      .transform(docs).head.select("id").distinct().collect().map(_.getLong(0)).toSet
    val base = ids(1.0)
    assert(ids(1.7) == base && ids(3.0) == base)
    assert(ids(0.3).subsetOf(base)) // nested-fraction property carries over
  }

  test("param save/load round-trip") {
    val dir = tmpDir()
    new EpochMixer().setWeights("a" -> 2.5, "b" -> 0.1).setDefaultWeight(1.5).save(dir)
    val back = EpochMixer.load(spark, dir)
    assert(back.getStrataKeys.toSeq == Seq("a", "b") &&
      back.getStrataWeights.toSeq == Seq(2.5, 0.1) && back.getDefaultWeight == 1.5)
  }
}
