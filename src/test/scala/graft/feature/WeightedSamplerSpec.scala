package graft.feature

import graft.SparkSpec
import org.apache.spark.sql.functions._

class WeightedSamplerSpec extends SparkSpec {

  private def sampler = new WeightedSampler().setIdCol("id").setWeightCol("w")

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  private def esKey(id: Long, seed: Long, w: Double): Double = {
    val v = java.lang.Long.parseLong(md5hex(s"$id\u0001$seed").substring(0, 13), 16)
    math.log((v + 1.0) / 4503599627370496.0) / w
  }

  test("exact: matches the brute-force Efraimidis-Spiridakis top-k") {
    import spark.implicits._
    val rnd = new scala.util.Random(3)
    val rows = (0L until 300L).map(i => (i, 0.5 + rnd.nextInt(10)))
    val df = rows.toDF("id", "w")
    val s = sampler.setSampleSize(40).setSeed(99L)
    val got = s.transform(df).head.select("id").collect().map(_.getLong(0)).toSet
    val want = rows.sortBy { case (i, w) => (-esKey(i, 99L, w), i) }
      .take(40).map(_._1).toSet
    assert(got == want)
  }

  test("selection rates track weights (9:1 weights -> ~9:1 rates)") {
    import spark.implicits._
    val df = (0L until 20000L).map(i => (i, if (i % 2 == 0) 9.0 else 1.0)).toDF("id", "w")
    val out = sampler.setSampleSize(2000).setSeed(7L).transform(df).head
      .select("id").collect().map(_.getLong(0))
    assert(out.length == 2000 && out.distinct.length == 2000)
    val high = out.count(_ % 2 == 0).toDouble
    val ratio = high / (2000 - high)
    assert(ratio > 7.0 && ratio < 11.5, s"ratio $ratio")
  }

  test("deterministic in (seed, id, weight); different seed differs") {
    import spark.implicits._
    val df = (0L until 1000L).map(i => (i, 1.0 + i % 5)).toDF("id", "w")
    def ids(seed: Long) = sampler.setSampleSize(100).setSeed(seed)
      .transform(df).head.select("id").collect().map(_.getLong(0)).toSet
    assert(ids(1L) == ids(1L))
    assert(ids(1L) != ids(2L))
  }

  test("zero/null weights are never sampled; negative raises") {
    import spark.implicits._
    val df = Seq((1L, Some(0.0)), (2L, None), (3L, Some(2.0)), (4L, Some(1.0)))
      .toDF("id", "w")
    val out = sampler.setSampleSize(10).setSeed(5L).transform(df).head
      .select("id").collect().map(_.getLong(0)).toSet
    assert(out == Set(3L, 4L)) // sampleSize exceeds eligible rows
    val bad = Seq((1L, -1.0)).toDF("id", "w")
    val e = intercept[Exception] {
      sampler.setSampleSize(1).transform(bad).head.collect()
    }
    assert(e.getMessage.contains("negative") || e.getCause != null)
  }

  test("param save/load round-trip") {
    val dir = tmpDir()
    sampler.setSampleSize(17).setSeed(123L).save(dir)
    val back = WeightedSampler.load(spark, dir)
    assert(back.getSampleSize == 17 && back.getSeed == 123L &&
      back.getWeightCol == "w")
  }
}
