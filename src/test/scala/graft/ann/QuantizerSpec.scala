package graft.ann

import graft.SparkSpec

class QuantizerSpec extends SparkSpec {

  test("ScalarQuantizer: codes span the per-dim range, constants pinned") {
    import spark.implicits._
    val df = Seq(
      (1L, Array(0.0f, 10.0f, 7.0f)),
      (2L, Array(1.0f, 20.0f, 7.0f)),
      (3L, Array(0.5f, 15.0f, 7.0f))).toDF("id", "emb")
    val model = new ScalarQuantizer().setInputCol("emb").setOutputCol("q").fit(df)
    val out = model.transform(df).head
      .select("id", "q", "q_dequant").collect()
      .map(r => r.getLong(0) -> (r.getSeq[Byte](1), r.getSeq[Double](2))).toMap

    // dim0 range [0,1]: 0 → -128, 1 → 127, 0.5 → floor(127.5+0.5)-128 = 0
    assert(out(1L)._1(0) == -128 && out(2L)._1(0) == 127 && out(3L)._1(0) == 0)
    // dim1 range [10,20]: min/max map to the extremes
    assert(out(1L)._1(1) == -128 && out(2L)._1(1) == 127)
    // constant dim → code -128, dequant returns the constant exactly
    assert(out.values.forall(_._1(2) == -128))
    assert(out.values.forall(v => v._2(2) == 7.0))
    // reconstruction error bounded by half a quantization step
    val step0 = 1.0 / 255
    assert(math.abs(out(3L)._2(0) - 0.5) <= step0 / 2 + 1e-12)
  }

  test("ScalarQuantizer: quantized cosine ranks like exact cosine") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val base = Array.fill(16)(rnd.nextFloat() * 2 - 1)
    def jitter(eps: Float) = base.map(x => x + (rnd.nextFloat() * 2 - 1) * eps)
    val rows = (0 until 50).map(i => (i.toLong, jitter(0.02f * (i % 10 + 1)))) :+
      (99L, base)
    val df = rows.toDF("id", "emb")
    val model = new ScalarQuantizer().setInputCol("emb").setOutputCol("q").fit(df)
    val deq = model.transform(df).head.select("id", "q_dequant").collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1).toArray).toMap
    def cos(a: Array[Double], b: Array[Double]) = {
      val d = a.zip(b).map { case (x, y) => x * y }.sum
      d / (math.sqrt(a.map(x => x * x).sum) * math.sqrt(b.map(x => x * x).sum))
    }
    val query = deq(99L)
    val exact = rows.dropRight(1).map { case (id, v) =>
      id -> cos(v.map(_.toDouble), base.map(_.toDouble))
    }.sortBy(-_._2).take(5).map(_._1).toSet
    val approx = deq.toSeq.filter(_._1 != 99L).map { case (id, v) => id -> cos(v, query) }
      .sortBy(-_._2).take(5).map(_._1).toSet
    // int8 quantization keeps the top-5 neighborhood essentially intact
    assert((exact intersect approx).size >= 4, s"exact=$exact approx=$approx")
  }

  test("ScalarQuantizer model save/load round-trips") {
    import spark.implicits._
    val df = Seq((1L, Array(0.0f, 5.0f)), (2L, Array(2.0f, 9.0f))).toDF("id", "emb")
    val model = new ScalarQuantizer().setInputCol("emb").setOutputCol("q").fit(df)
    val dir = java.nio.file.Files.createTempDirectory("graft-sq").toString
    model.save(dir)
    val loaded = ScalarQuantizerModel.load(spark, dir)
    val a = model.transform(df).head.select("q").collect().map(_.getSeq[Byte](0))
    val b = loaded.transform(df).head.select("q").collect().map(_.getSeq[Byte](0))
    assert(a.toSeq == b.toSeq)
  }

  test("WeightedMixer: per-stratum rates, subsets nest, order-independent") {
    import spark.implicits._
    val rows = (1L to 400L).map(i => (i, s"s${i % 4}"))
    val df = rows.toDF("id", "src")
    def sel(weights: Seq[(String, Double)], default: Double = 1.0) =
      new graft.feature.WeightedMixer().setIdCol("id").setStratumCol("src")
        .setSeed(11L).setWeights(weights: _*).setDefaultFraction(default)
        .transform(df).head.select("id").collect().map(_.getLong(0)).toSet

    // 1.0 keeps everything, 0.0 drops everything in that stratum
    val all = sel(Seq("s0" -> 1.0, "s1" -> 1.0, "s2" -> 1.0, "s3" -> 1.0))
    assert(all.size == 400)
    val drop0 = sel(Seq("s0" -> 0.0))
    assert(!drop0.exists(_ % 4 == 0) && drop0.size == 300)
    // nested fractions select nested sets (same hash key)
    val lo = sel(Seq("s1" -> 0.2), default = 0.5)
    val hi = sel(Seq("s1" -> 0.6), default = 0.5)
    assert(lo.subsetOf(hi))
    // default fraction applies to unlisted strata
    val d = sel(Seq("s0" -> 1.0), default = 0.0)
    assert(d.forall(_ % 4 == 0) && d.size == 100)
    // row order / partitioning never changes selection
    val shuffled = rows.reverse.toDF("id", "src").repartition(5)
    val a = new graft.feature.WeightedMixer().setIdCol("id").setStratumCol("src")
      .setSeed(11L).setWeights("s1" -> 0.3, "s2" -> 0.7)
      .transform(shuffled).head.select("id").collect().map(_.getLong(0)).toSet
    val b = new graft.feature.WeightedMixer().setIdCol("id").setStratumCol("src")
      .setSeed(11L).setWeights("s1" -> 0.3, "s2" -> 0.7)
      .transform(df).head.select("id").collect().map(_.getLong(0)).toSet
    assert(a == b)
  }

  test("WeightedMixer params save/load round-trip") {
    val m = new graft.feature.WeightedMixer().setIdCol("doc_id")
      .setStratumCol("source").setSeed(3L)
      .setWeights("a" -> 0.5, "b" -> 0.25).setDefaultFraction(0.1)
    val dir = java.nio.file.Files.createTempDirectory("graft-mixer").toString
    m.save(dir)
    val l = graft.feature.WeightedMixer.load(spark, dir)
    assert(l.getStrataKeys.toSeq == Seq("a", "b"))
    assert(l.getStrataFractions.toSeq == Seq(0.5, 0.25))
    assert(l.getDefaultFraction == 0.1 && l.getSeed == 3L)
  }
}
