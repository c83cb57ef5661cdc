package graft.dedup

import graft.SparkSpec

class SimHashSpec extends SparkSpec {

  test("fingerprint is deterministic, order/multiplicity-insensitive") {
    val a = SimHash.fingerprint(Seq("spark", "scala", "data"))
    assert(a == SimHash.fingerprint(Seq("data", "spark", "scala")))
    assert(a == SimHash.fingerprint(Seq("spark", "spark", "scala", "data")))
    assert(a != SimHash.fingerprint(Seq("entirely", "different", "words")))
  }

  test("near-identical token sets land within small Hamming distance; disjoint sets far") {
    val base = (0 until 50).map(i => s"tok$i")
    val near = base.drop(2) ++ Seq("x1", "x2")
    val far = (0 until 50).map(i => s"other$i")
    val d1 = SimHash.hammingDistance(SimHash.fingerprint(base), SimHash.fingerprint(near))
    val d2 = SimHash.hammingDistance(SimHash.fingerprint(base), SimHash.fingerprint(far))
    assert(d1 < 12, s"near docs at $d1 bits")
    assert(d2 > 20, s"far docs at $d2 bits")
  }

  test("similarityJoin finds near pairs through band collisions") {
    import spark.implicits._
    val base = (0 until 50).map(i => s"tok$i")
    val df = Seq(
      (1L, base), (2L, base.drop(1) :+ "extra"), (3L, (0 until 50).map(i => s"zzz$i"))
    ).toDF("id", "tokens")
    val hasher = new SimHasher().setInputCol("tokens").setOutputCol("fp")
    val hashed = hasher.transform(df).head
    val pairs = hasher.similarityJoin(hashed, "id", maxHamming = 3)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((1L, 2L)))
    assert(!pairs.exists(p => p._1 == 3L || p._2 == 3L))
  }

  test("similarityJoin rejects maxHamming >= numBands") {
    import spark.implicits._
    val df = Seq((1L, Seq("a"))).toDF("id", "tokens")
    val hasher = new SimHasher().setInputCol("tokens").setOutputCol("fp")
    intercept[IllegalArgumentException] {
      hasher.similarityJoin(hasher.transform(df).head, "id", maxHamming = 4, numBands = 4)
    }
  }
}
