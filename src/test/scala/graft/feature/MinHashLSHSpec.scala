package graft.feature

import org.apache.spark.ml.linalg.{Vector, Vectors}
import graft.SparkSpec

/** Expected values mirror the reference MinHashLSHTest.java. */
class MinHashLSHSpec extends SparkSpec {

  private def inputDf = {
    import spark.implicits._
    Seq(
      (0, Vectors.sparse(6, Array(0, 1, 2), Array(1.0, 1.0, 1.0))),
      (1, Vectors.sparse(6, Array(2, 3, 4), Array(1.0, 1.0, 1.0))),
      (2, Vectors.sparse(6, Array(0, 2, 4), Array(1.0, 1.0, 1.0)))).toDF("id", "vec")
  }

  test("hashFunction with fixed coefficients (reference testHashFunction)") {
    val vec = Vectors.sparse(10, Array(2, 3, 5, 7), Array(1.0, 1.0, 1.0, 1.0))
    val res = MinHashLSHModelData.hashFunction(vec, 3, 1, Array(0, 1, 3), Array(1, 2, 0))
    assert(res.map(_.toSeq) === Array(Seq(1.0), Seq(5.0), Seq(9.0)))
  }

  test("hashFunction dense == sparse (reference testHashFunctionEqualWithSparseDenseVector)") {
    val (a, b) = MinHashLSHModelData.generate(3, 1, 2022L)
    val vec = Vectors.sparse(10, Array(2, 3, 5, 7), Array(1.0, 1.0, 1.0, 1.0))
    val dense = MinHashLSHModelData.hashFunction(Vectors.dense(vec.toArray), 3, 1, a, b)
    val sparse = MinHashLSHModelData.hashFunction(vec, 3, 1, a, b)
    assert(dense.map(_.toSeq) === sparse.map(_.toSeq))
  }

  test("hashFunction rejects all-zero vector") {
    intercept[IllegalArgumentException] {
      MinHashLSHModelData.hashFunction(Vectors.sparse(10, Array(), Array()),
        3, 1, Array(0, 1, 3), Array(1, 2, 0))
    }
  }

  test("param defaults and setters (reference testParam)") {
    val lsh = new MinHashLSH()
    assert(lsh.getInputCol == "input")
    assert(lsh.getOutputCol == "output")
    assert(lsh.getNumHashTables == 1)
    assert(lsh.getNumHashFunctionsPerTable == 1)
    lsh.setInputCol("vec").setOutputCol("hashes").setSeed(2022L)
      .setNumHashTables(3).setNumHashFunctionsPerTable(4)
    assert(lsh.getInputCol == "vec" && lsh.getOutputCol == "hashes")
    assert(lsh.getSeed == 2022L)
    assert(lsh.getNumHashTables == 3 && lsh.getNumHashFunctionsPerTable == 4)
  }

  test("fit + transform signatures (reference testFitAndPredict, seed 2022, 5x3)") {
    val lsh = new MinHashLSH().setInputCol("vec").setOutputCol("hashes")
      .setSeed(2022L).setNumHashTables(5).setNumHashFunctionsPerTable(3)
    val model = lsh.fit(inputDf)
    // the reference compares result/expected as unordered collections
    // (rows are not keyed by id in MinHashLSHTest.outputRows)
    val got = model.transform(inputDf).head.select("hashes").collect()
      .map(r => r.getSeq[Vector](0).map(_.toArray.toSeq)).toSet
    val expected = Set(
      Seq(Seq(1.73046954e8, 1.57275425e8, 6.90717571e8),
        Seq(5.02301169e8, 7.967141e8, 4.06089319e8),
        Seq(2.83652171e8, 1.97714719e8, 6.04731316e8),
        Seq(5.2181506e8, 6.36933726e8, 6.13894128e8),
        Seq(3.04301769e8, 1.113672955e9, 6.1388711e8)),
      Seq(Seq(1.73046954e8, 1.57275425e8, 6.7798584e7),
        Seq(6.38582806e8, 1.78703694e8, 4.06089319e8),
        Seq(6.232638e8, 9.28867e7, 9.92010642e8),
        Seq(2.461064e8, 1.12787481e8, 1.92180297e8),
        Seq(2.38162496e8, 1.552933319e9, 2.77995137e8)),
      Seq(Seq(1.73046954e8, 1.57275425e8, 6.90717571e8),
        Seq(1.453197722e9, 7.967141e8, 4.06089319e8),
        Seq(6.232638e8, 1.97714719e8, 6.04731316e8),
        Seq(2.461064e8, 1.12787481e8, 1.92180297e8),
        Seq(1.224130231e9, 1.113672955e9, 2.77995137e8)))
    assert(got === expected)
  }

  test("approxNearestNeighbors (reference testApproxNearestNeighbors)") {
    val lsh = new MinHashLSH().setInputCol("vec").setOutputCol("hashes")
      .setSeed(2022L).setNumHashTables(5).setNumHashFunctionsPerTable(1)
    val model = lsh.fit(inputDf)
    val key = Vectors.sparse(6, Array(1, 3), Array(1.0, 1.0))
    val got = model.approxNearestNeighbors(inputDf, key, 2)
      .select("id", "distCol").collect().map(r => (r.getInt(0), r.getDouble(1))).toSet
    assert(got === Set((0, 0.75), (1, 0.75)))
  }

  test("approxSimilarityJoin (reference testApproxSimilarityJoin)") {
    import spark.implicits._
    val dataB = Seq(
      (3, Vectors.sparse(6, Array(1, 3, 5), Array(1.0, 1.0, 1.0))),
      (4, Vectors.sparse(6, Array(2, 3, 5), Array(1.0, 1.0, 1.0))),
      (5, Vectors.sparse(6, Array(1, 2, 4), Array(1.0, 1.0, 1.0)))).toDF("id", "vec")
    val lsh = new MinHashLSH().setInputCol("vec").setOutputCol("hashes")
      .setSeed(2022L).setNumHashTables(5).setNumHashFunctionsPerTable(1)
    val model = lsh.fit(inputDf)
    val got = model.approxSimilarityJoin(inputDf, dataB, 0.6, "id")
      .collect().map(r => (r.getInt(0), r.getInt(1), r.getDouble(2))).toSet
    assert(got === Set((1, 4, 0.5), (0, 5, 0.5), (1, 5, 0.5), (2, 5, 0.5)))
  }

  test("model save/load round trip keeps signatures") {
    val lsh = new MinHashLSH().setInputCol("vec").setOutputCol("hashes")
      .setSeed(2022L).setNumHashTables(2).setNumHashFunctionsPerTable(2)
    val model = lsh.fit(inputDf)
    val dir = java.nio.file.Files.createTempDirectory("minhash").toString
    model.save(dir)
    val loaded = MinHashLSHModel.load(spark, dir)
    val before = model.transform(inputDf).head.select("hashes").collect()
      .map(_.getSeq[Vector](0).map(_.toArray.toSeq))
    val after = loaded.transform(inputDf).head.select("hashes").collect()
      .map(_.getSeq[Vector](0).map(_.toArray.toSeq))
    assert(before === after)
  }
}
