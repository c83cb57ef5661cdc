package graft.feature

import org.apache.spark.ml.linalg.{SparseVector, Vector, Vectors}
import graft.SparkSpec
import graft.param.HandleInvalid

/**
 * Reference fixtures for VectorIndexer, ported from
 * feature/VectorIndexerTest.java:65-78 (train/test data), :142-194
 * (keep/skip/error + large maxCategories expected outputs), :112-140
 * (sparse in -> sparse out), :228-253 (model-data category maps).
 */
class VectorIndexerFixtureSpec extends SparkSpec {
  import org.apache.spark.sql.functions._

  private def trainDf = {
    import spark.implicits._
    Seq(
      Vectors.dense(1, 1), Vectors.dense(2, -1), Vectors.dense(3, 1),
      Vectors.dense(4, 0), Vectors.dense(5, 0)).map(Tuple1(_)).toDF("input")
  }
  private def testDf = {
    import spark.implicits._
    Seq((0, Vectors.dense(0, 2)), (1, Vectors.dense(0, 0)), (2, Vectors.dense(0, -1)))
      .toDF("id", "input")
  }

  private def outputs(handle: String, maxCat: Int): Seq[(Int, Seq[Double])] = {
    val model = new VectorIndexer().setInputCol("input").setOutputCol("output")
      .setMaxCategories(maxCat).setHandleInvalid(handle).fit(trainDf)
    model.transform(testDf).head.orderBy("id").select("id", "output").collect()
      .map(r => (r.getInt(0), r.getAs[Vector](1).toArray.toSeq)).toSeq
  }

  test("keep: unseen value maps to numCategories; continuous dim passes through") {
    // VectorIndexerTest.java:164-172 — maxCategories=3 leaves dim 0
    // continuous (5 distinct) and indexes dim 1 as {0->0, -1->1, 1->2}
    assert(outputs(HandleInvalid.KEEP, 3) ==
      Seq((0, Seq(0.0, 3.0)), (1, Seq(0.0, 0.0)), (2, Seq(0.0, 1.0))))
  }

  test("skip: rows with unseen categorical values are dropped") {
    // VectorIndexerTest.java:174-178
    assert(outputs(HandleInvalid.SKIP, 3) ==
      Seq((1, Seq(0.0, 0.0)), (2, Seq(0.0, 1.0))))
  }

  test("error: reference message on unseen value") {
    // VectorIndexerTest.java:180-193
    val e = intercept[Exception] { outputs(HandleInvalid.ERROR, 3) }
    def messages(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ messages(t.getCause)
    assert(messages(e).exists(_.contains(
      "The input contains unseen double: 2.0. See handleInvalid parameter for more options.")),
      s"got: ${messages(e)}")
  }

  test("large maxCategories: every dim categorical, unseen -> numCategories") {
    // VectorIndexerTest.java:142-156 — dim 0 {1..5} -> indices 0..4,
    // unseen 0 -> 5; dim 1 {0->0, -1->1, 1->2}, unseen 2 -> 3
    assert(outputs(HandleInvalid.KEEP, Int.MaxValue) ==
      Seq((0, Seq(5.0, 3.0)), (1, Seq(5.0, 0.0)), (2, Seq(5.0, 1.0))))
  }

  test("sparse input stays sparse; implicit zeros map through 0->0") {
    // VectorIndexerTest.java:112-140
    import spark.implicits._
    val sparseTrain = Seq(
      Vectors.sparse(2, Array(0), Array(1.0)),
      Vectors.sparse(2, Array(0, 1), Array(2.0, -1.0)),
      Vectors.sparse(2, Array(0, 1), Array(3.0, 1.0)),
      Vectors.sparse(2, Array(0), Array(4.0)),
      Vectors.sparse(2, Array(0), Array(5.0))).map(Tuple1(_)).toDF("input")
    val sparseTest = Seq(Tuple1(Vectors.sparse(2, Array(0, 1), Array(0.0, 2.0)))).toDF("input")
    val out = new VectorIndexer().setInputCol("input").setOutputCol("output")
      .setMaxCategories(3).setHandleInvalid(HandleInvalid.KEEP)
      .fit(sparseTrain).transform(sparseTest).head
      .select("output").collect().map(_.getAs[Vector](0))
    assert(out.length == 1)
    assert(out.head.isInstanceOf[SparseVector], "sparse input must yield sparse output")
    assert(out.head == Vectors.sparse(2, Array(0, 1), Array(0.0, 3.0)))
  }

  test("model data: only categorical dims, 0.0 pinned to index 0") {
    // VectorIndexerTest.java:228-253 — expected {1: {-1->1, 0->0, 1->2}}
    val model = new VectorIndexer().setInputCol("input").setOutputCol("output")
      .setMaxCategories(3).fit(trainDf)
    val rows = model.getModelData.head.select("dim", "value", "index").collect()
      .map(r => (r.getInt(0), r.getDouble(1), r.getInt(2))).toSet
    assert(rows == Set((1, -1.0, 1), (1, 0.0, 0), (1, 1.0, 2)))
  }
}
