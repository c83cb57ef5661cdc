package graft.ann

import org.apache.spark.ml.linalg.Vectors
import graft.SparkSpec

class NearestNeighborsSpec extends SparkSpec {

  private def toVec = org.apache.spark.ml.functions.array_to_vector _

  private def data = {
    import spark.implicits._
    Seq(
      (1L, Seq(1.0, 0.0, 0.0)),
      (2L, Seq(0.9, 0.1, 0.0)),
      (3L, Seq(0.0, 1.0, 0.0)),
      (4L, Seq(0.0, 0.0, 1.0)),
      (5L, Seq(-1.0, 0.0, 0.0))).toDF("id", "arr")
      .select(org.apache.spark.sql.functions.col("id"),
        org.apache.spark.ml.functions.array_to_vector(
          org.apache.spark.sql.functions.col("arr")).as("vec"))
  }

  private def queries = {
    import spark.implicits._
    Seq((100L, Seq(1.0, 0.05, 0.0))).toDF("id", "arr")
      .select(org.apache.spark.sql.functions.col("id"),
        org.apache.spark.ml.functions.array_to_vector(
          org.apache.spark.sql.functions.col("arr")).as("vec"))
  }

  test("BruteForceCosineKnn returns exact cosine top-k in rank order") {
    val out = new BruteForceCosineKnn().setK(3).transform(data, queries).head
      .orderBy(org.apache.spark.sql.functions.col("similarity").desc)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(out.length == 3)
    // cos(q, v1) = 1/|q| ≈ 0.99875 edges out cos(q, v2) ≈ 0.99816
    assert(out.map(_._2).toSeq == Seq(1L, 2L, 3L))
    assert(out.forall(_._1 == 100L))
    assert(out(0)._3 > out(1)._3 && out(1)._3 > out(2)._3)
  }

  test("CosineLshKnn finds the identical and near-identical vectors") {
    // identical vectors always share a bucket; a close vector shares one
    // with overwhelming probability at 8 planes (deterministic via seed)
    val out = new CosineLshKnn().setK(3).setSeed(7L).setNumPlanes(8)
      .transform(data, queries).head
      .collect().map(_.getLong(1)).toSet
    assert(out.contains(1L) || out.contains(2L))
    assert(!out.contains(5L)) // opposite direction can never share a sign bucket
  }

  test("IvfCosineKnn with a fixed codebook probes only the closest cells") {
    import spark.implicits._
    // codebook: cell 0 points at +x, cell 1 at +y, cell 2 at +z
    val init = Seq((0, Seq(1.0, 0.0, 0.0)), (1, Seq(0.0, 1.0, 0.0)), (2, Seq(0.0, 0.0, 1.0)))
      .toDF("centroidId", "arr")
      .select(org.apache.spark.sql.functions.col("centroidId"),
        toVec(org.apache.spark.sql.functions.col("arr")).as("centroid"))
    // cell assignment by max cosine: rows 1,2 → cell 0; row 3 → cell 1;
    // row 4 → cell 2; row 5 (−x) → cell 1 (first of the 0.0 ties).
    // nprobe=1: the query (≈+x) probes only cell 0 → neighbors {1, 2}.
    val out = new IvfCosineKnn().setK(5).setNprobe(1).setTrainIters(0)
      .setInitialCentroids(init)
      .transform(data, queries).head
      .collect().map(_.getLong(1)).toSet
    assert(out == Set(1L, 2L))
    // nprobe = numLists degenerates to exact brute force
    val all = new IvfCosineKnn().setK(5).setNprobe(3).setTrainIters(0)
      .setInitialCentroids(init)
      .transform(data, queries).head
      .collect().map(_.getLong(1)).toSet
    val bf = new BruteForceCosineKnn().setK(5).transform(data, queries).head
      .collect().map(_.getLong(1)).toSet
    assert(all == bf)
  }

  test("IvfCosineKnn trains its own codebook when none is provided") {
    val out = new IvfCosineKnn().setK(2).setNumLists(2).setNprobe(2)
      .setTrainIters(5).setSeed(11L)
      .transform(data, queries).head
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(out.nonEmpty && out.forall(_._1 == 100L))
  }

  test("LSH candidate set is a subset of the brute-force ranking domain") {
    val bf = new BruteForceCosineKnn().setK(5).transform(data, queries).head
      .collect().map(_.getLong(1)).toSet
    val lsh = new CosineLshKnn().setK(5).setSeed(7L).transform(data, queries).head
      .collect().map(_.getLong(1)).toSet
    assert(lsh.subsetOf(bf))
  }
}
