package graft.clustering

import org.apache.spark.ml.linalg.Vectors
import graft.SparkSpec

/** Fixture and expected merge distances mirror the reference
  * AgglomerativeClusteringTest. */
class AgglomerativeClusteringSpec extends SparkSpec {

  private val eps = 1e-7

  private def input = {
    import spark.implicits._
    Seq(
      Tuple1(Vectors.dense(1, 1)), Tuple1(Vectors.dense(1, 4)), Tuple1(Vectors.dense(1, 0)),
      Tuple1(Vectors.dense(4, 4)), Tuple1(Vectors.dense(4, 1.5)), Tuple1(Vectors.dense(4, 0))
    ).toDF("features")
  }

  private def mergeDistances(linkage: String, measure: String = "euclidean"): Seq[Double] = {
    val op = new AgglomerativeClustering().setLinkage(linkage)
      .setDistanceMeasure(measure).setComputeFullTree(true)
    op.transform(input)(1).select("distance").collect().map(_.getDouble(0)).toSeq
  }

  test("merge distances per linkage (reference fixtures)") {
    val cases = Seq(
      ("average", "euclidean", Seq(1.0, 1.5, 3.0, 3.1394402, 3.9559706)),
      ("single", "euclidean", Seq(1.0, 1.5, 2.5, 3.0, 3.0)),
      ("ward", "euclidean", Seq(1.0, 1.5, 3.0, 4.2573465, 5.5113519)),
      ("complete", "euclidean", Seq(1.0, 1.5, 3.0, 3.3541019, 5.0)),
      ("average", "cosine", Seq(0.0, 1.1102230e-16, 0.0636708, 0.1425070, 0.3664484)),
      ("average", "manhattan", Seq(1.0, 1.5, 3.0, 3.75, 4.875)))
    cases.foreach { case (linkage, measure, expected) =>
      val got = mergeDistances(linkage, measure)
      assert(got.length == expected.length, s"$linkage/$measure: $got")
      got.zip(expected).foreach { case (g, e) =>
        assert(math.abs(g - e) < eps, s"$linkage/$measure: got $got expected $expected")
      }
    }
  }

  private def clusterSets(op: AgglomerativeClustering): Set[Set[(Double, Double)]] = {
    val rows = op.transform(input).head
      .select("features", "prediction").collect()
      .map(r => (r.getAs[org.apache.spark.ml.linalg.Vector](0), r.getInt(1)))
    rows.groupBy(_._2).values.map(_.map(t => (t._1(0), t._1(1))).toSet).toSet
  }

  test("ward with numClusters=2 (reference membership)") {
    val got = clusterSets(new AgglomerativeClustering().setLinkage("ward").setNumClusters(2))
    assert(got === Set(
      Set((1.0, 1.0), (1.0, 0.0), (4.0, 1.5), (4.0, 0.0)),
      Set((1.0, 4.0), (4.0, 4.0))))
  }

  test("ward with distanceThreshold=2 (reference membership)") {
    val got = clusterSets(new AgglomerativeClustering().setLinkage("ward").setDistanceThreshold(2.0))
    assert(got === Set(
      Set((1.0, 1.0), (1.0, 0.0)),
      Set((1.0, 4.0)),
      Set((4.0, 4.0)),
      Set((4.0, 1.5), (4.0, 0.0))))
  }

  test("merge log is truncated at the stop point unless computeFullTree") {
    val op = new AgglomerativeClustering().setLinkage("ward").setNumClusters(2)
    assert(op.transform(input)(1).count() == 4)
    val full = new AgglomerativeClustering().setLinkage("ward").setNumClusters(2)
      .setComputeFullTree(true)
    assert(full.transform(input)(1).count() == 5)
  }

  test("ward rejects non-euclidean measures") {
    intercept[IllegalArgumentException] {
      new AgglomerativeClustering().setLinkage("ward").setDistanceMeasure("cosine")
        .transform(input)
    }
  }
}
