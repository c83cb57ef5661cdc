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

  private def windowedSets(op: AgglomerativeClustering,
      df: org.apache.spark.sql.DataFrame): Seq[Set[(Double, Double)]] = {
    val rows = op.transform(df).head
      .select("features", "prediction").collect()
      .map(r => (r.getAs[org.apache.spark.ml.linalg.Vector](0), r.getInt(1)))
    rows.groupBy(_._2).values.map(_.map(t => (t._1(0), t._1(1))).toSet).toSeq
  }

  test("count tumbling windows cluster the first 5 rows, drop the partial tail") {
    // AgglomerativeClusteringTest.java:117-125,236-260: window of 5 over
    // the 6-row input → only the full window emits; expected membership
    // {(1,1),(1,0)} and {(1,4),(4,4),(4,1.5)}; (4,0) is in the unfired
    // partial window
    val op = new AgglomerativeClustering().setLinkage("ward")
      .setWindows(graft.streaming.CountTumblingWindows(5))
    val got = windowedSets(op, input)
    val expected = Seq(
      Set((1.0, 1.0), (1.0, 0.0)),
      Set((1.0, 4.0), (4.0, 4.0), (4.0, 1.5)))
    expected.foreach { e =>
      assert(got.exists(a => e.subsetOf(a)), s"missing $e in $got")
    }
    assert(got.flatten.size == 5, s"partial window must be dropped: $got")
  }

  test("event-time tumbling windows cluster each second separately") {
    // AgglomerativeClusteringTest.java:126-132,302-340: ts = x0 seconds,
    // 1s tumbling → the x0=1 rows and x0=4 rows are independent problems,
    // each split into numClusters=2
    import spark.implicits._
    val df = Seq(
      (Vectors.dense(1, 1), 1000L), (Vectors.dense(1, 4), 1000L), (Vectors.dense(1, 0), 1000L),
      (Vectors.dense(4, 4), 4000L), (Vectors.dense(4, 1.5), 4000L), (Vectors.dense(4, 0), 4000L)
    ).toDF("features", "ts")
    val op = new AgglomerativeClustering().setLinkage("ward")
      .setWindows(graft.streaming.EventTimeTumblingWindows(1000L))
    val got = windowedSets(op, df)
    val expected = Seq(
      Set((1.0, 1.0), (1.0, 0.0)), Set((1.0, 4.0)),
      Set((4.0, 0.0), (4.0, 1.5)), Set((4.0, 4.0)))
    expected.foreach { e =>
      assert(got.exists(a => e.subsetOf(a)), s"missing $e in $got")
    }
  }

  test("event-time session windows split on gaps larger than the gap param") {
    import spark.implicits._
    // two sessions: ts 0,500,900 then a 5s gap to 5900,6200
    val df = Seq(
      (Vectors.dense(0, 0), 0L), (Vectors.dense(0, 1), 500L), (Vectors.dense(0, 2), 900L),
      (Vectors.dense(9, 0), 5900L), (Vectors.dense(9, 1), 6200L)
    ).toDF("features", "ts")
    val op = new AgglomerativeClustering().setLinkage("ward").setNumClusters(1)
      .setWindows(graft.streaming.EventTimeSessionWindows(1000L))
    val got = windowedSets(op, df)
    // numClusters=1 per session → each session is one cluster
    val expected = Seq(
      Set((0.0, 0.0), (0.0, 1.0), (0.0, 2.0)),
      Set((9.0, 0.0), (9.0, 1.0)))
    expected.foreach { e =>
      assert(got.exists(a => e.subsetOf(a) && a.subsetOf(expected.flatten.toSet)),
        s"missing $e in $got")
    }
  }
}
