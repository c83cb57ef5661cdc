package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.SparkSpec

/**
 * Versioned, delay-gated inference for OnlineKMeans — the round-8
 * asymmetry in the online tier: OnlineStandardScaler and OnlineLR
 * already had the reference's model-version + maxAllowedModelDelayMs
 * contract, OnlineKMeans only scored with the latest model. Reference:
 * clustering/kmeans/OnlineKMeansModel.java:95,126-135 (model-data
 * version counter consumed mid-inference).
 */
class OnlineKMeansVersionedSpec extends SparkSpec {

  private def vec(xs: Double*): org.apache.spark.sql.Column =
    org.apache.spark.ml.functions.array_to_vector(array(xs.map(lit): _*))

  private def init1d = {
    import spark.implicits._
    Seq((0, Array(0.0), 1.0), (1, Array(10.0), 1.0))
      .toDF("centroidId", "arr", "weight")
      .select(col("centroidId"),
        org.apache.spark.ml.functions.array_to_vector(col("arr")).as("centroid"),
        col("weight"))
  }

  private def batch1d(xs: Double*): DataFrame = {
    import spark.implicits._
    xs.toSeq.toDF("x").coalesce(1)
      .select(org.apache.spark.ml.functions.array_to_vector(array(col("x"))).as("features"))
  }

  private def planNodes(df: DataFrame): Int =
    df.queryExecution.logical.collect { case n => n }.size

  test("update with modelTimeMs builds a version stream; default update keeps the snapshot") {
    val snap = new OnlineKMeansModel().setDecayFactor(0.5).setModelData(init1d)
      .update(batch1d(1.0, 9.0))
    assert(snap.getModelData.head.columns.toSeq ==
      Seq("centroidId", "centroid", "weight"), "legacy shape must be preserved")

    var m = new OnlineKMeansModel().setDecayFactor(0.5).setModelData(init1d)
    m = m.update(batch1d(1.0, 9.0), "features", 1000L)
    m = m.update(batch1d(2.0, 8.0), "features", 2000L)
    val stream = m.getModelData.head.orderBy("version", "centroidId").collect()
    // v0 = the legacy init snapshot at MinValue, then v1, v2 — 2 rows each
    assert(stream.map(_.getAs[Long]("version")).toSeq == Seq(0L, 0L, 1L, 1L, 2L, 2L))
    assert(stream.filter(_.getAs[Long]("version") == 0L)
      .forall(_.getAs[Long]("modelTimeMs") == Long.MinValue))
    assert(stream.filter(_.getAs[Long]("version") == 1L)
      .forall(_.getAs[Long]("modelTimeMs") == 1000L))
  }

  test("delay gating scores each row by the earliest fresh-enough version; -1 before the stream") {
    var m = new OnlineKMeansModel().setDecayFactor(0.5).setModelData(init1d)
    m = m.update(batch1d(1.0, 9.0), "features", 1000L)  // v1 @ 1000
    m = m.update(batch1d(2.0, 8.0), "features", 2000L)  // v2 @ 2000
    import spark.implicits._
    val probes = Seq(
      (1L, Some(500L), 1.0),   // 500-0=500 <= 1000 -> v1
      (2L, Some(1500L), 9.0),  // 1500-0=1500 -> earliest >= 1500 is v2
      (3L, Some(2500L), 1.0),  // past every version -> -1, null prediction
      (4L, None, 1.0))         // null ts -> -1, null prediction
      .toDF("id", "ts", "x")
      .select(col("id"), col("ts"),
        org.apache.spark.ml.functions.array_to_vector(array(col("x"))).as("features"))
    val out = m.setMaxAllowedModelDelayMs(0L).setTimeCol("ts")
      .setModelVersionCol("ver").transform(probes).head
      .select("id", "ver", "prediction").collect()
      .map(r => r.getLong(0) -> (r.getLong(1), Option(r.get(2)))).toMap
    assert(out(1L) == (1L, Some(0)))
    assert(out(2L) == (2L, Some(1)))
    assert(out(3L) == (-1L, None), "rows newer than every version must get null/-1")
    assert(out(4L) == (-1L, None), "null ts must get the documented null/-1")

    // with the gate off, the same model scores everything by the latest version
    val latest = m.setMaxAllowedModelDelayMs(-1L).transform(probes).head
      .select("id", "prediction").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(latest == Map(1L -> 0, 2L -> 1, 3L -> 0, 4L -> 0))
  }

  test("fit with timeCol stamps versions with batch max event time (nulls never raise it)") {
    import spark.implicits._
    val df = Seq(
      (Some(5000L), 1.0), (None, 9.0),   // batch 0: stamp 5000
      (None, 2.0), (None, 8.0))          // batch 1: all-null -> MinValue+1 (unservable)
      .toDF("ts", "x")
      .select(col("ts"),
        org.apache.spark.ml.functions.array_to_vector(array(col("x"))).as("features"))
    val est = new OnlineKMeans().setK(2).setDecayFactor(0.5).setTimeCol("ts")
      .setInitialModelData(init1d)
    est.set(est.globalBatchSize, 2)
    val model = est.fit(df)
    val stamps = model.getModelData.head.select("version", "modelTimeMs").distinct()
      .orderBy("version").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(stamps.toSeq == Seq((0L, Long.MinValue), (1L, 5000L), (2L, Long.MinValue + 1)))

    // the unservable all-null version never wins under gating
    val probes = Seq(6000L, 999999999L).toDF("ts")
      .select(col("ts"), vec(1.0).as("features"))
    val scored = model.setMaxAllowedModelDelayMs(0L).setTimeCol("ts")
      .setModelVersionCol("ver").transform(probes).head.orderBy("ts").collect()
    assert(scored(0).getAs[Long]("ver") == -1L || scored(0).getAs[Long]("ver") == 1L)
    assert(scored(1).getAs[Long]("ver") == -1L, "MinValue+1 stamp must never serve late rows")
  }

  test("a versioned model refuses an unstamped update (silently-unservable version)") {
    var m = new OnlineKMeansModel().setDecayFactor(0.5).setModelData(init1d)
    m = m.update(batch1d(1.0, 9.0), "features", 1000L)
    val ex = intercept[IllegalArgumentException] { m.update(batch1d(2.0, 8.0)) }
    assert(ex.getMessage.contains("modelTimeMs"), ex.getMessage)
  }

  test("save/load restart continuity: version numbering and gating survive a new process") {
    var m = new OnlineKMeansModel().setDecayFactor(0.5).setModelData(init1d)
    m = m.update(batch1d(1.0, 9.0), "features", 1000L)
    val dir = tmpDir()
    m.save(dir)
    val back = OnlineKMeansModel.load(spark, dir)
    val resumed = back.update(batch1d(2.0, 8.0), "features", 2000L)
    val versions = resumed.getModelData.head.select("version").distinct()
      .collect().map(_.getLong(0)).sorted
    assert(versions.toSeq == Seq(0L, 1L, 2L), "restart must continue the version counter")
  }

  test("200 foreachBatch updates: bounded plan depth via CompactEvery localCheckpoint") {
    var m = new OnlineKMeansModel().setDecayFactor(0.5).setModelData(init1d)
    val batch = batch1d(1.0, 9.0).persist()
    batch.count()
    var maxNodes = 0
    var b = 0
    while (b < 200) {
      m = m.update(batch, "features", 1000L + b)
      if (b % 20 == 0 || b == 199) {
        val nodes = planNodes(m.getModelData.head)
        if (nodes > maxNodes) maxNodes = nodes
      }
      b += 1
    }
    batch.unpersist(blocking = false)
    assert(maxNodes < 300, s"plan grew to $maxNodes nodes — lineage not being compacted")
    val versions = m.getModelData.head.select("version").distinct().count()
    assert(versions == 201L)
  }
}
