package graft.evaluation

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ClusteringEvaluatorSpec extends SparkSpec {

  private def eval = new ClusteringEvaluator()
    .setFeaturesCol("f").setPredictionCol("cluster")

  test("two tight, well-separated clusters score near 1") {
    import spark.implicits._
    val df = Seq(
      (0, Array(0.0, 0.0)), (0, Array(0.1, 0.0)), (0, Array(0.0, 0.1)),
      (1, Array(10.0, 10.0)), (1, Array(10.1, 10.0)), (1, Array(10.0, 10.1)))
      .toDF("cluster", "f")
    val s = eval.summary(df)
    assert(s.numClusters == 2)
    assert(s.silhouette > 0.99, s"expected near-1 silhouette, got ${s.silhouette}")
  }

  test("hand computation on a 1-d example (self excluded in a, classic convention)") {
    import spark.implicits._
    // cluster 0: {0, 2}; cluster 1: {10}. Point x=0:
    //   a = mean sq dist to OTHER own-cluster members = 4/1 = 4
    //   b = 100 -> s = (100-4)/100 = 0.96
    // x=2: a = 4/1 = 4, b = 64 -> s = 60/64 = 0.9375
    // x=10: singleton cluster -> s = 0
    val df = Seq((0, Array(0.0)), (0, Array(2.0)), (1, Array(10.0))).toDF("cluster", "f")
    val rows = eval.transform(df).head.collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(rows(0L)._1 == 2 && math.abs(rows(0L)._2 - (0.96 + 0.9375) / 2) < 1e-12)
    assert(rows(1L) == (1L, 0.0))
  }

  test("differential vs spark.ml ClusteringEvaluator (squaredEuclidean silhouette)") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val pts = (0 until 200).map { i =>
      val c = i % 4
      (c, Array.fill(5)(c * 3.0 + rnd.nextGaussian()))
    }
    val df = pts.toDF("cluster", "f")
    val ours = eval.summary(df).silhouette
    val ref = new org.apache.spark.ml.evaluation.ClusteringEvaluator()
      .setFeaturesCol("fv").setPredictionCol("cluster")
      .setMetricName("silhouette").setDistanceMeasure("squaredEuclidean")
      .evaluate(df.withColumn("fv", org.apache.spark.ml.functions.array_to_vector(col("f"))))
    assert(math.abs(ours - ref) < 1e-9, s"ours=$ours spark.ml=$ref")
  }

  test("typedLit panel (k > maxLiteralClusters) equals the unrolled literal panel") {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    // 40 clusters — past a threshold of 8 the HOF path kicks in; both
    // plans must agree bit-for-bit with each other and with spark.ml
    val pts = (0 until 400).map { i =>
      val c = i % 40
      (c, Array.fill(6)(c * 2.0 + rnd.nextGaussian()))
    }
    val df = pts.toDF("cluster", "f")
    val unrolled = eval.setMaxLiteralClusters(1000).summary(df).silhouette
    val hof = eval.setMaxLiteralClusters(8).summary(df).silhouette
    assert(math.abs(unrolled - hof) < 1e-12, s"unrolled=$unrolled hof=$hof")
    val ref = new org.apache.spark.ml.evaluation.ClusteringEvaluator()
      .setFeaturesCol("fv").setPredictionCol("cluster")
      .setMetricName("silhouette").setDistanceMeasure("squaredEuclidean")
      .evaluate(df.withColumn("fv", org.apache.spark.ml.functions.array_to_vector(col("f"))))
    assert(math.abs(hof - ref) < 1e-9, s"hof=$hof spark.ml=$ref")
  }

  test("single-cluster labeling scores 0; float arrays accepted") {
    import spark.implicits._
    val df = Seq((0, Array(1.0f, 2.0f)), (0, Array(3.0f, 4.0f))).toDF("cluster", "f")
    val s = eval.summary(df)
    assert(s.numClusters == 1 && s.silhouette == 0.0)
  }

  test("param save/load round-trip") {
    val dir = tmpDir()
    eval.setFeaturesCol("emb").setPredictionCol("k").save(dir)
    val back = ClusteringEvaluator.load(spark, dir)
    assert(back.getFeaturesCol == "emb" && back.getPredictionCol == "k")
  }
}
