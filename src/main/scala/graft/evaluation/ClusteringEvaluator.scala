package graft.evaluation

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.api.{AlgoOperator, StageLoader}
import graft.param._
import graft.util.ReadWrite

/**
 * Clustering quality via the squared-Euclidean silhouette — the exact
 * silhouette under squared Euclidean distance, computed with the
 * centroid decomposition (mean over cluster C of ||x-y||² =
 * (Ψ_C + |C|·||x||² − 2·x·Y_C)/|C| where Y_C = Σy and Ψ_C = Σ||y||²),
 * so the per-point cost is O(k·d) against k broadcast cluster
 * summaries instead of O(n) pairwise distances. Same formulation as
 * spark.ml's ClusteringEvaluator (differential-tested against it);
 * the reference has no clustering evaluator at all
 * (flink-ml-lib/.../evaluation/ holds only binaryclassification) —
 * beyond-reference addition completing this engine's evaluator family
 * (binary / multiclass / regression / clustering).
 *
 * Semantics (classic Rousseeuw, the spark.ml convention): a(i) =
 * mean squared distance to the OTHER members of the own cluster
 * (self excluded — divide the distance sum by |C|−1), b(i) = min
 * over other clusters of mean squared distance, s(i) =
 * (b−a)/max(a,b); a point in a singleton cluster scores 0, and a
 * single-cluster labeling scores 0 everywhere (b is undefined — no
 * "other" cluster exists).
 *
 * Scale shape: ONE shuffle to the k×(d+2) cluster summaries
 * (posexplode + partial map-side aggregation), summaries collected to
 * the driver (model-sized, O(k·d)) and re-broadcast as literal
 * expressions, then a pure per-row projection and ONE final shuffle
 * to the k-row output. No n×k intermediate rows, no UDF — the whole
 * distance panel is zip_with/aggregate Column math inside codegen.
 * Past `maxLiteralClusters` the panel switches from k unrolled
 * expressions (codegen size k·d) to one typedLit summary array walked
 * by a transform() loop — constant codegen size at any k, same plan
 * shape otherwise.
 */
class ClusteringEvaluator extends AlgoOperator[ClusteringEvaluator]
    with HasFeaturesCol[ClusteringEvaluator]
    with HasPredictionCol[ClusteringEvaluator] {

  final val maxLiteralClusters: Param[Int] = param[Int](
    "maxLiteralClusters",
    "Above this k the distance panel switches from k unrolled literal " +
      "expressions (fastest at dashboard-sized k, but codegen size grows " +
      "as k·d) to ONE typedLit array-of-summaries walked by a transform() " +
      "loop — constant codegen size at any k. Same math, same result.",
    64, ParamValidators.gtEq(0.0))
  def getMaxLiteralClusters: Int = get(maxLiteralClusters)
  def setMaxLiteralClusters(v: Int): ClusteringEvaluator = set(maxLiteralClusters, v)

  /** Per-cluster rows: (cluster, n, mean_silhouette). */
  override def transform(inputs: DataFrame*): Array[DataFrame] = {
    require(inputs.size == 1)
    val df = inputs.head
    val f = transform_col(col(getFeaturesCol))
    val pts = df.select(col(getPredictionCol).cast("long").as("cluster"), f.as("__f"))

    // Cluster summaries: |C|, Y_C (per-dim sum), Ψ_C (sum of squared norms).
    val stats = pts
      .select(col("cluster"),
        aggregate(col("__f"), lit(0.0), (acc, x) => acc + x * x).as("sq"),
        posexplode(col("__f")).as(Seq("dim", "x")))
      .groupBy("cluster", "dim")
      .agg(count(lit(1)).as("n"), sum("x").as("y"),
        // sq repeats per dim; keep it only through dim 0 to avoid double counting
        sum(when(col("dim") === 0, col("sq")).otherwise(0.0)).as("psi"))
    val byCluster = stats.groupBy("cluster")
      .agg(first("n").as("n"), sum("psi").as("psi"),
        sort_array(collect_list(struct(col("dim"), col("y")))).as("ys"))
      .collect()
      .map { r =>
        (r.getLong(0), r.getLong(1), r.getDouble(2),
          r.getSeq[org.apache.spark.sql.Row](3).map(_.getDouble(1)).toArray)
      }
      .sortBy(_._1)
    require(byCluster.nonEmpty, "silhouette is undefined on an empty input")

    val ids = byCluster.map(_._1)
    val k = ids.length
    val idsLit = array(ids.map(lit(_)): _*)
    val countsLit = array(byCluster.map(c => lit(c._2)): _*)

    val sqn = aggregate(col("__f"), lit(0.0), (acc, x) => acc + x * x)
    // Raw distance SUM to cluster c: Σ_{y∈c} ||x−y||² = Ψ_c + |c|·||x||² − 2·x·Y_c.
    def sqDistSum(n: Long, psi: Double, y: Array[Double]): Column = {
      val yLit = array(y.map(lit(_)): _*)
      val dot = aggregate(zip_with(col("__f"), yLit, (a, b) => a * b), lit(0.0), (acc, x) => acc + x)
      lit(psi) + lit(n.toDouble) * col("__sqn") - lit(2.0) * dot
    }
    // Two plans for the k-distance panel, same math: unrolled literal
    // expressions (fastest at dashboard k; codegen grows as k·d) vs ONE
    // typedLit array-of-summaries walked by a transform() loop
    // (constant codegen size — the k >> 100 path).
    val sumsLit =
      if (k <= getMaxLiteralClusters)
        array(byCluster.map(c => sqDistSum(c._2, c._3, c._4)): _*)
      else {
        val ysLit = typedLit(byCluster.map(_._4.toSeq).toSeq)
        val psiLit = typedLit(byCluster.map(_._3).toSeq)
        val nDblLit = typedLit(byCluster.map(_._2.toDouble).toSeq)
        org.apache.spark.sql.functions.transform(ysLit, (y, i) => {
          val dot = aggregate(zip_with(col("__f"), y, (a, b) => a * b),
            lit(0.0), (acc, x) => acc + x)
          element_at(psiLit, i + 1) + element_at(nDblLit, i + 1) * col("__sqn") -
            lit(2.0) * dot
        })
      }
    val countsDbl = array(byCluster.map(c => lit(c._2.toDouble)): _*)

    val idx = array_position(idsLit, col("cluster"))
    val scored = pts
      .withColumn("__sqn", sqn)
      .withColumn("__sums", sumsLit)
      .withColumn("__idx", idx)
      .withColumn("__n", element_at(countsLit, col("__idx").cast("int")))
      // a: self excluded — the sum already omits ||x−x||²=0, divide by |C|−1
      // (singleton clusters score 0 below; keep the division null-safe for ANSI)
      .withColumn("__a",
        when(col("__n") > 1L,
          element_at(col("__sums"), col("__idx").cast("int"))
            / (col("__n").cast("double") - 1.0)))
      .withColumn("__b",
        if (k == 1) lit(null).cast("double")
        else array_min(filter(
          zip_with(col("__sums"), countsDbl, (s, n) => s / n),
          (_, i) => i =!= col("__idx") - 1)))
      .withColumn("__s",
        when(col("__n") === 1L, 0.0)
          .when(col("__b").isNull, 0.0)
          .when(greatest(col("__a"), col("__b")) === 0.0, 0.0)
          .otherwise((col("__b") - col("__a")) / greatest(col("__a"), col("__b"))))

    Array(scored.groupBy("cluster")
      .agg(count(lit(1)).as("n"), avg("__s").as("mean_silhouette")))
  }

  /** Overall silhouette (point-weighted mean) + cluster count —
    * O(k) driver work over the per-cluster rows. */
  def summary(input: DataFrame): ClusteringSummary = {
    val rows = transform(input).head.select("n", "mean_silhouette").collect()
    val total = rows.map(_.getLong(0)).sum
    ClusteringSummary(
      silhouette =
        if (total == 0) 0.0
        else rows.map(r => r.getDouble(1) * r.getLong(0)).sum / total,
      numClusters = rows.length)
  }

  /** Accept array<float|double>; normalize to array<double> for the math. */
  private def transform_col(c: Column): Column =
    org.apache.spark.sql.functions.transform(c, x => x.cast("double"))
}

case class ClusteringSummary(silhouette: Double, numClusters: Int)

object ClusteringEvaluator extends StageLoader[ClusteringEvaluator] {
  def load(spark: SparkSession, path: String): ClusteringEvaluator =
    ReadWrite.applyParams(new ClusteringEvaluator, path)
}
