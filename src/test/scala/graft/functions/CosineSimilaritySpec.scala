package graft.functions

import org.apache.spark.sql.functions.col
import graft.SparkSpec

class CosineSimilaritySpec extends SparkSpec {

  private val eps = 1e-12

  test("cosine values, zero-norm, mismatch, and null handling") {
    Functions.register(spark)
    import spark.implicits._
    val df = Seq(
      (1L, Seq(1.0, 0.0), Seq(1.0, 0.0)),   // identical → 1
      (2L, Seq(1.0, 0.0), Seq(0.0, 1.0)),   // orthogonal → 0
      (3L, Seq(1.0, 0.0), Seq(-2.0, 0.0)),  // opposite → −1
      (4L, Seq(0.0, 0.0), Seq(1.0, 2.0))    // zero norm → 0
    ).toDF("id", "a", "b")
    val got = df.select(col("id"), Functions.cosineSimilarity(col("a"), col("b")).as("c"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(math.abs(got(1L) - 1.0) < eps)
    assert(math.abs(got(2L)) < eps)
    assert(math.abs(got(3L) + 1.0) < eps)
    assert(got(4L) == 0.0)

    val mismatch = Seq((Seq(1.0, 2.0), Seq(1.0))).toDF("a", "b")
      .select(Functions.cosineSimilarity(col("a"), col("b")).as("c")).collect()
    assert(mismatch.head.isNullAt(0))

    // non-nullable children (array literals): the expression must stay
    // nullable so codegen allocates an isNull slot for the
    // length-mismatch branch instead of producing uncompilable code /
    // a constant-folded false IsNull
    val lits = spark.range(1).selectExpr(
      "cosineSimilarity(array(1.0d, 2.0d), array(1.0d)) AS c",
      "isnull(cosineSimilarity(array(1.0d, 2.0d), array(1.0d))) AS isn")
    val r = lits.collect().head
    assert(r.isNullAt(0) && r.getBoolean(1))
  }

  test("interpreted eval agrees with codegen") {
    Functions.register(spark)
    import spark.implicits._
    val df = Seq((Seq(0.3, -1.2, 2.5), Seq(1.1, 0.4, -0.7))).toDF("a", "b")
    val codegen = df.select(Functions.cosineSimilarity(col("a"), col("b"))).head().getDouble(0)
    // interpreted path via direct nullSafeEval
    val toAd = (s: Seq[Double]) =>
      org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(s.toArray)
    val interpreted = CosineSimilarity(null, null)
      .nullSafeEval(toAd(Seq(0.3, -1.2, 2.5)), toAd(Seq(1.1, 0.4, -0.7)))
      .asInstanceOf[Double]
    assert(math.abs(codegen - interpreted) < eps)
  }

  test("registered SQL function stays inside whole-stage codegen (no ScalaUDF)") {
    Functions.register(spark)
    // a parquet scan, so the projection cannot constant-fold away
    spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .selectExpr("CAST(embedding AS ARRAY<DOUBLE>) AS a",
        "CAST(embedding AS ARRAY<DOUBLE>) AS b")
      .createOrReplaceTempView("cs_t")
    val q = spark.sql("SELECT cosineSimilarity(a, b) AS c FROM cs_t")
    // self-similarity of every embedding is exactly 1
    assert(q.collect().forall(r => math.abs(r.getDouble(0) - 1.0) < 1e-9))
    val plan = q.queryExecution.executedPlan.toString
    assert(!plan.contains("ScalaUDF"), plan)
    // the "*(n)" prefix marks a whole-stage-codegen stage: the projection
    // holding cosinesimilarity fused into generated code
    assert(plan.contains("*(1) Project [cosinesimilarity"), plan)
  }
}
