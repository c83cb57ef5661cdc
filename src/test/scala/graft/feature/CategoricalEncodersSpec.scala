package graft.feature

import graft.SparkSpec
import org.apache.spark.sql.functions._

class CategoricalEncodersSpec extends SparkSpec {

  private def train = {
    import spark.implicits._
    Seq(("a", 1.0), ("a", 3.0), ("a", 2.0), ("b", 10.0), ("c", 100.0))
      .toDF("cat", "y")
  }

  test("FrequencyEncoder: relative frequency, count mode, unseen -> 0") {
    import spark.implicits._
    val model = new FrequencyEncoder().setInputCol("cat").setOutputCol("enc")
      .fit(train)
    val out = model.transform(train).head
      .select("cat", "enc").distinct().collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(math.abs(out("a") - 0.6) < 1e-12)
    assert(math.abs(out("b") - 0.2) < 1e-12)

    val test = Seq("a", "zzz").toDF("cat")
    val enc = model.transform(test).head.select("cat", "enc").collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(enc("zzz") == 0.0)

    val counts = new FrequencyEncoder().setInputCol("cat").setOutputCol("enc")
      .setEncoding("count").fit(train).transform(test).head
      .select("cat", "enc").collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(counts("a") == 3.0 && counts("zzz") == 0.0)
  }

  test("TargetEncoder: m-estimate shrinkage toward the prior; unseen -> prior") {
    import spark.implicits._
    // prior = 116/5 = 23.2; a: n=3 mean=2 -> (6 + 2*23.2)/(3+2) = 10.48
    val model = new TargetEncoder().setInputCol("cat").setOutputCol("enc")
      .setLabelCol("y").setSmoothing(2.0).fit(train)
    val test = Seq("a", "c", "zzz").toDF("cat")
    val enc = model.transform(test).head.select("cat", "enc").collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(math.abs(enc("a") - (6.0 + 2.0 * 23.2) / 5.0) < 1e-12)
    assert(math.abs(enc("c") - (100.0 + 2.0 * 23.2) / 3.0) < 1e-12)
    assert(math.abs(enc("zzz") - 23.2) < 1e-12)
  }

  test("TargetEncoder: smoothing 0 is the raw category mean; null labels dropped") {
    import spark.implicits._
    val withNull = train.union(Seq(("a", null.asInstanceOf[java.lang.Double]))
      .toDF("cat", "y").select(col("cat"), col("y").cast("double")))
    val model = new TargetEncoder().setInputCol("cat").setOutputCol("enc")
      .setLabelCol("y").setSmoothing(0.0).fit(withNull)
    val enc = model.transform(Seq("a").toDF("cat")).head
      .select("enc").head().getDouble(0)
    assert(math.abs(enc - 2.0) < 1e-12)
  }

  test("transform is a broadcast join (no fact-table shuffle)") {
    val model = new TargetEncoder().setInputCol("cat").setOutputCol("enc")
      .setLabelCol("y").fit(train)
    val plan = model.transform(train).head.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan)
  }

  test("fit plans no unpartitioned window over the model table") {
    // the total/prior must come from a scalar aggregate, not
    // Window.partitionBy() — which would funnel the entire
    // |categories|-row model through ONE partition (a straggler at the
    // tens-of-millions of categories these encoders exist for)
    for (plan <- Seq(
      new FrequencyEncoder().setInputCol("cat").setOutputCol("enc")
        .fit(train).getModelData.head.queryExecution.executedPlan.toString,
      new TargetEncoder().setInputCol("cat").setOutputCol("enc").setLabelCol("y")
        .fit(train).getModelData.head.queryExecution.executedPlan.toString)) {
      assert(!plan.contains("Window"), plan)
    }
  }

  test("TargetEncoder.fit refuses an all-null label column with a clear message") {
    import spark.implicits._
    val allNull = Seq("a", "b").toDF("cat")
      .withColumn("y", lit(null).cast("double"))
    val e = intercept[IllegalArgumentException] {
      new TargetEncoder().setInputCol("cat").setOutputCol("enc")
        .setLabelCol("y").fit(allNull)
    }
    assert(e.getMessage.contains("non-null label"))
  }

  test("save/load round-trip preserves params and model data") {
    import spark.implicits._
    val dir = tmpDir()
    new TargetEncoder().setInputCol("cat").setOutputCol("enc").setLabelCol("y")
      .setSmoothing(5.0).fit(train).save(dir)
    val back = TargetEncoderModel.load(spark, dir)
    assert(back.getSmoothing == 5.0 && back.getInputCol == "cat")
    val enc = back.transform(Seq("b").toDF("cat")).head
      .select("enc").head().getDouble(0)
    assert(math.abs(enc - (10.0 + 5.0 * 23.2) / 6.0) < 1e-12)

    val fdir = tmpDir()
    new FrequencyEncoder().setInputCol("cat").setOutputCol("enc")
      .setEncoding("count").fit(train).save(fdir)
    val fback = FrequencyEncoderModel.load(spark, fdir)
    assert(fback.getEncoding == "count")
    val c = fback.transform(Seq("a").toDF("cat")).head
      .select("enc").head().getDouble(0)
    assert(c == 3.0)
  }
}
