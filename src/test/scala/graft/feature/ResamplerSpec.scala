package graft.feature

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ResamplerSpec extends SparkSpec {

  private def rs = new Resampler()
    .setKeyCol("k").setTimeCol("t").setValueCols("v").setStepMs(10L)

  test("grid from first to last observation; last-in-bucket wins; ffill carries values") {
    import spark.implicits._
    // key a: obs at 0, 3 (same bucket 0 — 3 wins), 25, 58
    val df = Seq(
      ("a", 0L, 1.0), ("a", 3L, 2.0), ("a", 25L, 5.0), ("a", 58L, 9.0))
      .toDF("k", "t", "v")
    val out = rs.transform(df).head.orderBy("t").collect()
      .map(r => (r.getLong(1), r.getBoolean(2), Option(r.get(3)).map(_.asInstanceOf[Double])))
    assert(out.toSeq == Seq(
      (0L, true, Some(2.0)),   // bucket 0: last obs (t=3, v=2.0)
      (10L, false, Some(2.0)), // filled
      (20L, true, Some(5.0)),  // bucket 2: obs at 25
      (30L, false, Some(5.0)),
      (40L, false, Some(5.0)),
      (50L, true, Some(9.0))), out.toSeq)
  }

  test("strategy=null emits grid rows without carrying values") {
    import spark.implicits._
    val df = Seq(("a", 0L, 1.0), ("a", 35L, 5.0)).toDF("k", "t", "v")
    val out = rs.setStrategy("null").transform(df).head.orderBy("t").collect()
      .map(r => (r.getLong(1), r.getBoolean(2), Option(r.get(3))))
    assert(out.toSeq == Seq(
      (0L, true, Some(1.0)), (10L, false, None), (20L, false, None),
      (30L, true, Some(5.0))), out.toSeq)
  }

  test("maxFillMs stops stale carry-forward; keys are independent") {
    import spark.implicits._
    val df = Seq(
      ("a", 0L, 1.0), ("a", 45L, 5.0), // gap of 4 steps
      ("b", 100L, 7.0))                // other key: single obs
    .toDF("k", "t", "v")
    val out = rs.setMaxFillMs(20L).transform(df).head
      .where(col("k") === "a").orderBy("t").collect()
      .map(r => (r.getLong(1), Option(r.get(3)).map(_.asInstanceOf[Double])))
    // grid 10 and 20 are within 20ms of obs t=0; grid 30 is not
    assert(out.toSeq == Seq(
      (0L, Some(1.0)), (10L, Some(1.0)), (20L, Some(1.0)),
      (30L, None), (40L, Some(5.0))), out.toSeq)
    val b = rs.transform(df).head.where(col("k") === "b").collect()
    assert(b.length == 1 && b(0).getBoolean(2))
  }

  test("timestamp timeCol round-trips; negative epochs bucket correctly") {
    import spark.implicits._
    val df = Seq(("a", -25L, 1.0), ("a", 5L, 2.0)).toDF("k", "ms", "v")
      .select(col("k"), timestamp_millis(col("ms")).as("t"), col("v"))
    val out = new Resampler().setKeyCol("k").setTimeCol("t").setValueCols("v")
      .setStepMs(10L).transform(df).head.orderBy("t").collect()
    // floorDiv(-25, 10) = -3 -> grid -30, -20, -10, 0
    val ms = out.map(r => r.getTimestamp(1).getTime)
    assert(ms.toSeq == Seq(-30L, -20L, -10L, 0L), ms.toSeq)
    assert(out(0).getBoolean(2) && !out(1).getBoolean(2) && out(3).getBoolean(2))
  }

  test("multiple value columns fill together") {
    import spark.implicits._
    val df = Seq(("a", 0L, 1.0, "x"), ("a", 25L, 5.0, "y")).toDF("k", "t", "v", "s")
    val out = new Resampler().setKeyCol("k").setTimeCol("t")
      .setValueCols("v", "s").setStepMs(10L)
      .transform(df).head.orderBy("t").collect()
    assert(out(1).getDouble(3) == 1.0 && out(1).getString(4) == "x")
    assert(out(2).getDouble(3) == 5.0 && out(2).getString(4) == "y")
  }

  test("guards: duplicate (key, ts) refused; pathological gap fails fast; column collision") {
    import spark.implicits._
    val dup = Seq(("a", 5L, 1.0), ("a", 5L, 2.0)).toDF("k", "t", "v")
    def causes(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ causes(t.getCause)
    val e1 = intercept[Exception] { rs.transform(dup).head.collect() }
    assert(causes(e1).exists(_.contains("duplicate")), causes(e1).mkString(" | "))

    // duplicate pair BELOW its bucket's max (bucket 0-9 holds ts 9,5,5;
    // the survivor is ts=9): pins the assumption that the window
    // projection evaluates for ALL rows — if a future optimizer change
    // (InferWindowGroupLimit top-1 rewrite) prunes rank>1 rows before
    // their guard evaluates, the raise_error is silently skipped and
    // this intercept fails instead
    val dupLow = Seq(("a", 9L, 3.0), ("a", 5L, 1.0), ("a", 5L, 2.0)).toDF("k", "t", "v")
    val e1b = intercept[Exception] { rs.transform(dupLow).head.collect() }
    assert(causes(e1b).exists(_.contains("duplicate")), causes(e1b).mkString(" | "))

    val wide = Seq(("a", 0L, 1.0), ("a", 1000000000L, 2.0)).toDF("k", "t", "v")
    val e2 = intercept[Exception] {
      rs.setMaxGapSteps(1000).transform(wide).head.collect()
    }
    assert(causes(e2).exists(_.contains("grid steps")), causes(e2).mkString(" | "))

    intercept[IllegalArgumentException] {
      rs.transform(dup.withColumn("is_observed", lit(true)))
    }
  }

  test("param save/load round-trip") {
    val dir = tmpDir()
    rs.setStepMs(500L).setStrategy("null").setMaxFillMs(99L).save(dir)
    val back = Resampler.load(spark, dir)
    assert(back.getStepMs == 500L && back.getStrategy == "null" &&
      back.getMaxFillMs == 99L && back.getValueCols.toSeq == Seq("v"))
  }
}
