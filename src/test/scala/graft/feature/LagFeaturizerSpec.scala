package graft.feature

import graft.SparkSpec
import org.apache.spark.sql.functions._

class LagFeaturizerSpec extends SparkSpec {

  private def data = {
    import spark.implicits._
    Seq(
      ("u1", 1L, 10.0), ("u1", 2L, 20.0), ("u1", 4L, 30.0), ("u1", 7L, 40.0),
      ("u2", 1L, 5.0), ("u2", 3L, 15.0))
      .toDF("user", "t", "v")
  }

  private def stage = new LagFeaturizer()
    .setInputCol("v").setPartitionCols("user").setOrderCols("t")

  test("lags, delta, and strictly-preceding rolling stats per key") {
    val out = stage.setNumLags(2).setRollingWindow(2).transform(data).head
      .orderBy("user", "t").collect()
    // u1 rows: t=1,2,4,7
    val r1 = out(0) // t=1: no history
    assert(r1.isNullAt(r1.fieldIndex("v_lag1")) && r1.isNullAt(r1.fieldIndex("t_delta")))
    assert(r1.getLong(r1.fieldIndex("v_roll_count")) == 0L)
    val r3 = out(2) // t=4: lag1=20, lag2=10, delta=2, roll over {10,20}
    assert(r3.getDouble(r3.fieldIndex("v_lag1")) == 20.0)
    assert(r3.getDouble(r3.fieldIndex("v_lag2")) == 10.0)
    assert(r3.getLong(r3.fieldIndex("t_delta")) == 2L)
    assert(r3.getDouble(r3.fieldIndex("v_roll_mean")) == 15.0)
    val r4 = out(3) // t=7: window of 2 strictly before -> {20,30}
    assert(r4.getDouble(r4.fieldIndex("v_roll_mean")) == 25.0)
    assert(r4.getDouble(r4.fieldIndex("v_roll_max")) == 30.0)
    // sample stddev of {20,30} = sqrt(50); single-value frame (t=2) is null
    assert(math.abs(r4.getDouble(r4.fieldIndex("v_roll_std")) - math.sqrt(50.0)) < 1e-12)
    val r2 = out(1)
    assert(r2.isNullAt(r2.fieldIndex("v_roll_std")))
    // u2 independent: its first row has no history from u1
    val u2r1 = out(4)
    assert(u2r1.isNullAt(u2r1.fieldIndex("v_lag1")))
  }

  test("timestamp order column yields fractional-second deltas") {
    import spark.implicits._
    val ts = Seq(("a", java.sql.Timestamp.valueOf("2024-01-01 00:00:00"), 1.0),
      ("a", java.sql.Timestamp.valueOf("2024-01-01 00:00:01.500000"), 2.0))
      .toDF("k", "ts", "v")
    val out = new LagFeaturizer().setInputCol("v")
      .setPartitionCols("k").setOrderCols("ts").setNumLags(1)
      .transform(ts).head.orderBy("ts").collect()
    assert(out(1).getDouble(out(1).fieldIndex("ts_delta")) == 1.5)
  }

  test("all features collapse into a single Window node (one shuffle, one sort)") {
    val plan = stage.setNumLags(3).setRollingWindow(5).transform(data).head
      .queryExecution.executedPlan.toString
    // rolling frame differs from the lag frame, so two Window operators
    // are expected at most — but only ONE exchange and ONE sort
    assert(plan.split("Exchange").length - 1 == 1, plan)
    assert(plan.split("Sort ").length - 1 == 1, plan)
  }

  test("rollingWindow 0 disables rolling stats; save/load round-trip") {
    val out = stage.setRollingWindow(0).transform(data).head
    assert(!out.columns.contains("v_roll_mean"))
    val dir = tmpDir()
    stage.setNumLags(4).setRollingWindow(7).save(dir)
    val back = LagFeaturizer.load(spark, dir)
    assert(back.getNumLags == 4 && back.getRollingWindow == 7)
    assert(back.getPartitionCols.sameElements(Array("user")))
    assert(back.getOrderCols.sameElements(Array("t")))
  }
}
