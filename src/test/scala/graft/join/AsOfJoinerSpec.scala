package graft.join

import org.apache.spark.sql.functions._
import graft.SparkSpec

class AsOfJoinerSpec extends SparkSpec {

  // clicks (left) and feature snapshots (right) for two users
  private def clicks = {
    import spark.implicits._
    Seq(
      (1L, 100L, 5L),   // u5: before any snapshot
      (2L, 1000L, 5L),  // u5: exactly at snapshot ts
      (3L, 1500L, 5L),  // u5: between snapshots
      (4L, 9000L, 5L),  // u5: after last snapshot
      (5L, 800L, 6L)    // u6: no snapshots at all
    ).toDF("event_id", "ts", "user_id")
  }
  private def snapshots = {
    import spark.implicits._
    Seq(
      (1000L, 5L, 10.0),
      (2000L, 5L, 20.0)
    ).toDF("ts", "user_id", "score")
  }

  private def join(j: AsOfJoiner) =
    j.setOnCols("user_id").setLeftTimeCol("ts").setRightTimeCol("ts")
      .setValueCols("score")
      .transform(clicks, snapshots).head
      .select("event_id", "score", "matched_ts")
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) None else Some(r.getDouble(1)),
          if (r.isNullAt(2)) None else Some(r.getLong(2)))).toMap

  test("backward picks the latest snapshot at-or-before each row") {
    val out = join(new AsOfJoiner())
    assert(out(1L) === (None, None))                    // nothing before 100
    assert(out(2L) === (Some(10.0), Some(1000L)))       // equal ts included
    assert(out(3L) === (Some(10.0), Some(1000L)))
    assert(out(4L) === (Some(20.0), Some(2000L)))
    assert(out(5L) === (None, None))                    // user without snapshots
  }

  test("forward picks the earliest snapshot at-or-after each row") {
    val out = join(new AsOfJoiner().setDirection(AsOfJoiner.Forward))
    assert(out(1L) === (Some(10.0), Some(1000L)))
    assert(out(2L) === (Some(10.0), Some(1000L)))       // equal ts included
    assert(out(3L) === (Some(20.0), Some(2000L)))
    assert(out(4L) === (None, None))                    // nothing after 9000
    assert(out(5L) === (None, None))
  }

  test("tolerance voids matches that are too old") {
    val out = join(new AsOfJoiner().setToleranceMs(600L))
    assert(out(2L) === (Some(10.0), Some(1000L)))       // distance 0
    assert(out(3L) === (Some(10.0), Some(1000L)))       // distance 500 <= 600
    assert(out(4L) === (None, None))                    // distance 7000 > 600
  }

  test("left columns and row count are preserved") {
    val res = new AsOfJoiner().setOnCols("user_id").setValueCols("score")
      .transform(clicks, snapshots).head
    assert(res.count() === 5)
    assert(res.columns.toSeq === Seq("event_id", "ts", "user_id", "matched_ts", "score"))
  }

  test("result is invariant to input partitioning") {
    val j = new AsOfJoiner().setOnCols("user_id").setValueCols("score")
    val a = j.transform(clicks, snapshots).head.collect().toSet
    val b = j.transform(clicks.repartition(7, col("event_id")),
      snapshots.repartition(3)).head.collect().toSet
    assert(a === b)
  }

  test("value-column collision with left is rejected") {
    intercept[IllegalArgumentException] {
      new AsOfJoiner().setOnCols("user_id").setValueCols("ts")
        .transform(clicks, snapshots)
    }
  }

  test("plan has one exchange and no join node") {
    val res = new AsOfJoiner().setOnCols("user_id").setValueCols("score")
      .transform(clicks, snapshots).head
    val plan = res.queryExecution.executedPlan.toString
    assert(!plan.contains("Join"), plan)
    assert(!plan.contains("CartesianProduct"), plan)
  }

  test("param save/load round-trip") {
    val tmp = java.nio.file.Files.createTempDirectory("aoj").toString
    val j = new AsOfJoiner().setOnCols("u", "k").setLeftTimeCol("lt").setRightTimeCol("rt")
      .setValueCols("a", "b").setDirection(AsOfJoiner.Forward)
      .setToleranceMs(123L).setMatchedTimeCol("mt")
    j.save(tmp)
    val loaded = AsOfJoiner.load(spark, tmp)
    assert(loaded.getOnCols.toSeq === Seq("u", "k"))
    assert(loaded.getLeftTimeCol === "lt" && loaded.getRightTimeCol === "rt")
    assert(loaded.getValueCols.toSeq === Seq("a", "b"))
    assert(loaded.getDirection === AsOfJoiner.Forward)
    assert(loaded.getToleranceMs === 123L && loaded.getMatchedTimeCol === "mt")
  }
}
