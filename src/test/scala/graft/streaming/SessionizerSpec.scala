package graft.streaming

import org.apache.spark.sql.functions._
import graft.SparkSpec

class SessionizerSpec extends SparkSpec {

  private def events = {
    import spark.implicits._
    Seq(
      // user 1: [0, 1000, 2000] | gap | [10000, 10500] | gap | [30000]
      (1L, 1L, 0L), (2L, 1L, 1000L), (3L, 1L, 2000L),
      (4L, 1L, 10000L), (5L, 1L, 10500L),
      (6L, 1L, 30000L),
      // user 2: single event
      (7L, 2L, 500L),
      // user 3: tie at session boundary
      (8L, 3L, 0L), (9L, 3L, 0L), (10L, 3L, 9000L)
    ).toDF("event_id", "user_id", "ts")
  }

  private def run(gap: Long) = new Sessionizer()
    .setKeyCols("user_id").setTimeCol("ts").setGapMs(gap)
    .transform(events).head
    .select("event_id", "session", "session_start")
    .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap

  test("gaps split sessions per key; ordinals are 1-based") {
    val out = run(5000L)
    assert(out(1L) === (1L, 0L) && out(2L) === (1L, 0L) && out(3L) === (1L, 0L))
    assert(out(4L) === (2L, 10000L) && out(5L) === (2L, 10000L))
    assert(out(6L) === (3L, 30000L))
    assert(out(7L) === (1L, 500L))
  }

  test("rows tied on the timestamp share a session") {
    val out = run(5000L)
    assert(out(8L) === (1L, 0L) && out(9L) === (1L, 0L))
    assert(out(10L) === (2L, 9000L))
  }

  test("a gap exactly equal to gapMs does NOT split") {
    val out = run(8000L) // user1: 2000 -> 10000 is exactly 8000
    assert(out(3L)._1 === out(4L)._1)
  }

  test("assignment is invariant to input partitioning") {
    val s = new Sessionizer().setKeyCols("user_id").setGapMs(5000L)
    val a = s.transform(events).head.select("event_id", "session").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val b = s.transform(events.repartition(11, col("event_id"))).head
      .select("event_id", "session").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(a === b)
  }

  test("plan shuffles once and has no unpartitioned window") {
    val res = new Sessionizer().setKeyCols("user_id").setGapMs(5000L)
      .transform(events).head
    val plan = res.queryExecution.executedPlan.toString
    assert(!plan.contains("SinglePartition"), plan)
    assert(plan.sliding("Exchange".length).count(_ == "Exchange") <= 2, plan)
  }

  test("unset keyCols is rejected") {
    intercept[IllegalArgumentException] {
      new Sessionizer().transform(events)
    }
  }

  test("param save/load round-trip") {
    val tmp = java.nio.file.Files.createTempDirectory("sz").toString
    val s = new Sessionizer().setKeyCols("u", "device").setTimeCol("t")
      .setGapMs(60000L).setSessionCol("sid").setSessionStartCol("sstart")
    s.save(tmp)
    val loaded = Sessionizer.load(spark, tmp)
    assert(loaded.getKeyCols.toSeq === Seq("u", "device"))
    assert(loaded.getTimeCol === "t" && loaded.getGapMs === 60000L)
    assert(loaded.getSessionCol === "sid" && loaded.getSessionStartCol === "sstart")
  }
}
