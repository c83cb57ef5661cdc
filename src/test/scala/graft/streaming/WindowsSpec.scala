package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.functions._

/**
 * Event-time session windows under out-of-order and LATE data in real
 * Structured Streaming — the streaming analog of
 * [[EventTimeSessionWindows]], pinning the reference semantics
 * (EventTimeSessionWindows.java:41 with the default event-time
 * trigger): an out-of-order row still inside the watermark MERGES
 * into its open session; a row behind the watermark is DROPPED, never
 * resurrecting an already-emitted session.
 */
class WindowsSpec extends SparkSpec {

  test("session windows: within-watermark rows merge, behind-watermark rows drop") {
    import spark.implicits._
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val stream = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(java.sql.Timestamp, Double)]
    def ts(s: Long) = new java.sql.Timestamp(s * 1000)

    // streaming session windows require a grouping key; a single user
    // key keeps the session arithmetic global
    val agg = stream.toDF().toDF("ts", "v")
      .withColumn("user", lit("u"))
      .withWatermark("ts", "5 seconds")
      .groupBy(col("user"), session_window(col("ts"), "10 seconds"))
      .agg(count(lit(1)).as("n"), sum("v").as("s"))
      .select(unix_millis(col("session_window.start")).as("start"),
        unix_millis(col("session_window.end")).as("end"), col("n"), col("s"))
    val q = agg.writeStream.outputMode("append")
      .format("memory").queryName("late_sessions").start()

    // batch 1: two in-order events 3 s apart → one open session [10, 23)
    stream.addData((ts(10), 1.0), (ts(13), 2.0))
    q.processAllAvailable()
    assert(spark.table("late_sessions").count() == 0) // watermark 8 s < session end

    // batch 2: OUT-OF-ORDER but inside the watermark (11 > 13-5) →
    // must merge into the open session, not start its own
    stream.addData((ts(11), 4.0))
    q.processAllAvailable()
    assert(spark.table("late_sessions").count() == 0)

    // batches 3-4: event time jumps far ahead; the watermark passes
    // the session end and the MERGED session is emitted exactly once
    stream.addData((ts(100), 8.0))
    q.processAllAvailable()
    stream.addData((ts(101), 16.0))
    q.processAllAvailable()
    val emitted = spark.table("late_sessions").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSet
    assert(emitted == Set((10000L, 23000L, 3L, 7.0)), emitted)

    // batch 5: LATE event behind the watermark (~96 s) aimed at the
    // emitted session → dropped; then flush everything else
    stream.addData((ts(12), 100.0))
    q.processAllAvailable()
    stream.addData((ts(300), 0.0))
    q.processAllAvailable()
    q.stop()

    val rows = spark.table("late_sessions").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSet
    // the late row resurrected nothing: no [12, 22) session, no sum
    // containing 100, and the [100, 111) session holds only its two rows
    assert(rows == Set(
      (10000L, 23000L, 3L, 7.0),
      (100000L, 111000L, 2L, 24.0)), rows)

    // the batch Sessionizer agrees with streaming on the surviving rows:
    // same gap rule → sessions {10,11,13}, {100,101}, {300}
    val batch = new Sessionizer().setKeyCols("k").setTimeCol("t").setGapMs(10000L)
      .transform(Seq(10L, 13L, 11L, 100L, 101L, 300L)
        .map(s => ("u", s * 1000)).toDF("k", "t")).head
    val perSession = batch.groupBy("session").agg(count(lit(1)).as("n"))
      .collect().map(_.getLong(1)).sorted.toSeq
    assert(perSession == Seq(1L, 2L, 3L), perSession)
  }
}
