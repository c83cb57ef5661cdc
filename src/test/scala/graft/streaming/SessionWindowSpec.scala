package graft.streaming

import org.apache.spark.sql.functions._
import graft.SparkSpec

class SessionWindowSpec extends SparkSpec {

  private def sz = new Sessionizer()
    .setKeyCols("user_id").setTimeCol("ts").setGapMs(1000L)

  test("sessions() on a bounded frame agrees with transform()'s gaps-and-islands sessions") {
    import spark.implicits._
    val ev = Seq(
      (1L, 1000L), (1L, 1500L), (1L, 2400L), // session A: gap<=1000 chains
      (1L, 5000L),                           // session B
      (2L, 1000L), (2L, 2001L))              // user 2: two singleton sessions
      .toDF("user_id", "ts")

    val agg = sz.sessions(ev)
      .select("user_id", "session_start", "session_end", "n_events")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(agg == Set(
      (1L, 1000L, 3400L, 3L), (1L, 5000L, 6000L, 1L),
      (2L, 1000L, 2000L, 1L), (2L, 2001L, 3001L, 1L)), agg)

    // same partitioning of events as the per-row operator
    val perRow = sz.transform(ev).head
      .groupBy("user_id", "session")
      .agg(min("ts").as("s"), count(lit(1)).as("n"))
      .collect().map(r => (r.getLong(0), r.getLong(2), r.getLong(3))).toSet
    assert(perRow == agg.map(t => (t._1, t._2, t._4)))
  }

  test("sessions() on a stream: engine finalizes a session when the watermark passes its gap") {
    import spark.implicits._
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val stream = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, Long)]
    val df = stream.toDF().toDF("user_id", "ts")

    val q = sz.sessions(df)
      .writeStream.format("memory").queryName("sz_sessions").outputMode("append").start()
    stream.addData((1L, 1000L), (1L, 1500L))
    q.processAllAvailable()
    stream.addData((1L, 1800L)) // late-ish arrival merges into the open session
    q.processAllAvailable()
    stream.addData((2L, 50000L)) // pushes the watermark far past session 1's end
    q.processAllAvailable()
    q.stop()

    val rows = spark.table("sz_sessions")
      .select("user_id", "session_start", "session_end", "n_events")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    // session 1 closed and emitted exactly once, with the merged event counted
    assert(rows.contains((1L, 1000L, 2800L, 3L)), rows)
    assert(rows.count(_._1 == 1L) == 1, rows)
  }
}
