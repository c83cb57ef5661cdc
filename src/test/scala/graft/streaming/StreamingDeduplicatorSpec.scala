package graft.streaming

import java.util.concurrent.CopyOnWriteArrayList
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import graft.SparkSpec

class StreamingDeduplicatorSpec extends SparkSpec {

  private def dedup() = new StreamingDeduplicator()
    .setInputCol("text").setIdCol("id").setTimeCol("ts")

  test("batch mode matches ExactDeduplicator's flags and adds occurrence ordinals") {
    import spark.implicits._
    val docs = Seq(
      (3L, "Hello   World", 30L), (1L, "hello world", 10L),
      (2L, "unique doc", 20L), (4L, "HELLO WORLD  ", 40L))
      .toDF("id", "text", "ts")

    val got = dedup().transform(docs).head
      .select("id", "canonical_id", "is_duplicate", "occurrence")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2), r.getLong(3))).toSet
    assert(got == Set(
      (1L, 1L, false, 1L), (3L, 1L, true, 2L), (4L, 1L, true, 3L),
      (2L, 2L, false, 1L)))

    // flags agree with the batch operator on the same input
    val exact = new graft.text.ExactDeduplicator().setIdCol("id").setInputCol("text")
      .transform(docs).head
      .select(col("id"), col("canonical_id"), col("is_exact_duplicate").as("is_duplicate"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2))).toSet
    assert(exact == got.map(t => (t._1, t._2, t._3)))
  }

  test("stream: duplicates recognized across micro-batches; state survives restart via checkpoint") {
    import spark.implicits._
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val chk = tmpDir()
    val sink = new CopyOnWriteArrayList[(Long, Long, Boolean, Long)]()
    val stream = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, String, Long)]
    val df = stream.toDF().toDF("id", "text", "ts")

    def start() = dedup().transform(df).head
      .writeStream.outputMode("append")
      .option("checkpointLocation", chk)
      .foreachBatch { (b: org.apache.spark.sql.Dataset[Row], _: Long) =>
        b.select("id", "canonical_id", "is_duplicate", "occurrence").collect().foreach(r =>
          sink.add((r.getLong(0), r.getLong(1), r.getBoolean(2), r.getLong(3))))
      }.start()

    val q1 = start()
    stream.addData((1L, "alpha doc", 100L), (2L, "beta doc", 110L))
    q1.processAllAvailable()
    stream.addData((3L, "Alpha  Doc", 200L)) // cross-batch duplicate of id 1
    q1.processAllAvailable()
    q1.stop() // simulated failure

    stream.addData((4L, "ALPHA DOC", 300L)) // arrives while down
    val q2 = start()
    q2.processAllAvailable()
    q2.stop()

    import scala.jdk.CollectionConverters._
    val rows = sink.asScala.toSet
    // ids 3 and 4 are duplicates of 1 — id 4 only flaggable if the
    // restarted query recovered per-fingerprint state from the checkpoint
    assert(rows == Set(
      (1L, 1L, false, 1L), (2L, 2L, false, 1L),
      (3L, 1L, true, 2L), (4L, 1L, true, 3L)), rows)
  }

  test("stream: event-time TTL expires idle fingerprints, bounding state") {
    import spark.implicits._
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val sink = new CopyOnWriteArrayList[(Long, Boolean)]()
    val stream = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, String, Long)]
    val df = stream.toDF().toDF("id", "text", "ts")

    val q = dedup().setStateTtlMs(5000L).transform(df).head
      .writeStream.outputMode("append")
      .foreachBatch { (b: org.apache.spark.sql.Dataset[Row], _: Long) =>
        b.select("id", "is_duplicate").collect().foreach(r =>
          sink.add((r.getLong(0), r.getBoolean(1))))
      }.start()

    stream.addData((1L, "expiring doc", 1000L))
    q.processAllAvailable() // watermark → 1000; timeout at 6000
    stream.addData((2L, "other doc", 100000L))
    q.processAllAvailable() // watermark → 100000 (past the timeout)
    stream.addData((3L, "third doc", 101000L))
    q.processAllAvailable() // this batch fires the timeout for "expiring doc"
    stream.addData((4L, "EXPIRING DOC", 102000L)) // copy of id 1, after expiry
    q.processAllAvailable()
    q.stop()

    import scala.jdk.CollectionConverters._
    val byId = sink.asScala.toMap
    // the TTL contract: id 4 is a fresh first occurrence, not a duplicate
    assert(byId == Map(1L -> false, 2L -> false, 3L -> false, 4L -> false), byId)
  }

  test("TTL path: rows later than the watermark are DROPPED by the engine, not crashed on") {
    import spark.implicits._
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val sink = new CopyOnWriteArrayList[(Long, Boolean)]()
    val stream = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, String, Long)]
    val df = stream.toDF().toDF("id", "text", "ts")
    val q = dedup().setStateTtlMs(5000L).transform(df).head
      .writeStream.outputMode("append")
      .foreachBatch { (b: org.apache.spark.sql.Dataset[Row], _: Long) =>
        b.select("id", "is_duplicate").collect().foreach(r =>
          sink.add((r.getLong(0), r.getBoolean(1))))
      }.start()
    stream.addData((1L, "on-time doc", 1000000L))
    q.processAllAvailable() // watermark -> 1000000
    // under EventTimeTimeout Spark filters input rows older than the
    // watermark BEFORE the state function: the very-late row must be
    // dropped silently (watermarkDelay is the lateness-tolerance dial),
    // and the query must keep running
    stream.addData((2L, "very late doc", 10L))
    q.processAllAvailable()
    stream.addData((3L, "closer doc", 1001000L))
    q.processAllAvailable()
    q.stop()
    import scala.jdk.CollectionConverters._
    assert(sink.asScala.toMap == Map(1L -> false, 3L -> false))
  }

  test("stream without TTL keeps state forever: a very late copy is still flagged") {
    import spark.implicits._
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val sink = new CopyOnWriteArrayList[(Long, Boolean)]()
    val stream = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, String, Long)]
    val df = stream.toDF().toDF("id", "text", "ts")
    val q = dedup().transform(df).head
      .writeStream.outputMode("append")
      .foreachBatch { (b: org.apache.spark.sql.Dataset[Row], _: Long) =>
        b.select("id", "is_duplicate").collect().foreach(r =>
          sink.add((r.getLong(0), r.getBoolean(1))))
      }.start()
    stream.addData((1L, "keeper", 1000L))
    q.processAllAvailable()
    stream.addData((2L, "keeper", 99999999L))
    q.processAllAvailable()
    q.stop()
    import scala.jdk.CollectionConverters._
    assert(sink.asScala.toMap == Map(1L -> false, 2L -> true))
  }

  test("distinctStream emits each fingerprint once (native dropDuplicatesWithinWatermark)") {
    import spark.implicits._
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val stream = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, String, Long)]
    val df = stream.toDF().toDF("id", "text", "ts")
    val q = dedup().setWatermarkDelay("10 seconds").distinctStream(df)
      .writeStream.format("memory").queryName("sdd_distinct").outputMode("append").start()
    stream.addData((1L, "one doc", 1000L), (2L, "one  doc", 1100L), (3L, "two doc", 1200L))
    q.processAllAvailable()
    q.stop()
    val ids = spark.table("sdd_distinct").select("id").as[Long].collect().toSet
    assert(ids.size == 2 && ids.contains(3L) && (ids.contains(1L) || ids.contains(2L)), ids)

    // batch fallback: plain dropDuplicates on the fingerprint
    val batch = Seq((1L, "x y", 0L), (2L, "x  y", 0L)).toDF("id", "text", "ts")
    assert(dedup().distinctStream(batch).count() == 1)
  }

  test("guards: TTL without timeCol and unsupported id types are rejected") {
    import spark.implicits._
    val docs = Seq((1.5, "a", 0L)).toDF("id", "text", "ts")
    val e1 = intercept[IllegalArgumentException] {
      new StreamingDeduplicator().setInputCol("text").setIdCol("id")
        .setStateTtlMs(100L).transform(docs)
    }
    assert(e1.getMessage.contains("timeCol"))
    val e2 = intercept[IllegalArgumentException] {
      dedup().transform(docs)
    }
    assert(e2.getMessage.contains("long/int/string"))
  }

  test("reserved-name collisions are rejected instead of silently clobbered (r8 ADVICE)") {
    import spark.implicits._
    // e.g. ExactDeduplicator chained upstream already emitted the column
    val withFp = Seq((1L, "a", 0L, "deadbeef")).toDF("id", "text", "ts", "content_fingerprint")
    val e1 = intercept[IllegalArgumentException] { dedup().transform(withFp) }
    assert(e1.getMessage.contains("content_fingerprint"), e1.getMessage)
    val e2 = intercept[IllegalArgumentException] { dedup().distinctStream(withFp) }
    assert(e2.getMessage.contains("content_fingerprint"), e2.getMessage)
    val withTs = Seq((1L, "a", 0L, 1L)).toDF("id", "text", "ts", "__sdd_ts")
    val e3 = intercept[IllegalArgumentException] { dedup().transform(withTs) }
    assert(e3.getMessage.contains("__sdd_ts"), e3.getMessage)
  }
}
