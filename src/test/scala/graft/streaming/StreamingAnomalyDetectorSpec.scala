package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.Row

class StreamingAnomalyDetectorSpec extends SparkSpec {

  private def det = new StreamingAnomalyDetector()
    .setKeyCol("k").setOrderCol("t").setInputCol("v")

  test("batch: prequential z — event scored against history strictly before it") {
    import spark.implicits._
    // key a: 1,2,3 then an outlier 100 at t=4
    val df = (Seq((1L, 1.0), (2L, 2.0), (3L, 3.0), (4L, 100.0)).map { case (t, v) => ("a", t, v) })
      .toDF("k", "t", "v")
    val out = det.setMinCount(3).setThreshold(3.0).transform(df).head
      .orderBy("order").collect()
    assert(out(0).isNullAt(out(0).fieldIndex("z")) && !out(0).getBoolean(out(0).fieldIndex("anomaly")))
    assert(out(2).isNullAt(out(2).fieldIndex("z"))) // only 2 prior events
    val last = out(3)
    // history {1,2,3}: mean 2, sd 1 -> z = 98
    assert(math.abs(last.getDouble(last.fieldIndex("z")) - 98.0) < 1e-9)
    assert(last.getBoolean(last.fieldIndex("anomaly")))
    assert(last.getLong(last.fieldIndex("n_before")) == 3L)
  }

  test("streaming path equals batch path across micro-batches (Welford parity)") {
    import spark.implicits._
    val rnd = new scala.util.Random(3)
    val events = (0 until 120).map { i =>
      val k = s"k${i % 3}"
      val v = if (i == 100) 500.0 else rnd.nextGaussian() * 5 + 10
      (k, i.toLong, v)
    }
    val batch = det.setMinCount(5).transform(events.toDF("k", "t", "v")).head
      .collect().map(r => (r.getString(0), r.getLong(1)) ->
        (r.getLong(3), Option(r.get(4)).map(_.asInstanceOf[Double]), r.getBoolean(5))).toMap

    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val stream = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(String, Long, Double)]
    val df = stream.toDF().toDF("k", "t", "v")
    val sink = scala.collection.mutable.ArrayBuffer
      .empty[((String, Long), (Long, Option[Double], Boolean))]
    val q = det.setMinCount(5).transform(df).head
      .writeStream.outputMode("update")
      .foreachBatch { (b: org.apache.spark.sql.Dataset[Row], _: Long) =>
        b.collect().foreach(r => sink.synchronized {
          sink += ((r.getString(0), r.getLong(1)) ->
            (r.getLong(3), Option(r.get(4)).map(_.asInstanceOf[Double]), r.getBoolean(5)))
        })
      }.start()
    // replay in 4 ordered micro-batches of 30
    events.grouped(30).foreach { g => stream.addData(g); q.processAllAvailable() }
    q.stop()

    assert(sink.size == events.size)
    sink.foreach { case (key, (nb, z, an)) =>
      val (bnb, bz, ban) = batch(key)
      assert(nb == bnb, s"$key n_before: stream $nb batch $bnb")
      assert(an == ban, s"$key anomaly: stream $an batch $ban")
      (z, bz) match {
        case (Some(a), Some(b)) => assert(math.abs(a - b) < 1e-9, s"$key z: $a vs $b")
        case (a, b) => assert(a == b, s"$key z: $a vs $b")
      }
    }
  }

  test("independent keys; cold key stays null past minCount of OTHER keys") {
    import spark.implicits._
    val df = ((1 to 20).map(i => ("hot", i.toLong, i.toDouble)) :+ (("cold", 21L, 5.0)))
      .toDF("k", "t", "v")
    val out = det.setMinCount(5).transform(df).head
      .where("key = 'cold'").collect()
    assert(out.length == 1 && out(0).isNullAt(out(0).fieldIndex("z")))
  }

  test("stream: event-time TTL evicts idle per-key state; reappearing key starts cold") {
    import spark.implicits._
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val stream = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(String, Long, Double)]
    val df = stream.toDF().toDF("k", "t", "v") // t doubles as epoch-ms event time
    val sink = scala.collection.mutable.ArrayBuffer.empty[(String, Long, Long)]
    val q = det.setMinCount(2).setStateTtlMs(5000L).transform(df).head
      .writeStream.outputMode("update")
      .foreachBatch { (b: org.apache.spark.sql.Dataset[Row], _: Long) =>
        b.collect().foreach(r => sink.synchronized {
          sink += ((r.getString(0), r.getLong(1), r.getLong(3))) // key, order, n_before
        })
      }.start()
    stream.addData(Seq(("a", 1000L, 1.0), ("a", 1100L, 2.0), ("a", 1200L, 3.0)))
    q.processAllAvailable() // a: n=3; watermark -> 1200; a expires at 6200
    stream.addData(Seq(("b", 100000L, 1.0)))
    q.processAllAvailable() // watermark -> 100000, past a's timeout
    stream.addData(Seq(("b", 101000L, 2.0)))
    q.processAllAvailable() // this batch fires a's timeout (state removed)
    stream.addData(Seq(("a", 102000L, 4.0)))
    q.processAllAvailable() // a reappears AFTER eviction
    q.stop()
    val byEvent = sink.synchronized(sink.toVector).map(e => (e._1, e._2) -> e._3).toMap
    // the TTL contract: a's history was forgotten — the reappearance has
    // n_before 0, not 3
    assert(byEvent(("a", 102000L)) == 0L, byEvent)
    assert(byEvent(("a", 1200L)) == 2L && byEvent(("b", 101000L)) == 1L, byEvent)
  }

  test("stream without TTL keeps state forever: a very late event still sees its history") {
    import spark.implicits._
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val stream = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(String, Long, Double)]
    val df = stream.toDF().toDF("k", "t", "v")
    val sink = scala.collection.mutable.ArrayBuffer.empty[(String, Long, Long)]
    val q = det.setMinCount(2).transform(df).head
      .writeStream.outputMode("update")
      .foreachBatch { (b: org.apache.spark.sql.Dataset[Row], _: Long) =>
        b.collect().foreach(r => sink.synchronized {
          sink += ((r.getString(0), r.getLong(1), r.getLong(3)))
        })
      }.start()
    stream.addData(Seq(("a", 1000L, 1.0), ("a", 1100L, 2.0), ("a", 1200L, 3.0)))
    q.processAllAvailable()
    stream.addData(Seq(("a", 99999000L, 4.0))) // ages later
    q.processAllAvailable()
    q.stop()
    val byEvent = sink.synchronized(sink.toVector).map(e => (e._1, e._2) -> e._3).toMap
    assert(byEvent(("a", 99999000L)) == 3L, byEvent)
  }

  test("param save/load round-trip") {
    val dir = tmpDir()
    det.setThreshold(4.5).setMinCount(20).setStateTtlMs(7000L)
      .setWatermarkDelay("10 seconds").save(dir)
    val back = StreamingAnomalyDetector.load(spark, dir)
    assert(back.getThreshold == 4.5 && back.getMinCount == 20 &&
      back.getKeyCol == "k" && back.getOrderCol == "t" && back.getInputCol == "v")
    assert(back.getStateTtlMs == 7000L && back.getWatermarkDelay == "10 seconds")
  }
}
