package graft.feature

import org.apache.spark.sql.functions._
import graft.SparkSpec

class GroupedSplitterSpec extends SparkSpec {

  private def events = {
    import spark.implicits._
    // 60 users × 5 rows each
    (0L until 300L).map(i => (i, i % 60L)).toDF("event_id", "user_id")
  }

  test("every row of a group lands in the same split") {
    val splits = new GroupedSplitter().setGroupCols("user_id")
      .setWeights(0.7, 0.2, 0.1).setSeed(5L)
      .transform(events)
    assert(splits.length === 3)
    val userSplits = splits.zipWithIndex.flatMap { case (df, i) =>
      df.select("user_id").distinct().collect().map(_.getLong(0) -> i)
    }
    // a user appears in exactly one split
    assert(userSplits.map(_._1).distinct.length === userSplits.length)
    assert(userSplits.map(_._1).toSet === (0L until 60L).toSet)
    // splits partition the rows
    assert(splits.map(_.count()).sum === 300L)
    // every user contributes all 5 rows to its split
    splits.foreach { df =>
      val counts = df.groupBy("user_id").count().select("count")
        .collect().map(_.getLong(0)).toSet
      assert(counts.isEmpty || counts === Set(5L))
    }
  }

  test("assignment is invariant to input partitioning") {
    val s = new GroupedSplitter().setGroupCols("user_id").setWeights(0.5, 0.5).setSeed(2L)
    val a = s.transform(events).head.select("event_id").collect().map(_.getLong(0)).toSet
    val b = s.transform(events.repartition(17, col("event_id"))).head
      .select("event_id").collect().map(_.getLong(0)).toSet
    assert(a === b && a.nonEmpty)
  }

  test("assign() matches transform()'s partition") {
    val s = new GroupedSplitter().setGroupCols("user_id")
      .setWeights(0.6, 0.3, 0.1).setSeed(9L)
    val assigned = s.assign(events, "split")
    val fromCol = assigned.select("event_id", "split").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    val fromTables = s.transform(events).zipWithIndex.flatMap { case (df, i) =>
      df.select("event_id").collect().map(_.getLong(0) -> i)
    }.toMap
    assert(fromCol === fromTables)
  }

  test("proportions roughly follow the weights") {
    val s = new GroupedSplitter().setGroupCols("user_id").setWeights(3.0, 1.0).setSeed(1L)
    val counts = s.transform(events).map(_.count().toDouble)
    val frac = counts.head / counts.sum
    assert(frac > 0.55 && frac < 0.95, s"train fraction $frac far from 0.75")
  }

  test("multi-column group keys are supported") {
    import spark.implicits._
    val df = Seq((1L, "a", "x"), (2L, "a", "x"), (3L, "a", "y"))
      .toDF("id", "g1", "g2")
    val s = new GroupedSplitter().setGroupCols("g1", "g2").setWeights(0.5, 0.5).setSeed(0L)
    val assigned = s.assign(df)
    val bySplit = assigned.collect().map(r => (r.getString(1), r.getString(2)) -> r.getInt(3))
    // (a,x) rows agree; (a,y) may differ from (a,x)
    assert(bySplit.filter(_._1 == ("a", "x")).map(_._2).distinct.length === 1)
  }

  test("unset groupCols is rejected") {
    intercept[IllegalArgumentException] {
      new GroupedSplitter().setWeights(0.5, 0.5).transform(events)
    }
  }

  test("param save/load round-trip") {
    val tmp = java.nio.file.Files.createTempDirectory("gs").toString
    val s = new GroupedSplitter().setGroupCols("user_id", "day")
      .setWeights(0.8, 0.1, 0.1).setSeed(13L)
    s.save(tmp)
    val loaded = GroupedSplitter.load(spark, tmp)
    assert(loaded.getGroupCols.toSeq === Seq("user_id", "day"))
    assert(loaded.getWeights.toSeq === Seq(0.8, 0.1, 0.1))
    assert(loaded.getSeed === 13L)
  }
}
