package graft.join

import org.apache.spark.sql.functions._
import graft.SparkSpec

class RangeJoinerSpec extends SparkSpec {

  // left sessions and right campaign windows for two users
  private def sessions = {
    import spark.implicits._
    Seq(
      (1L, 100L, 200L, 5L),    // overlaps c1 (edge-touch at 200)
      (2L, 300L, 400L, 5L),    // inside c2
      (3L, 950L, 1100L, 5L),   // spans c3's start
      (4L, 5000L, 6000L, 5L),  // no overlap
      (5L, 100L, 200L, 6L)     // other user: no windows
    ).toDF("session_id", "start", "end", "user_id")
  }
  private def campaigns = {
    import spark.implicits._
    Seq(
      ("c1", 200L, 250L, 5L),
      ("c2", 250L, 450L, 5L),
      ("c3", 1000L, 2000L, 5L),
      ("c4", 0L, 50L, 5L)
    ).toDF("campaign", "r_start", "r_end", "user_id")
  }

  private def joiner = new RangeJoiner()
    .setOnCols("user_id")
    .setLeftStartCol("start").setLeftEndCol("end")
    .setRightStartCol("r_start").setRightEndCol("r_end")
    .setValueCols("campaign")

  private def pairs(binWidth: Long): Set[(Long, String)] =
    joiner.setBinWidthMs(binWidth)
      .transform(sessions, campaigns).head
      .select("session_id", "campaign")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet

  test("overlapping pairs, inclusive bounds, keyed by user") {
    assert(pairs(100L) === Set((1L, "c1"), (2L, "c2"), (3L, "c3")))
  }

  test("every pair emitted exactly once regardless of bin width") {
    // width 10: session 3 x c3 share many bins; the first-common-bin
    // rule must emit one row, not one per shared bin
    val out = joiner.setBinWidthMs(10L)
      .transform(sessions, campaigns).head
      .select("session_id", "campaign").collect()
    assert(out.length == 3, out.mkString(", "))
    assert(pairs(10L) === pairs(1000L) && pairs(10L) === pairs(100000L))
  }

  test("matches a plain overlap cross-filter (exactness oracle)") {
    val want = sessions.as("l")
      .join(campaigns.as("r"), col("l.user_id") === col("r.user_id")
        && col("l.start") <= col("r.r_end") && col("r.r_start") <= col("l.end"))
      .select("session_id", "campaign")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(pairs(70L) === want)
  }

  test("guards: degenerate interval and replication bound fail fast") {
    import spark.implicits._
    val bad = Seq((9L, 500L, 100L, 5L)).toDF("session_id", "start", "end", "user_id")
    val e1 = intercept[Exception] {
      joiner.setBinWidthMs(100L).transform(bad, campaigns).head.count()
    }
    assert(e1.getMessage != null)
    val wide = Seq(("cw", 0L, 10000000L, 5L)).toDF("campaign", "r_start", "r_end", "user_id")
    val e2 = intercept[Exception] {
      joiner.setBinWidthMs(10L).setMaxBinsPerInterval(100)
        .transform(sessions, wide).head.count()
    }
    assert(e2.getMessage != null)
  }

  test("exactly-once dedup survives |start| beyond 2^52 (integer bin math)") {
    import spark.implicits._
    // floor(x / w) via double division rounds at 2^52-scale longs; the
    // dedup filter must use the same integer floorDiv as the explode
    // side or a pair is silently dropped / doubled
    val big = (1L << 53) + 7919L
    val l = Seq((1L, big, big + 250L, 5L), (2L, -big, -big + 250L, 5L))
      .toDF("session_id", "start", "end", "user_id")
    val r = Seq(("cb", big + 100L, big + 400L, 5L), ("cn", -big + 100L, -big + 400L, 5L))
      .toDF("campaign", "r_start", "r_end", "user_id")
    val out = joiner.setBinWidthMs(100L).transform(l, r).head
      .select("session_id", "campaign").collect()
      .map(x => (x.getLong(0), x.getString(1)))
    assert(out.sorted.toSeq == Seq((1L, "cb"), (2L, "cn")), out.mkString(", "))
  }

  test("null interval bounds drop the row (SQL overlap semantics), others still join") {
    import spark.implicits._
    // a null bound can't satisfy the plain overlap predicate under
    // three-valued logic; the binned plan must agree with that oracle,
    // not throw from the explode UDF or emit phantom matches
    val withNull = Seq(
      (9L, Some(100L), None: Option[Long], 5L),
      (10L, None: Option[Long], Some(200L), 5L),
      (1L, Some(100L), Some(200L), 5L))
      .toDF("session_id", "start", "end", "user_id")
    val got = joiner.setBinWidthMs(100L).transform(withNull, campaigns).head
      .select("session_id", "campaign").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet
    val want = withNull.as("l")
      .join(campaigns.as("r"), col("l.user_id") === col("r.user_id")
        && col("l.start") <= col("r.r_end") && col("r.r_start") <= col("l.end"))
      .select("session_id", "campaign")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(got === want && got === Set((1L, "c1")), got)
  }

  test("column-collision guards") {
    import spark.implicits._
    val clash = sessions.withColumn("campaign", lit("x"))
    val ex = intercept[IllegalArgumentException] {
      joiner.transform(clash, campaigns)
    }
    assert(ex.getMessage.contains("collide"))
  }

  test("param save/load round-trip") {
    val dir = tmpDir()
    joiner.setBinWidthMs(1234L).save(dir)
    val back = RangeJoiner.load(spark, dir)
    assert(back.getBinWidthMs == 1234L && back.getOnCols.toSeq == Seq("user_id"))
  }
}
