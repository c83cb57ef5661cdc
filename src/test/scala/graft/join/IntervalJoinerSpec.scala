package graft.join

import graft.SparkSpec

class IntervalJoinerSpec extends SparkSpec {

  private def joiner = new IntervalJoiner()
    .setOnCols("k").setLeftTimeCol("t")
    .setRightStartCol("s").setRightEndCol("e").setValueCols("tag")

  private def left = {
    import spark.implicits._
    Seq(("a", 1L, 100L), ("a", 2L, 150L), ("a", 3L, 250L),
      ("b", 4L, 100L), ("a", 5L, 400L)).toDF("k", "id", "t")
  }

  private def right = {
    import spark.implicits._
    Seq(("a", 100L, 200L, "w1"), ("a", 140L, 260L, "w2"),
      ("b", 90L, 100L, "w3"), ("a", 300L, 350L, "w4")).toDF("k", "s", "e", "tag")
  }

  test("points match containing intervals: inclusive ends, overlaps, key isolation") {
    val got = joiner.transform(left, right).head
      .select("id", "tag").collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(got == Set(
      (1L, "w1"),              // t = s boundary
      (2L, "w1"), (2L, "w2"),  // overlapping windows -> both rows
      (3L, "w2"),
      (4L, "w3")))             // t = e boundary, different key
    // id 5 (t=400) matches nothing; key isolation: b's window never sees a's points
  }

  test("results are invariant to the bin width") {
    val base = joiner.setBinWidthMs(1000L).transform(left, right).head
      .select("id", "tag").collect().map(r => (r.getLong(0), r.getString(1))).toSet
    Seq(1L, 7L, 50L, 1000000L).foreach { w =>
      val got = joiner.setBinWidthMs(w).transform(left, right).head
        .select("id", "tag").collect().map(r => (r.getLong(0), r.getString(1))).toSet
      assert(got == base, s"binWidth $w")
    }
  }

  test("the physical plan is an equi-join, never a nested loop") {
    val plan = joiner.setBinWidthMs(50L).transform(left, right).head
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"), plan)
  }

  test("guards: reversed intervals and over-replicated intervals fail the job") {
    import spark.implicits._
    val reversed = Seq(("a", 200L, 100L, "bad")).toDF("k", "s", "e", "tag")
    val e1 = intercept[Exception] {
      joiner.transform(left, reversed).head.collect()
    }
    assert(e1.getMessage.contains("end before start") ||
      Option(e1.getCause).exists(_.getMessage.contains("end before start")))

    val huge = Seq(("a", 0L, Long.MaxValue / 2, "open")).toDF("k", "s", "e", "tag")
    val e2 = intercept[Exception] {
      joiner.setBinWidthMs(1000L).setMaxBinsPerInterval(100).transform(left, huge).head.collect()
    }
    assert(e2.getMessage.contains("bins") ||
      Option(e2.getCause).exists(_.getMessage.contains("bins")))
  }

  test("param save/load round-trip") {
    val dir = tmpDir()
    joiner.setBinWidthMs(123L).setMaxBinsPerInterval(7).save(dir)
    val back = IntervalJoiner.load(spark, dir)
    assert(back.getBinWidthMs == 123L && back.getMaxBinsPerInterval == 7 &&
      back.getOnCols.toSeq == Seq("k"))
  }
}
