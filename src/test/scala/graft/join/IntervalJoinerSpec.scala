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

  test("randomized differential: binned join equals the naive range join on 200 seeds of data") {
    import spark.implicits._
    val rnd = new scala.util.Random(2024)
    val pts = (0 until 200).map(i => ((rnd.nextInt(3) + 'a').toChar.toString, i.toLong,
      rnd.nextInt(1000).toLong)).toDF("k", "id", "t")
    val ivs = (0 until 60).map { i =>
      val s = rnd.nextInt(950).toLong
      ((rnd.nextInt(3) + 'a').toChar.toString, s, s + rnd.nextInt(80).toLong, s"w$i")
    }.toDF("k", "s", "e", "tag")

    val naive = pts.as("l").join(ivs.as("r"),
        $"l.k" === $"r.k" && $"l.t" >= $"r.s" && $"l.t" <= $"r.e")
      .select($"l.id", $"r.tag")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    Seq(13L, 100L, 997L).foreach { w =>
      val binned = joiner.setBinWidthMs(w).transform(pts, ivs).head
        .select("id", "tag").collect().map(r => (r.getLong(0), r.getString(1))).toSet
      assert(binned == naive, s"binWidth $w: ${binned.size} vs ${naive.size}")
    }
  }

  test("right-column collisions with the left input are rejected up front (r8 ADVICE)") {
    import spark.implicits._
    // left already has a `tag` column -> the attached valueCol would duplicate it
    val clashLeft = Seq(("a", 1L, 100L, "boom")).toDF("k", "id", "t", "tag")
    val ex1 = intercept[IllegalArgumentException] { joiner.transform(clashLeft, right) }
    assert(ex1.getMessage.contains("collide"), ex1.getMessage)
    // left already has the interval-bound name `s` that the output restores
    val clashBounds = Seq(("a", 1L, 100L, 9L)).toDF("k", "id", "t", "s")
    val ex2 = intercept[IllegalArgumentException] { joiner.transform(clashBounds, right) }
    assert(ex2.getMessage.contains("collide"), ex2.getMessage)
    // valueCols naming the interval bounds is user error, not a dup column
    val ex3 = intercept[IllegalArgumentException] {
      new IntervalJoiner().setOnCols("k").setLeftTimeCol("t")
        .setRightStartCol("s").setRightEndCol("e").setValueCols("tag", "s")
        .transform(left, right)
    }
    assert(ex3.getMessage.contains("valueCols"), ex3.getMessage)
    // a valueCol that is ALSO a join key would be selected twice on the
    // right -> ambiguous reference downstream; rejected up front
    val ex4 = intercept[IllegalArgumentException] {
      new IntervalJoiner().setOnCols("k").setLeftTimeCol("t")
        .setRightStartCol("s").setRightEndCol("e").setValueCols("k", "tag")
        .transform(left.drop("tag"), right)
    }
    assert(ex4.getMessage.contains("join key"), ex4.getMessage)
  }

  test("param save/load round-trip") {
    val dir = tmpDir()
    joiner.setBinWidthMs(123L).setMaxBinsPerInterval(7).save(dir)
    val back = IntervalJoiner.load(spark, dir)
    assert(back.getBinWidthMs == 123L && back.getMaxBinsPerInterval == 7 &&
      back.getOnCols.toSeq == Seq("k"))
  }
}
