package graft.recommendation

import graft.SparkSpec

/** Fixture and expected packed scores mirror the reference SwingTest. */
class SwingSpec extends SparkSpec {

  private def input = {
    import spark.implicits._
    Seq(
      (0L, 10L), (0L, 11L), (0L, 12L),
      (1L, 13L), (1L, 12L),
      (2L, 10L), (2L, 11L), (2L, 12L),
      (3L, 13L), (3L, 12L),
      (4L, 12L), (4L, 10L), (4L, 11L), (4L, 12L), (4L, 13L)
    ).toDF("user", "item")
  }

  test("packed top-k scores (reference SwingTest, min=2 max=3)") {
    val out = new Swing().setMinUserBehavior(2).setMaxUserBehavior(3)
      .transform(input).head
      .collect().map(r => (r.getLong(0), r.getString(1))).toMap
    assert(out === Map(
      10L -> "11,0.058845768947156235;12,0.058845768947156235",
      11L -> "10,0.058845768947156235;12,0.058845768947156235",
      12L -> "13,0.09134833828228624;10,0.058845768947156235;11,0.058845768947156235",
      13L -> "12,0.09134833828228624"))
  }

  test("k caps the list length") {
    val out = new Swing().setMinUserBehavior(2).setMaxUserBehavior(3).setK(1)
      .transform(input).head
      .collect().map(r => (r.getLong(0), r.getString(1))).toMap
    assert(out(12L) === "13,0.09134833828228624")
    assert(out(10L) === "11,0.058845768947156235")
  }

  test("param defaults match the reference") {
    val s = new Swing()
    assert(s.getUserCol == "user" && s.getItemCol == "item")
    assert(s.getK == 100 && s.getMaxUserNumPerItem == 1000)
    assert(s.getMinUserBehavior == 10 && s.getMaxUserBehavior == 1000)
    assert(s.getAlpha1 == 15 && s.getAlpha2 == 0)
    assert(s.getBeta == 0.3)
  }

  test("non-Long user/item types are rejected") {
    import spark.implicits._
    val bad = Seq((1, 2)).toDF("user", "item")
    intercept[IllegalArgumentException] { new Swing().transform(bad) }
  }

  test("maxUserBehavior < minUserBehavior is rejected") {
    intercept[IllegalArgumentException] {
      new Swing().setMinUserBehavior(5).setMaxUserBehavior(3).transform(input)
    }
  }
}
