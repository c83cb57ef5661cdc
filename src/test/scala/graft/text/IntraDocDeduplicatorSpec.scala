package graft.text

import graft.SparkSpec

class IntraDocDeduplicatorSpec extends SparkSpec {

  private def stage = new IntraDocDeduplicator()
    .setInputCol("text").setOutputCol("d")

  private def run(text: String, gran: String = "line") = {
    import spark.implicits._
    val r = stage.setGranularity(gran)
      .transform(Seq(text).toDF("text")).head
      .select("d_text", "d_kept", "d_removed").head()
    (r.getString(0), r.getInt(1), r.getInt(2))
  }

  test("repeated lines removed, FIRST occurrence kept in order") {
    val (text, kept, removed) = run("alpha\nbeta\nalpha\ngamma\nbeta\nalpha")
    assert(text == "alpha\nbeta\ngamma")
    assert(kept == 3 && removed == 3)
  }

  test("no repeats: document unchanged") {
    val (text, kept, removed) = run("one\ntwo\nthree")
    assert(text == "one\ntwo\nthree" && kept == 3 && removed == 0)
  }

  test("paragraph granularity: blank-line split, double-newline rebuild") {
    val doc = "para one\nstill para one\n\npara two\n\npara one\nstill para one"
    val (text, kept, removed) = run(doc, "paragraph")
    assert(text == "para one\nstill para one\n\npara two")
    assert(kept == 2 && removed == 1)
  }

  test("exact comparison: near-identical lines both survive") {
    val (text, _, removed) = run("Hello\nhello")
    assert(text == "Hello\nhello" && removed == 0)
  }

  test("zero-shuffle plan; save/load round-trip") {
    import spark.implicits._
    val plan = stage.transform(Seq("a\nb").toDF("text")).head
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan)
    val dir = tmpDir()
    stage.setGranularity("paragraph").save(dir)
    assert(IntraDocDeduplicator.load(spark, dir).getGranularity == "paragraph")
  }
}
