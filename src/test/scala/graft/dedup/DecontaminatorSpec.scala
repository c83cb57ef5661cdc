package graft.dedup

import org.apache.spark.sql.functions._
import graft.SparkSpec

class DecontaminatorSpec extends SparkSpec {

  private def train = {
    import spark.implicits._
    Seq(
      (1L, Seq("a b c", "b c d", "c d e")), // shares 2 grams with eval doc 100
      (2L, Seq("x y z")),                   // clean
      (3L, Seq("a b c")),                   // shares 1 gram
      (4L, Seq("q r s", "r s t"))           // clean
    ).toDF("doc_id", "grams")
  }
  private def evalSet = {
    import spark.implicits._
    Seq(
      (100L, Seq("a b c", "c d e")),
      (101L, Seq("m n o"))
    ).toDF("doc_id", "grams")
  }

  private def run(minMatches: Int) = new Decontaminator()
    .setIdCol("doc_id").setInputCol("grams").setMinMatches(minMatches)
    .transform(train, evalSet).head
    .select("doc_id", "matched_ngrams", "contaminated")
    .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getBoolean(2))).toMap

  test("docs sharing any eval n-gram are flagged; counts are distinct grams") {
    val out = run(1)
    assert(out(1L) === (2L, true))
    assert(out(2L) === (0L, false))
    assert(out(3L) === (1L, true))
    assert(out(4L) === (0L, false))
  }

  test("minMatches raises the contamination bar") {
    val out = run(2)
    assert(out(1L) === (2L, true))
    assert(out(3L) === (1L, false))
  }

  test("duplicate grams inside a doc count once") {
    import spark.implicits._
    val t = Seq((7L, Seq("a b c", "a b c", "a b c"))).toDF("doc_id", "grams")
    val out = new Decontaminator().setIdCol("doc_id").setInputCol("grams")
      .transform(t, evalSet).head
      .select("matched_ngrams").head().getLong(0)
    assert(out === 1L)
  }

  test("all train columns and row count survive") {
    val res = new Decontaminator().setIdCol("doc_id").setInputCol("grams")
      .transform(train, evalSet).head
    assert(res.count() === 4)
    assert(res.columns.toSeq === Seq("doc_id", "grams", "matched_ngrams", "contaminated"))
  }

  test("candidates come from a gram equi-join, never doc-by-doc") {
    val res = new Decontaminator().setIdCol("doc_id").setInputCol("grams")
      .transform(train, evalSet).head
    val plan = res.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), plan)
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
  }

  test("param save/load round-trip") {
    val tmp = java.nio.file.Files.createTempDirectory("dc").toString
    val d = new Decontaminator().setIdCol("x").setInputCol("sh")
      .setMinMatches(3).setOutputCol("dirty").setMatchCountCol("hits")
    d.save(tmp)
    val loaded = Decontaminator.load(spark, tmp)
    assert(loaded.getIdCol === "x" && loaded.getInputCol === "sh")
    assert(loaded.getMinMatches === 3)
    assert(loaded.getOutputCol === "dirty" && loaded.getMatchCountCol === "hits")
  }
}
