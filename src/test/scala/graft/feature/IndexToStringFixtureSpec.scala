package graft.feature

import graft.SparkSpec

/**
 * Reference fixture for IndexToStringModel, ported from
 * feature/stringindexer/IndexToStringModelTest.java:50-109 — two-column
 * inverse mapping over stringArrays {{a,b,c,d},{-1.0,0.0,1.0,2.0}},
 * and the unseen-index error with the reference's message.
 */
class IndexToStringFixtureSpec extends SparkSpec {

  private def modelData = {
    import spark.implicits._
    Seq((0, Seq("a", "b", "c", "d")), (1, Seq("-1.0", "0.0", "1.0", "2.0")))
      .toDF("colIdx", "terms")
  }

  private def model = new IndexToStringModel()
    .setInputCols("inputCol1", "inputCol2")
    .setOutputCols("outputCol1", "outputCol2")
    .setModelData(modelData)

  test("two-column inverse mapping matches the reference expectations") {
    import spark.implicits._
    val out = model.transform(Seq((0, 3), (1, 2)).toDF("inputCol1", "inputCol2")).head
    assert(out.columns.toSeq ==
      Seq("inputCol1", "inputCol2", "outputCol1", "outputCol2"))
    val rows = out.orderBy("inputCol1")
      .select("inputCol1", "inputCol2", "outputCol1", "outputCol2")
      .collect().map(r => (r.getInt(0), r.getInt(1), r.getString(2), r.getString(3))).toSeq
    assert(rows == Seq((0, 3, "a", "2.0"), (1, 2, "b", "1.0")))
  }

  test("unseen index fails with the reference message") {
    import spark.implicits._
    val bad = Seq((0, 3), (1, 2), (4, 1)).toDF("inputCol1", "inputCol2")
    val e = intercept[Exception] { model.transform(bad).head.collect() }
    def messages(t: Throwable): String =
      if (t == null) "" else Option(t.getMessage).getOrElse("") + messages(t.getCause)
    assert(messages(e).contains("The input contains unseen index: 4."))
  }
}
