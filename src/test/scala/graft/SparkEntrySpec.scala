package graft

/** Guards the driver's smoke contract: entry() must return rows. */
class SparkEntrySpec extends SparkSpec {
  test("entry flagship pipeline returns a non-empty aggregate") {
    val out = SparkEntry.entry(spark)
    val rows = out.collect()
    assert(rows.nonEmpty)
    assert(out.columns.toSeq == Seq("prediction", "n", "avg_qty"))
    assert(rows.map(_.getLong(1)).sum > 0)
  }

  test("every query carries an oracle and every oracle has a query") {
    val q = SparkEntry.queries.keySet
    val o = SparkEntry.oracleSql.keySet
    assert((q diff o).isEmpty, s"queries without oracle: ${(q diff o).toSeq.sorted}")
    assert((o diff q).isEmpty, s"oracles without query: ${(o diff q).toSeq.sorted}")
  }
}
