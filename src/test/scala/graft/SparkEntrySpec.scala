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
}
