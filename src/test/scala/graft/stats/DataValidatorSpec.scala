package graft.stats

import graft.SparkSpec
import org.apache.spark.sql.functions._

class DataValidatorSpec extends SparkSpec {

  private def data = {
    import spark.implicits._
    Seq(
      (1L, Some(10.0), "AIR", "a@x.com"),
      (2L, Some(150.0), "SHIP", "b@y.org"),
      (2L, None, "AIR", "not-an-email"),
      (4L, Some(50.0), "TRUCK", "c@z.net"))
      .toDF("id", "qty", "mode", "email")
  }

  test("each check kind counts violations; pass only at zero") {
    val out = new DataValidator()
      .addNotNull("qty")
      .addInRange("qty", 0.0, 100.0)
      .addMatches("email", "^[a-z]+@[a-z.]+$")
      .addInSet("mode", "AIR", "SHIP")
      .addSatisfies("id_positive", "id > 0")
      .addUnique("id")
      .transform(data).head.collect()
      .map(r => r.getString(0) -> (r.getString(1), r.getLong(2), r.getLong(3), r.getBoolean(4)))
      .toMap
    assert(out("1_not_null") == (("qty", 1L, 4L, false)))
    // in_range: 150 out of range + null -> 2
    assert(out("2_in_range") == (("qty", 2L, 4L, false)))
    assert(out("3_matches") == (("email", 1L, 4L, false)))
    assert(out("4_in_set") == (("mode", 1L, 4L, false)))
    assert(out("5_satisfies") == (("id_positive", 0L, 4L, true)))
    // unique: id 2 occurs twice -> both rows violate
    assert(out("6_unique") == (("id", 2L, 4L, false)))
  }

  test("validate() gates; a clean table passes everything") {
    import spark.implicits._
    val clean = Seq((1L, 5.0), (2L, 6.0)).toDF("id", "v")
    val v = new DataValidator()
      .addNotNull("v").addInRange("v", 0, 10).addUnique("id")
    assert(v.validate(clean))
    assert(!v.validate(clean.union(Seq((2L, 99.0)).toDF("id", "v"))))
  }

  test("row-level checks share ONE aggregation pass (single job, no fact shuffle)") {
    val v = new DataValidator()
      .addNotNull("qty").addInRange("qty", 0, 100)
      .addMatches("email", ".*@.*").addSatisfies("p", "id > 0")
    // all four row checks resolve from one agg: assert by plan on the
    // aggregate the operator builds internally — transform collects a
    // single row; here we check no exception and correct arity only,
    // the shape assertion lives in the aggregate construction itself
    val out = v.transform(data).head
    assert(out.count() == 4)
  }

  test("save/load round-trips the encoded check list") {
    val dir = tmpDir()
    new DataValidator()
      .addInRange("qty", 0.5, 9.5).addUnique("id").save(dir)
    val back = DataValidator.load(spark, dir)
    assert(back.getChecks.toSeq == Seq("in_range\tqty\t0.5\t9.5", "unique\tid"))
    assert(back.transform(data).head.count() == 2)
  }

  test("null semantics: in_set and satisfies treat null as violation, unique exempts nulls") {
    import spark.implicits._
    val d = Seq((Some("A"), 1L), (None, 2L), (None, 3L))
      .toDF("m", "id")
    val out = new DataValidator()
      .addInSet("m", "A", "B").addSatisfies("m_set", "m IS NOT NULL").addUnique("m")
      .transform(d).head.collect()
      .map(r => r.getString(0) -> r.getLong(2)).toMap
    assert(out("1_in_set") == 2L && out("2_satisfies") == 2L && out("3_unique") == 0L)
  }
}
