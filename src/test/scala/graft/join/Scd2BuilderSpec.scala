package graft.join

import graft.SparkSpec
import org.apache.spark.sql.functions._

class Scd2BuilderSpec extends SparkSpec {

  private def changes = {
    import spark.implicits._
    Seq(
      ("u1", 10L, "bronze", "US"),
      ("u1", 20L, "silver", "US"),
      ("u1", 30L, "silver", "US"), // no-op update
      ("u1", 40L, "gold", "DE"),
      ("u2", 15L, "bronze", "FR"))
      .toDF("user", "ts", "tier", "country")
  }

  private def builder = new Scd2Builder().setKeyCols("user").setOrderCol("ts")

  test("intervals chain per key; no-op update collapsed into the previous interval") {
    val out = builder.transform(changes).head
      .orderBy("user", "valid_from").collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(3),
        Option(r.get(4)).map(_.asInstanceOf[Long]), r.getBoolean(5)))
    assert(out.toSeq == Seq(
      ("u1", "bronze", 10L, Some(20L), false),
      ("u1", "silver", 20L, Some(40L), false), // extended past the no-op at 30
      ("u1", "gold", 40L, None, true),
      ("u2", "bronze", 15L, None, true)))
  }

  test("collapseUnchanged=false keeps the no-op as its own interval") {
    val out = builder.setCollapseUnchanged(false).transform(changes).head
      .where(col("user") === "u1").orderBy("valid_from").collect()
    assert(out.length == 4)
    assert(out(1).getLong(out(1).fieldIndex("valid_to")) == 30L)
  }

  test("point-in-time correctness: BETWEEN join reconstructs state at any time") {
    import spark.implicits._
    val hist = builder.transform(changes).head
    val asks = Seq(("u1", 25L), ("u1", 35L), ("u1", 99L), ("u2", 14L)).toDF("user", "at")
    val got = asks.join(hist, Seq("user"), "left")
      .where(col("at") >= col("valid_from") &&
        (col("valid_to").isNull || col("at") < col("valid_to")))
      .select("user", "at", "tier").collect()
      .map(r => (r.getString(0), r.getLong(1)) -> r.getString(2)).toMap
    assert(got == Map(("u1", 25L) -> "silver", ("u1", 35L) -> "silver",
      ("u1", 99L) -> "gold"))
  }

  test("duplicate (key, ts) rows are refused") {
    import spark.implicits._
    val dup = Seq(("a", 1L, "x"), ("a", 1L, "y")).toDF("k", "ts", "v")
    val e = intercept[IllegalArgumentException] {
      new Scd2Builder().setKeyCols("k").setOrderCol("ts").transform(dup)
    }
    assert(e.getMessage.contains("ambiguous"))
  }

  test("save/load round-trip") {
    val dir = tmpDir()
    builder.setCollapseUnchanged(false).save(dir)
    val back = Scd2Builder.load(spark, dir)
    assert(back.getKeyCols.toSeq == Seq("user") && back.getOrderCol == "ts"
      && !back.getCollapseUnchanged)
  }
}
