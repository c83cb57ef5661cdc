package graft.text

import graft.SparkSpec
import org.apache.spark.sql.functions._

class TextNormalizerSpec extends SparkSpec {

  test("control strip, accent fold, lowercase, whitespace collapse") {
    import spark.implicits._
    val df = Seq(
      (1L, "  Héllo\tWörld  "),
      (2L, "CrèmeBrûlée  à la ÑOÑO"),
      (3L, ""),
      (4L, "already clean")
    ).toDF("id", "text")
    val out = new TextNormalizer().setInputCol("text").setOutputCol("norm")
      .transform(df).head
      .collect().map(r => r.getLong(0) -> r.getString(2)).toMap
    assert(out(1L) == "hello world")
    assert(out(2L) == "creme brulee a la nono")
    assert(out(3L) == "")
    assert(out(4L) == "already clean")
  }

  test("flags: keep case, keep accents") {
    import spark.implicits._
    val df = Seq((1L, " Héllo  Wörld ")).toDF("id", "text")
    val keepCase = new TextNormalizer().setInputCol("text").setOutputCol("n")
      .setLowercase(false).transform(df).head.select("n").head().getString(0)
    assert(keepCase == "Hello World")
    val keepAccents = new TextNormalizer().setInputCol("text").setOutputCol("n")
      .setStripAccents(false).transform(df).head.select("n").head().getString(0)
    assert(keepAccents == "héllo wörld")
  }

  test("normalization is the ExactDeduplicator pre-hash convention") {
    // normalize -> md5 equals md5 over the same chain inline: the
    // operator and ad-hoc normalization cannot drift
    import spark.implicits._
    val df = Seq((1L, "  Some   TEXT here ")).toDF("id", "text")
    val viaOp = new TextNormalizer().setInputCol("text").setOutputCol("n")
      .setStripAccents(false).transform(df).head
      .select(md5(to_binary(col("n"), lit("utf-8")))).head().getString(0)
    val inline = df.select(md5(to_binary(
      lower(trim(regexp_replace(col("text"), "\\s+", " "))), lit("utf-8")))).head().getString(0)
    assert(viaOp == inline)
  }

  test("param save/load round-trip") {
    val dir = tmpDir()
    new TextNormalizer().setInputCol("a").setOutputCol("b")
      .setLowercase(false).save(dir)
    val back = TextNormalizer.load(spark, dir)
    assert(back.getInputCol == "a" && !back.getLowercase)
  }
}
