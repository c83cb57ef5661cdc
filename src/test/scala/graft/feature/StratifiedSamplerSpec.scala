package graft.feature

import org.apache.spark.sql.functions._
import graft.SparkSpec

class StratifiedSamplerSpec extends SparkSpec {

  private def docs = {
    import spark.implicits._
    // 3 strata with sizes 40 / 25 / 5
    (0L until 70L).map { i =>
      val lang = if (i < 40) "en" else if (i < 65) "de" else "fr"
      (i, lang)
    }.toDF("id", "lang")
  }

  test("fraction keeps exactly the rows below the md5 threshold") {
    val seed = 7L
    val out = new StratifiedSampler().setIdCol("id").setSeed(seed).setFraction(0.4)
      .transform(docs).head
    val expected = docs
      .where(StratifiedSampler.hashKey(col("id"), seed) <
        lit(StratifiedSampler.fractionThreshold(0.4)))
      .select("id").collect().map(_.getLong(0)).toSet
    assert(expected.nonEmpty && expected.size < 70)
    assert(out.select("id").collect().map(_.getLong(0)).toSet === expected)
  }

  test("fraction 1.0 keeps everything") {
    val out = new StratifiedSampler().setIdCol("id").setFraction(1.0)
      .transform(docs).head
    assert(out.count() === 70)
  }

  test("two-phase per-stratum cap equals a single-phase global rank") {
    val seed = 7L
    val out = new StratifiedSampler().setIdCol("id").setSeed(seed)
      .setStrataCols("lang").setMaxPerStratum(10)
      .transform(docs).head
    // expected: unsalted window rank per stratum under the same order
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("lang").orderBy(StratifiedSampler.hashKey(col("id"), seed), col("id"))
    val expected = docs.withColumn("rn", row_number().over(w)).where(col("rn") <= 10)
      .select("id").collect().map(_.getLong(0)).toSet
    assert(out.select("id").collect().map(_.getLong(0)).toSet === expected)
    // under-cap stratum fr (5 rows) survives whole; capped strata hit 10
    val byLang = out.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byLang === Map("en" -> 10L, "de" -> 10L, "fr" -> 5L))
  }

  test("selection is invariant to input partitioning") {
    val s = new StratifiedSampler().setIdCol("id").setSeed(3L)
      .setStrataCols("lang").setFraction(0.7).setMaxPerStratum(8)
    val a = s.transform(docs).head.select("id").collect().map(_.getLong(0)).toSet
    val b = s.transform(docs.repartition(13, col("id"))).head
      .select("id").collect().map(_.getLong(0)).toSet
    assert(a === b && a.nonEmpty)
  }

  test("empty strataCols caps the whole table as one stratum") {
    val out = new StratifiedSampler().setIdCol("id").setSeed(3L).setMaxPerStratum(12)
      .transform(docs).head
    assert(out.count() === 12)
    assert(out.columns.toSeq === Seq("id", "lang"))
  }

  test("fraction composes with the cap (filter first)") {
    val seed = 11L
    val s = new StratifiedSampler().setIdCol("id").setSeed(seed)
      .setStrataCols("lang").setFraction(0.5).setMaxPerStratum(3)
    val out = s.transform(docs).head.select("id").collect().map(_.getLong(0)).toSet
    val surviving = docs.where(StratifiedSampler.hashKey(col("id"), seed) <
      lit(StratifiedSampler.fractionThreshold(0.5)))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("lang").orderBy(StratifiedSampler.hashKey(col("id"), seed), col("id"))
    val expected = surviving.withColumn("rn", row_number().over(w)).where(col("rn") <= 3)
      .select("id").collect().map(_.getLong(0)).toSet
    assert(out === expected)
  }

  test("threshold literals are exact 32-digit hex") {
    assert(StratifiedSampler.fractionThreshold(1.0) === "g")
    assert(StratifiedSampler.fractionThreshold(0.5) === "8" + "0" * 31)
    assert(StratifiedSampler.fractionThreshold(0.0625) === "1" + "0" * 31)
    val t = StratifiedSampler.fractionThreshold(0.3)
    assert(t.length === 32 && t.matches("[0-9a-f]{32}"))
  }

  test("neither mode set is rejected") {
    intercept[IllegalArgumentException] {
      new StratifiedSampler().setIdCol("id").transform(docs)
    }
  }

  test("out-of-range fraction is rejected") {
    intercept[IllegalArgumentException] {
      new StratifiedSampler().setIdCol("id").setFraction(1.5).transform(docs)
    }
  }

  test("param save/load round-trip") {
    val tmp = java.nio.file.Files.createTempDirectory("ss").toString
    val s = new StratifiedSampler().setIdCol("doc_id").setSeed(42L)
      .setStrataCols("lang", "source").setFraction(0.25).setMaxPerStratum(100)
    s.save(tmp)
    val loaded = StratifiedSampler.load(spark, tmp)
    assert(loaded.getIdCol === "doc_id" && loaded.getSeed === 42L)
    assert(loaded.getStrataCols.toSeq === Seq("lang", "source"))
    assert(loaded.getFraction === 0.25 && loaded.getMaxPerStratum === 100)
  }
}
