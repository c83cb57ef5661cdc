package graft.text

import graft.SparkSpec

class LineDedupSpec extends SparkSpec {

  test("LineDeduplicator removes corpus-repeated lines, keeps order and blanks") {
    import spark.implicits._
    val df = Seq(
      (1L, "unique alpha\nSubscribe Now\n\nbody one"),
      (2L, "body two\nsubscribe now\nunique beta"),
      (3L, "subscribe NOW\nunique gamma")).toDF("id", "text")
    val out = new LineDeduplicator().setIdCol("id")
      .setInputCol("text").setOutputCol("clean")
      .transform(df).head
      .select("id", "clean", "n_lines", "n_removed").collect()
      .map(r => r.getLong(0) -> (r.getString(1), r.getLong(2), r.getLong(3))).toMap
    // "subscribe now" appears 3× (case-insensitive) → removed everywhere;
    // the blank line in doc 1 is kept
    assert(out(1L) == ("unique alpha\n\nbody one", 4L, 1L), out(1L))
    assert(out(2L) == ("body two\nunique beta", 3L, 1L))
    assert(out(3L) == ("unique gamma", 2L, 1L))
  }

  test("LineDeduplicator honors maxOccurrences and empties fully-boilerplate docs") {
    import spark.implicits._
    val df = Seq(
      (1L, "twice\nonce a"),
      (2L, "twice\nonce b"),
      (3L, "thrice\nonce c"),
      (4L, "thrice"),
      (5L, "thrice")).toDF("id", "text")
    val out = new LineDeduplicator().setIdCol("id")
      .setInputCol("text").setOutputCol("clean").setMaxOccurrences(2)
      .transform(df).head
      .select("id", "clean", "n_removed").collect()
      .map(r => r.getLong(0) -> (r.getString(1), r.getLong(2))).toMap
    // "twice" ×2 ≤ 2 → kept; "thrice" ×3 > 2 → removed
    assert(out(1L) == ("twice\nonce a", 0L))
    assert(out(4L) == ("", 1L))
    assert(out(3L) == ("once c", 1L))
  }

  test("LineDeduplicator save/load round-trips") {
    val m = new LineDeduplicator().setIdCol("doc_id").setInputCol("t")
      .setOutputCol("c").setSeparator("|").setMaxOccurrences(3)
    val dir = java.nio.file.Files.createTempDirectory("graft-linededup").toString
    m.save(dir)
    val l = LineDeduplicator.load(spark, dir)
    assert(l.getSeparator == "|" && l.getMaxOccurrences == 3 && l.getIdCol == "doc_id")
  }
}
