package graft.dedup

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SpanDeduplicatorSpec extends SparkSpec {
  import spark.implicits._

  private def words(prefix: String, n: Int): String =
    (0 until n).map(i => s"$prefix$i").mkString(" ")

  test("param defaults and round-trip") {
    val d = new SpanDeduplicator()
    assert(d.getN == 20 && d.getMinOccurrences == 2 && d.getScope == "cross_doc")
    val dir = tmpDir()
    d.setN(8).setScope("any").setIdCol("doc_id").setInputCol("text").setOutputCol("clean")
    d.save(dir)
    val back = SpanDeduplicator.load(spark, dir)
    assert(back.getN == 8 && back.getScope == "any" && back.getIdCol == "doc_id")
  }

  test("a passage shared by two docs is flagged in both and removed") {
    val passage = words("p", 8)
    val df = Seq(
      (1L, s"${words("a", 5)} $passage ${words("b", 5)}"),
      (2L, s"${words("c", 3)} $passage ${words("d", 4)}"),
      (3L, words("e", 20))).toDF("doc_id", "text")
    val out = new SpanDeduplicator().setN(8)
      .setIdCol("doc_id").setInputCol("text").setOutputCol("clean")
      .transform(df).head
      .select("doc_id", "clean", "dup_windows", "dup_spans", "dup_tokens")
      .collect().map(r => r.getLong(0) -> r).toMap

    assert(out(1L).getLong(2) == 1L && out(1L).getLong(3) == 1L && out(1L).getLong(4) == 8L)
    assert(out(2L).getLong(2) == 1L && out(2L).getLong(3) == 1L && out(2L).getLong(4) == 8L)
    assert(out(1L).getString(1) == s"${words("a", 5)} ${words("b", 5)}")
    assert(out(2L).getString(1) == s"${words("c", 3)} ${words("d", 4)}")
    assert(out(3L).getLong(2) == 0L && out(3L).getString(1) == words("e", 20))
  }

  test("overlapping duplicated windows merge into one span with exact coverage") {
    // 10-token shared passage, n=8 → 3 overlapping windows per doc, one
    // merged span covering all 10 tokens.
    val passage = words("q", 10)
    val df = Seq(
      (1L, s"${words("a", 4)} $passage"),
      (2L, s"$passage ${words("b", 4)}")).toDF("doc_id", "text")
    val out = new SpanDeduplicator().setN(8)
      .setIdCol("doc_id").setInputCol("text").setOutputCol("clean")
      .transform(df).head.collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("dup_windows"), r.getAs[Long]("dup_spans"),
          r.getAs[Long]("dup_tokens"), r.getAs[String]("clean")))).toMap
    assert(out(1L) == ((3L, 1L, 10L, words("a", 4))))
    assert(out(2L) == ((3L, 1L, 10L, words("b", 4))))
  }

  test("cross_doc ignores in-document repetition; any catches it") {
    val run = words("r", 8)
    val df = Seq((1L, s"$run ${words("m", 3)} $run")).toDF("doc_id", "text")
    val base = new SpanDeduplicator().setN(8)
      .setIdCol("doc_id").setInputCol("text").setOutputCol("clean")

    val cross = base.transform(df).head.select("dup_windows").as[Long].head()
    assert(cross == 0L)

    val any = base.setScope("any").transform(df).head
      .select("dup_windows", "dup_spans", "dup_tokens").as[(Long, Long, Long)].head()
    // both copies' windows marked, two disjoint spans of 8 tokens each
    assert(any == ((2L, 2L, 16L)))
  }

  test("docs shorter than n pass through untouched") {
    val df = Seq((1L, words("s", 5)), (2L, words("s", 5))).toDF("doc_id", "text")
    val out = new SpanDeduplicator().setN(8)
      .setIdCol("doc_id").setInputCol("text").setOutputCol("clean")
      .transform(df).head.select("clean", "dup_windows").collect()
    // even identical docs: no window of length 8 exists
    assert(out.forall(r => r.getString(0) == words("s", 5) && r.getLong(1) == 0L))
  }

  test("adjacent spans merge; disjoint spans stay separate") {
    // Doc 1 carries two shared passages: P (8 tokens) then immediately Q
    // (8 tokens) → adjacent [0,8) and [8,16)... but P and Q adjacency also
    // creates bridging windows only if the P+Q concatenation is itself
    // shared. Here doc 2 has P and doc 3 has Q separated, so in doc 1 the
    // marked windows are exactly the P window (pos 0) and Q window (pos 8):
    // adjacent → ONE merged span of 16.
    val p = words("p", 8); val q = words("q", 8)
    val df = Seq(
      (1L, s"$p $q ${words("t", 4)}"),
      (2L, s"${words("u", 4)} $p ${words("v", 4)}"),
      (3L, s"${words("w", 4)} $q ${words("x", 4)}")).toDF("doc_id", "text")
    val out = new SpanDeduplicator().setN(8)
      .setIdCol("doc_id").setInputCol("text").setOutputCol("clean")
      .transform(df).head.collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("dup_spans"), r.getAs[Long]("dup_tokens")))).toMap
    assert(out(1L) == ((1L, 16L)))
    assert(out(2L) == ((1L, 8L)) && out(3L) == ((1L, 8L)))

    // Disjoint: doc 4/5 share two passages separated by unique filler in
    // both → two spans.
    val df2 = Seq(
      (4L, s"$p ${words("y", 5)} $q"),
      (5L, s"$p ${words("z", 5)} $q")).toDF("doc_id", "text")
    val out2 = new SpanDeduplicator().setN(8)
      .setIdCol("doc_id").setInputCol("text").setOutputCol("clean")
      .transform(df2).head.collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("dup_spans"), r.getAs[Long]("dup_tokens")))).toMap
    assert(out2(4L) == ((2L, 16L)) && out2(5L) == ((2L, 16L)))
  }

  test("whitespace-robust tokenization (tabs, runs of spaces)") {
    val passage = words("p", 8)
    val df = Seq(
      (1L, s"a0  a1\t$passage"),
      (2L, s"${passage.replace(" ", "\t")}  b0")).toDF("doc_id", "text")
    val out = new SpanDeduplicator().setN(8)
      .setIdCol("doc_id").setInputCol("text").setOutputCol("clean")
      .transform(df).head.select("doc_id", "dup_windows", "clean").collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getString(2)))).toMap
    assert(out(1L) == ((1L, "a0 a1")))
    assert(out(2L) == ((1L, "b0")))
  }
}
