package graft.text

import graft.SparkSpec

class CorpusOpsSpec extends SparkSpec {

  test("NgramLm: bigram perplexity matches hand computation") {
    import spark.implicits._
    val df = Seq(
      (1L, "a b a b"),
      (2L, "a b c"),
      (3L, "z"),
      (4L, "")).toDF("id", "text")
    val model = new NgramLm().setInputCol("text").setOutputCol("ppl")
      .setSmoothing(0.5).fit(df)
    val out = model.setIdCol("id").transform(df).head
      .select("id", "ppl_bits", "ppl").collect()
      .map(r => r.getLong(0) -> (Option(r.get(1)), Option(r.get(2)))).toMap

    // corpus bigrams: doc1 [ab, ba, ab], doc2 [ab, bc] →
    // c(a,b)=3, c(b,a)=1, c(b,c)=1; ctx(a)=3, ctx(b)=2; V={a,b,c,z} → 4
    val k = 0.5
    val V = 4.0
    def p(c: Double, ctx: Double) = (c + k) / (ctx + k * V)
    def lg(x: Double) = math.log(x) / math.log(2.0)
    val bits1 = -(lg(p(3, 3)) + lg(p(1, 2)) + lg(p(3, 3))) / 3.0
    val bits2 = -(lg(p(3, 3)) + lg(p(1, 2))) / 2.0
    assert(math.abs(out(1L)._1.get.asInstanceOf[Double] - bits1) < 1e-12)
    assert(math.abs(out(2L)._1.get.asInstanceOf[Double] - bits2) < 1e-12)
    assert(math.abs(out(1L)._2.get.asInstanceOf[Double] - math.pow(2, bits1)) < 1e-12)
    // < 2 tokens → null
    assert(out(3L)._1.isEmpty && out(4L)._1.isEmpty)
  }

  test("NgramLm: model data round-trips through save/load") {
    import spark.implicits._
    val df = Seq((1L, "x y x y z")).toDF("id", "text")
    val model = new NgramLm().setInputCol("text").setOutputCol("ppl")
      .setSmoothing(0.25).fit(df)
    val dir = java.nio.file.Files.createTempDirectory("graft-ngramlm").toString
    model.save(dir)
    val loaded = NgramLmModel.load(spark, dir)
    assert(loaded.getSmoothing == 0.25)
    val a = model.setIdCol("id").transform(df).head.select("id", "ppl").collect()
    val b = loaded.setIdCol("id").transform(df).head.select("id", "ppl").collect()
    assert(a.head.getDouble(1) == b.head.getDouble(1))
    assert(loaded.getModelData(0).count() == model.getModelData(0).count())
  }

  test("ChunkSplitter: overlapping windows with short tail") {
    import spark.implicits._
    val df = Seq(
      (1L, "t0 t1 t2 t3 t4 t5 t6"), // 7 tokens
      (2L, "a b"),
      (3L, "")).toDF("id", "text")
    val out = new ChunkSplitter().setInputCol("text").setOutputCol("chunk")
      .setChunkSize(4).setStride(2).transform(df).head
      .select("id", "chunk_index", "chunk", "chunk_tokens").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getString(2), r.getInt(3)))
    // doc1 starts: 0,2,4,6 → [t0..t3],[t2..t5],[t4..t6],[t6]
    val d1 = out.filter(_._1 == 1L).sortBy(_._2)
    assert(d1.map(_._3).toSeq == Seq("t0 t1 t2 t3", "t2 t3 t4 t5", "t4 t5 t6", "t6"))
    assert(d1.map(_._4).toSeq == Seq(4, 4, 3, 1))
    val d2 = out.filter(_._1 == 2L)
    assert(d2.length == 1 && d2.head._3 == "a b" && d2.head._4 == 2)
    // empty doc → no chunks
    assert(!out.exists(_._1 == 3L))
  }

  test("SequencePacker: greedy per-group bins, oversized doc isolated") {
    import spark.implicits._
    // tokens: a1=3, a2=4, a3=9(oversized), a4=2, b1=5, b2=5
    val df = Seq(
      (1L, "A", "w w w"),
      (2L, "A", "w w w w"),
      (3L, "A", "w w w w w w w w w"),
      (4L, "A", "w w"),
      (5L, "B", "w w w w w"),
      (6L, "B", "w w w w w")).toDF("id", "src", "text")
    val out = new SequencePacker().setInputCol("text").setIdCol("id")
      .setGroupCol("src").setTokenBudget(8).transform(df).head
      .select("id", "n_tokens", "bin_index").collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    // group A: [3] → bin0 (3); +4 → 7 ≤ 8 stays bin0; 9 overflows → bin1
    // (alone, oversized); 2 overflows bin1's 9 → bin2
    assert(out(1L) == (3L, 0L) && out(2L) == (4L, 0L))
    assert(out(3L) == (9L, 1L) && out(4L) == (2L, 2L))
    // group B independent: 5 → bin0; 5+5 > 8 → bin1
    assert(out(5L) == (5L, 0L) && out(6L) == (5L, 1L))
  }

  test("SequencePacker: assignment independent of input partitioning") {
    import spark.implicits._
    val rows = (1L to 200L).map(i => (i, s"s${i % 3}", ("w " * (i % 13 + 1).toInt).trim))
    val df1 = rows.toDF("id", "src", "text").repartition(1)
    val df2 = spark.createDataFrame(
      spark.sparkContext.parallelize(scala.util.Random.shuffle(rows), 7)
        .map(t => org.apache.spark.sql.Row(t._1, t._2, t._3)),
      df1.schema)
    val packer = new SequencePacker().setInputCol("text").setIdCol("id")
      .setGroupCol("src").setTokenBudget(40)
    def res(df: org.apache.spark.sql.DataFrame) =
      packer.transform(df).head.select("id", "bin_index").collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(res(df1) == res(df2))
  }

  test("param save/load round-trips") {
    val dir = java.nio.file.Files.createTempDirectory("graft-corpusops").toString
    val cs = new ChunkSplitter().setInputCol("t").setOutputCol("c")
      .setChunkSize(64).setStride(32)
    cs.save(s"$dir/cs")
    val cs2 = ChunkSplitter.load(spark, s"$dir/cs")
    assert(cs2.getChunkSize == 64 && cs2.getStride == 32)
    val sp = new SequencePacker().setInputCol("t").setIdCol("i")
      .setGroupCol("g").setTokenBudget(1024)
    sp.save(s"$dir/sp")
    val sp2 = SequencePacker.load(spark, s"$dir/sp")
    assert(sp2.getTokenBudget == 1024 && sp2.getGroupCol == "g")
  }
}
