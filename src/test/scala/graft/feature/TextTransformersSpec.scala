package graft.feature

import graft.SparkSpec

class TextTransformersSpec extends SparkSpec {
  import org.apache.spark.sql.Row

  test("Tokenizer param defaults and setters") {
    val t = new Tokenizer
    assert(t.getInputCol == "input")
    assert(t.getOutputCol == "output")
    t.setInputCol("in").setOutputCol("out")
    assert(t.getInputCol == "in" && t.getOutputCol == "out")
  }

  test("Tokenizer lowercases and splits on whitespace (Java split semantics)") {
    import spark.implicits._
    val df = Seq("Test for tokenization.", "Te,st. punct", "  leading").toDF("input")
    val out = new Tokenizer().transform(df).head
    val got = out.select("output").as[Seq[String]].collect().toSeq
    assert(got(0) == Seq("test", "for", "tokenization."))
    assert(got(1) == Seq("te,st.", "punct"))
    // Java split("\\s") on "  leading": two leading empties kept
    assert(got(2) == Seq("", "", "leading"))
  }

  test("Tokenizer save/load round trip") {
    val dir = tmpDir()
    val t = new Tokenizer().setInputCol("a").setOutputCol("b")
    t.save(dir)
    val loaded = Tokenizer.load(spark, dir)
    assert(loaded.getInputCol == "a" && loaded.getOutputCol == "b")
  }

  test("RegexTokenizer gaps=false matches tokens; minTokenLength filters") {
    import spark.implicits._
    val df = Seq("Te,st. punct").toDF("input")
    val rt = new RegexTokenizer().setGaps(false).setPattern("\\w+").setMinTokenLength(3)
    val got = rt.transform(df).head.select("output").as[Seq[String]].collect().head
    assert(got == Seq("punct"))
  }

  test("RegexTokenizer default splits on \\s+") {
    import spark.implicits._
    val df = Seq("Test  for tokenization.").toDF("input")
    val got = new RegexTokenizer().transform(df).head
      .select("output").as[Seq[String]].collect().head
    assert(got == Seq("test", "for", "tokenization."))
  }

  test("NGram produces sliding n-grams; short input gives empty") {
    import spark.implicits._
    val df = Seq(Seq("a", "b", "c", "d"), Seq("x")).toDF("input")
    val got = new NGram().setN(2).transform(df).head
      .select("output").as[Seq[String]].collect().toSeq
    assert(got(0) == Seq("a b", "b c", "c d"))
    assert(got(1) == Seq.empty)
  }

  test("StopWordsRemover removes english stop words case-insensitively") {
    import spark.implicits._
    val df = Seq(Seq("I", "saw", "the", "red", "balloon")).toDF("raw")
    val r = new StopWordsRemover().setInputCols("raw").setOutputCols("filtered")
    val got = r.transform(df).head.select("filtered").as[Seq[String]].collect().head
    assert(got == Seq("saw", "red", "balloon"))
  }

  test("StopWordsRemover multi-column and case sensitivity") {
    import spark.implicits._
    val df = Seq((Seq("The", "dog"), Seq("a", "cat"))).toDF("c1", "c2")
    val r = new StopWordsRemover().setInputCols("c1", "c2").setOutputCols("o1", "o2")
      .setCaseSensitive(true)
    val row = r.transform(df).head.select("o1", "o2").collect().head
    assert(row.getSeq[String](0) == Seq("The", "dog"))
    assert(row.getSeq[String](1) == Seq("cat"))
  }
}
