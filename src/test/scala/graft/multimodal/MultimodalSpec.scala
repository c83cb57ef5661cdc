package graft.multimodal

import graft.SparkSpec

class MultimodalSpec extends SparkSpec {

  test("BinaryDecodeStub emits fixed-schema metadata for binary payloads") {
    import spark.implicits._
    val df = Seq((1L, "hello world"), (2L, "")).toDF("id", "s")
      .select(org.apache.spark.sql.functions.col("id"),
        org.apache.spark.sql.functions.col("s").cast("binary").as("payload"))
    val out = new BinaryDecodeStub().setInputCol("payload").setOutputCol("meta")
      .transform(df).head
    val schema = out.schema("meta").dataType.asInstanceOf[org.apache.spark.sql.types.StructType]
    assert(schema.fieldNames.toSeq == Seq("n_bytes", "digest", "header"))
    val r = out.where(org.apache.spark.sql.functions.col("id") === 1L)
      .select("meta.n_bytes", "meta.digest", "meta.header").head()
    assert(r.getLong(0) == 11L)
    assert(r.getString(1) == "5eb63bbbe01eeed093cb22bb8f5acdc3") // md5("hello world")
    assert(r.getString(2).equalsIgnoreCase("68656C6C")) // "hell"
  }

  test("ImageDecoder recovers dimensions from real PNG bytes; non-images decode to null") {
    import spark.implicits._
    val png = ImageDecoder.syntheticPng(17, 9, seed = 5L)
    val df = Seq((1L, png), (2L, "not an image".getBytes("UTF-8")), (3L, null))
      .toDF("id", "img")
    val out = new ImageDecoder().setInputCol("img").setOutputCol("meta")
      .transform(df).head
      .select("id", "meta.width", "meta.height", "meta.format")
      .orderBy("id").collect()
    assert(out(0).getInt(1) == 17 && out(0).getInt(2) == 9 && out(0).getString(3) == "png", out(0))
    assert(out(1).isNullAt(1) && out(2).isNullAt(1))
  }

  test("FrameSampler chunks payloads and keeps every n-th frame") {
    import spark.implicits._
    val payload = ("a" * 10) + ("b" * 10) + ("c" * 10) + ("d" * 5)
    val df = Seq((1L, payload)).toDF("id", "s")
      .select(org.apache.spark.sql.functions.col("id"),
        org.apache.spark.sql.functions.col("s").cast("binary").as("payload"))
    val all = new FrameSampler().setFrameBytes(10).setEveryNth(1)
      .setInputCol("payload").setOutputCol("frames").transform(df).head
      .select("frames").head().getSeq[String](0)
    assert(all.length == 4) // 10+10+10+5 bytes → 4 chunks
    val sampled = new FrameSampler().setFrameBytes(10).setEveryNth(2)
      .setInputCol("payload").setOutputCol("frames").transform(df).head
      .select("frames").head().getSeq[String](0)
    assert(sampled.length == 2) // chunks 0 and 2
    assert(sampled(0) == all(0) && sampled(1) == all(2))
  }
}
