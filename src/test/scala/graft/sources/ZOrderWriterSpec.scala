package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ZOrderWriterSpec extends SparkSpec {

  /** Scala reference interleave. */
  private def mortonRef(buckets: Seq[Long], bits: Int): Long = {
    val k = buckets.size
    var z = 0L
    for (i <- 0 until k; j <- 0 until bits)
      z |= ((buckets(i) >> j) & 1L) << (j * k + i)
    z
  }

  test("interleaveBits matches the reference bit interleave (2 and 3 columns)") {
    import spark.implicits._
    val rnd = new scala.util.Random(5)
    val rows = (0 until 200).map(_ =>
      (rnd.nextInt(256).toLong, rnd.nextInt(256).toLong, rnd.nextInt(256).toLong))
    val df = rows.toDF("a", "b", "c")
    val got2 = df.select(ZOrderWriter.interleaveBits(Seq(col("a"), col("b")), 8).as("z"))
      .collect().map(_.getLong(0))
    rows.map(r => mortonRef(Seq(r._1, r._2), 8)).zip(got2)
      .foreach { case (w, g) => assert(w == g) }
    val got3 = df.select(ZOrderWriter.interleaveBits(Seq(col("a"), col("b"), col("c")), 8).as("z"))
      .collect().map(_.getLong(0))
    rows.map(r => mortonRef(Seq(r._1, r._2, r._3), 8)).zip(got3)
      .foreach { case (w, g) => assert(w == g) }
  }

  test("bucketize: clamped linear scaling, max in top bucket, nulls and constants to 0") {
    import spark.implicits._
    val df = Seq(Some(0.0), Some(5.0), Some(10.0), Some(-3.0), Some(99.0), None)
      .toDF("v")
    val got = df.select(ZOrderWriter.bucketize(col("v"), 0.0, 10.0, 4).as("b"))
      .collect().map(r => r.getLong(0))
    assert(got.toSeq == Seq(0L, 8L, 15L, 0L, 15L, 0L), got.toSeq)
    val const = df.select(ZOrderWriter.bucketize(col("v"), 7.0, 7.0, 4).as("b"))
      .collect().map(_.getLong(0))
    assert(const.forall(_ == 0L))
  }

  test("z-ordered files own small rectangles in BOTH dims (a 1-D sort cannot)") {
    import spark.implicits._
    val rnd = new scala.util.Random(9)
    val df = (0 until 20000).map(_ => (rnd.nextDouble() * 1000, rnd.nextDouble() * 1000))
      .toDF("x", "y")
    val dir = tmpDir() + "/z"
    ZOrderWriter.write(df, Seq("x", "y"), dir, numFiles = 16, bits = 10)
    val back = spark.read.parquet(dir)
    assert(back.count() == 20000)
    assert(back.columns.toSeq == Seq("x", "y")) // helper column dropped
    val spans = back.withColumn("f", input_file_name())
      .groupBy("f")
      .agg((max("x") - min("x")).as("xs"), (max("y") - min("y")).as("ys"))
      .collect()
    assert(spans.length > 8 && spans.length <= 16, spans.length)
    val avgX = spans.map(_.getDouble(1)).sum / spans.length
    val avgY = spans.map(_.getDouble(2)).sum / spans.length
    // a sort on x alone gives avgY ~= 1000 (full span) on every file;
    // z-order must bound BOTH well below the full span
    assert(avgX < 700 && avgY < 700, s"avgX=$avgX avgY=$avgY")
  }

  test("guards: too many bits, reserved column, all-null column") {
    import spark.implicits._
    val df = Seq((1.0, 2.0)).toDF("x", "y")
    intercept[IllegalArgumentException] {
      ZOrderWriter.interleaveBits(Seq(col("x"), col("y")), 32)
    }
    intercept[IllegalArgumentException] {
      ZOrderWriter.withZValue(df.withColumn("__z", lit(1L)), Seq("x"), 8)
    }
    intercept[IllegalArgumentException] {
      ZOrderWriter.withZValue(
        df.withColumn("n", lit(null).cast("double")), Seq("n"), 8)
    }
  }
}
