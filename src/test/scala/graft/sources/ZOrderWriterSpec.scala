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

  test("quantileBucketize: exact counting search vs a reference count, monotone, nulls to 0") {
    import spark.implicits._
    // boundaries with a duplicate run (heavy hitter) and irregular gaps
    val bits = 4
    val bnd = Array(1.0, 2.0, 5.0, 5.0, 5.0, 5.0, 8.0, 13.0,
      21.0, 34.0, 55.0, 55.0, 89.0, 144.0, 233.0)
    val vals: Seq[Option[Double]] =
      Seq(Some(-10.0), Some(1.0), Some(4.9), Some(5.0), Some(6.0), Some(55.0),
        Some(100.0), Some(1e9), None) ++ (0 until 300).map(i => Some(i * 1.7 - 20))
    val df = vals.toDF("v")
    val got = df.select(col("v"),
      ZOrderWriter.quantileBucketize(col("v"), bnd, bits).as("b")).collect()
      .map(r => (Option(r.get(0)).map(_.asInstanceOf[Double]), r.getLong(1)))
    got.foreach { case (ov, b) =>
      ov match {
        case None => assert(b == 0L)
        case Some(v) =>
          // reference: count of boundaries <= v, capped at 2^bits-1 —
          // the two-level search may land anywhere inside a duplicate
          // run, so compare against the run's [first, last] bracket
          val lo = bnd.count(_ < v)
          val hi = math.min(15L, bnd.count(_ <= v).toLong)
          assert(b >= lo && b <= hi, s"v=$v bucket=$b not in [$lo,$hi]")
      }
    }
    // monotone in v
    val sorted = got.collect { case (Some(v), b) => (v, b) }.sortBy(_._1)
    sorted.sliding(2).foreach { case Array((v1, b1), (v2, b2)) =>
      assert(b1 <= b2, s"monotonicity broke: f($v1)=$b1 > f($v2)=$b2")
    }
  }

  test("strategy=quantile equalizes bucket mass on a Zipf column (linear collapses)") {
    import spark.implicits._
    // log-uniform over [1, e^10): heavily right-skewed
    val rnd = new scala.util.Random(11)
    val df = (0 until 40000).map(_ => math.exp(rnd.nextDouble() * 10)).toDF("x")
    val lin = ZOrderWriter.withZValue(df, Seq("x"), bits = 6)
      .groupBy("__z").count().collect()
    val qnt = ZOrderWriter.withZValue(df, Seq("x"), bits = 6, strategy = "quantile")
      .groupBy("__z").count().collect()
    val linMax = lin.map(_.getLong(1)).max
    val qntMax = qnt.map(_.getLong(1)).max
    // linear: ~everything below e^10/64 -> one giant bucket (>60% of
    // rows); quantile: 64 buckets of ~625 rows each
    assert(linMax > 20000, s"skew fixture broke: linear max bucket $linMax")
    assert(qntMax < 2500, s"quantile failed to equalize: max bucket $qntMax")
    assert(qnt.length > 48, s"quantile used only ${qnt.length} buckets")
    intercept[IllegalArgumentException] {
      ZOrderWriter.withZValue(df, Seq("x"), 6, strategy = "nope")
    }
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
