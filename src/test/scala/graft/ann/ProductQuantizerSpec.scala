package graft.ann

import org.apache.spark.ml.linalg.Vectors
import org.apache.spark.sql.functions._
import graft.SparkSpec

/** PQ codec (Jégou et al. 2011) + IVFPQ composition. */
class ProductQuantizerSpec extends SparkSpec {

  private def corpus = {
    import spark.implicits._
    val rnd = new scala.util.Random(5)
    (0L until 400L).map { id =>
      val c = (id % 4).toInt
      val base = Array.tabulate(16)(i => if (i == c * 4) 5.0 else 0.0)
      (id, base.map(_ + rnd.nextGaussian() * 0.3).toSeq)
    }.toDF("id", "arr")
  }

  test("encode picks the nearest codebook entry per subspace; reconstruction concatenates them") {
    import spark.implicits._
    // 2 subspaces of 2 dims, pinned codebooks
    val books = Seq(
      (0, 0, Seq(0.0, 0.0)), (0, 1, Seq(10.0, 0.0)),
      (1, 0, Seq(0.0, 5.0)), (1, 1, Seq(5.0, 0.0)))
      .toDF("m", "code", "centroid")
    val model = new ProductQuantizer().setInputCol("arr").setOutputCol("codes")
      .setNumSubspaces(2).setInitialCodebooks(books).fit(Seq(Tuple1(Seq(0.0, 0.0, 0.0, 0.0))).toDF("arr"))
    val out = model.transform(Seq(
      (1L, Seq(9.0, 1.0, 0.5, 4.0)),   // -> codes (1, 0), recon (10,0,0,5)
      (2L, Seq(0.1, -0.2, 4.0, 1.0)))  // -> codes (0, 1), recon (0,0,5,0)
      .toDF("id", "arr")).head
      .select(col("id"), expr("transform(codes, c -> cast(c as int) + 128)").as("c"),
        col("codes_dequant"))
      .collect().map(r => r.getLong(0) -> (r.getSeq[Int](1), r.getSeq[Double](2))).toMap
    assert(out(1L) == (Seq(1, 0), Seq(10.0, 0.0, 0.0, 5.0)))
    assert(out(2L) == (Seq(0, 1), Seq(0.0, 0.0, 5.0, 0.0)))
  }

  test("trained codebooks reconstruct a clustered corpus with low error; save/load round-trips") {
    val pq = new ProductQuantizer().setInputCol("arr").setOutputCol("codes")
      .setNumSubspaces(4).setNumCodes(16).setTrainIters(10).setSeed(7L)
    val model = pq.fit(corpus)
    val dir = tmpDir()
    model.save(dir)
    val back = ProductQuantizerModel.load(spark, dir)
    val err = back.setInputCol("arr").setOutputCol("codes").transform(corpus).head
      .select(sqrt(expr(
        "aggregate(zip_with(arr, codes_dequant, (a, b) -> (a - b) * (a - b)), " +
          "cast(0.0 as double), (acc, x) -> acc + x)")).as("e"))
      .agg(avg("e")).head.getDouble(0)
    // vectors have norm ~5 with 0.3-sigma noise; 16 codes per 4-dim
    // subspace should reconstruct well under 1.0 mean L2 error
    assert(err < 1.0, s"mean reconstruction error $err")
  }

  test("IVFPQ probe: planted clusters recalled; lists store one byte per subspace") {
    import spark.implicits._
    val vecs = corpus.select(col("id"),
      org.apache.spark.ml.functions.array_to_vector(col("arr")).as("vec"))
    val model = new IvfIndexer().setIdCol("id").setVecCol("vec")
      .setNumLists(4).setTrainIters(5).setSeed(7L)
      .setQuantizer("pq").setPqSubspaces(4).setPqCodes(16)
      .fit(vecs)
    assert(model.getModelData.length == 3)
    val asgCols = model.getModelData(1).columns.toSet
    assert(asgCols == Set("id", "cell", "codes", "vnorm"), asgCols.toString)
    assert(model.getModelData(2).columns.toSet == Set("m", "code", "centroid"))
    // every neighbor comes from the query's own cluster
    val rnd = new scala.util.Random(99)
    val queries = (1000L until 1020L).map { id =>
      val c = (id % 4).toInt
      val base = Array.tabulate(16)(i => if (i == c * 4) 5.0 else 0.0)
      (id, Vectors.dense(base.map(_ + rnd.nextGaussian() * 0.3)))
    }.toDF("id", "vec")
    val out = model.setK(3).setNprobe(2).transform(queries).head.collect()
    assert(out.length == queries.count() * 3)
    out.foreach(r => assert(r.getLong(0) % 4 == r.getLong(1) % 4, r))
    // IVFPQ survives save/load with its codebooks frame
    val dir = tmpDir()
    model.save(dir)
    val back = IvfIndexModel.load(spark, dir)
    assert(back.getModelData.length == 3)
    val out2 = back.setK(1).setNprobe(1).transform(queries).head.collect()
    out2.foreach(r => assert(r.getLong(0) % 4 == r.getLong(1) % 4, r))
  }

  test("null vectors pass through as null codes, and never poison codebook training") {
    import spark.implicits._
    val withNull = Seq((1L, Some(Seq(1.0, 2.0, 3.0, 4.0))), (2L, Option.empty[Seq[Double]]))
      .toDF("id", "arr")
    val model = new ProductQuantizer().setInputCol("arr").setOutputCol("codes")
      .setNumSubspaces(2).setNumCodes(2).setTrainIters(2).setSeed(1L)
      .fit(withNull)
    val rows = model.transform(withNull).head.select("id", "codes").collect()
      .map(r => r.getLong(0) -> r.isNullAt(1)).toMap
    assert(!rows(1L) && rows(2L))
  }

  test("quantized probes stay equi-join-shaped (no cartesian, no nested loop)") {
    import spark.implicits._
    val vecs = corpus.select(col("id"),
      org.apache.spark.ml.functions.array_to_vector(col("arr")).as("vec"))
    val queries = Seq((1000L, Vectors.dense(Array.tabulate(16)(i => if (i == 0) 5.0 else 0.1))))
      .toDF("id", "vec")
    Seq("int8", "pq").foreach { codec =>
      val model = new IvfIndexer().setIdCol("id").setVecCol("vec")
        .setNumLists(4).setTrainIters(2).setSeed(7L)
        .setQuantizer(codec).setPqSubspaces(4).setPqCodes(16)
        .fit(vecs)
      val plan = model.setK(3).setNprobe(2).transform(queries).head
        .queryExecution.executedPlan.toString
      assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"),
        s"$codec: $plan")
    }
  }

  test("guards: dim not divisible by subspaces fails fast; non-contiguous codes rejected") {
    import spark.implicits._
    val bad = Seq(Tuple1(Seq(1.0, 2.0, 3.0))).toDF("arr")
    val ex = intercept[IllegalArgumentException] {
      new ProductQuantizer().setInputCol("arr").setOutputCol("c")
        .setNumSubspaces(2).fit(bad)
    }
    assert(ex.getMessage.contains("divisible"), ex.getMessage)
    // encode of a vector whose dim disagrees with the codebooks must
    // throw, not silently encode a prefix (r9 review finding)
    val books = Seq((0, 0, Seq(0.0, 0.0)), (1, 0, Seq(0.0, 0.0))).toDF("m", "code", "centroid")
    val model = new ProductQuantizerModel().setModelData(books)
      .setInputCol("arr").setOutputCol("c")
    val exDim = intercept[Exception] {
      model.transform(Seq(Tuple1(Seq(1.0, 2.0, 3.0, 4.0, 5.0))).toDF("arr")).head.collect()
    }
    assert(exDim.getMessage != null)
    val gappy = Seq((0, 0, Seq(1.0)), (0, 2, Seq(2.0))).toDF("m", "code", "centroid")
    val ex2 = intercept[IllegalArgumentException] {
      new ProductQuantizerModel().setModelData(gappy)
        .setInputCol("arr").setOutputCol("c")
        .transform(Seq(Tuple1(Seq(1.0))).toDF("arr")).head.collect()
    }
    assert(ex2.getMessage.contains("contiguous"), ex2.getMessage)
  }
}
