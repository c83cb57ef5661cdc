package graft.feature

import org.apache.spark.ml.linalg.{Vector, Vectors}
import graft.SparkSpec

class EstimatorsSpec extends SparkSpec {

  def approx(a: Array[Double], b: Array[Double], tol: Double = 1e-9): Boolean =
    a.length == b.length && a.zip(b).forall { case (x, y) => math.abs(x - y) < tol }

  test("StandardScaler computes mean and sample std; withMean/withStd control") {
    import spark.implicits._
    val df = Seq(
      Vectors.dense(1.0, 2.0), Vectors.dense(3.0, 4.0), Vectors.dense(5.0, 6.0))
      .map(Tuple1(_)).toDF("input")
    val model = new StandardScaler().fit(df)
    val md = model.getModelData.head.head()
    assert(approx(md.getAs[Vector]("mean").toArray, Array(3.0, 4.0)))
    assert(approx(md.getAs[Vector]("std").toArray, Array(2.0, 2.0)))
    // default: withStd only
    val out = model.transform(df).head.select("output").collect().map(_.getAs[Vector](0))
    assert(approx(out(0).toArray, Array(0.5, 1.0)))
    // withMean + withStd
    val m2 = new StandardScaler().setWithMean(true).fit(df)
    val out2 = m2.transform(df).head.select("output").collect().map(_.getAs[Vector](0))
    assert(approx(out2(0).toArray, Array(-1.0, -1.0)))
    assert(approx(out2(1).toArray, Array(0.0, 0.0)))
  }

  test("StandardScaler save/load round trip with model data") {
    import spark.implicits._
    val df = Seq(Vectors.dense(1.0), Vectors.dense(3.0)).map(Tuple1(_)).toDF("input")
    val model = new StandardScaler().setWithMean(true).fit(df)
    val dir = tmpDir()
    model.save(dir)
    val loaded = StandardScalerModel.load(spark, dir)
    assert(loaded.getWithMean)
    val out = loaded.transform(df).head.select("output").collect().map(_.getAs[Vector](0))
    assert(approx(out(0).toArray, Array(-math.sqrt(0.5)), 1e-9))
  }

  test("MinMaxScaler rescales to [min,max]; constant dim → midpoint") {
    import spark.implicits._
    val df = Seq(Vectors.dense(0.0, 7.0), Vectors.dense(10.0, 7.0))
      .map(Tuple1(_)).toDF("input")
    val model = new MinMaxScaler().setMin(0.0).setMax(1.0).fit(df)
    val out = model.transform(df).head.select("output").collect().map(_.getAs[Vector](0))
    assert(approx(out(0).toArray, Array(0.0, 0.5)))
    assert(approx(out(1).toArray, Array(1.0, 0.5)))
  }

  test("MaxAbsScaler scales by max |x|") {
    import spark.implicits._
    val df = Seq(Vectors.dense(-4.0, 2.0), Vectors.dense(2.0, -1.0))
      .map(Tuple1(_)).toDF("input")
    val out = new MaxAbsScaler().fit(df).transform(df).head
      .select("output").collect().map(_.getAs[Vector](0))
    assert(approx(out(0).toArray, Array(-1.0, 1.0)))
    assert(approx(out(1).toArray, Array(0.5, -0.5)))
  }

  test("RobustScaler scales by IQR; centering subtracts median") {
    import spark.implicits._
    val df = (1 to 9).map(i => Tuple1(Vectors.dense(i.toDouble))).toDF("input")
    val model = new RobustScaler().setWithCentering(true).fit(df)
    val out = model.transform(df).head.select("output").collect().map(_.getAs[Vector](0))
    // median 5, IQR = q75-q25
    val md = model.getModelData.head.head()
    assert(md.getAs[Vector]("medians")(0) == 5.0)
    val rng = md.getAs[Vector]("ranges")(0)
    assert(rng > 0)
    assert(math.abs(out(4)(0)) < 1e-12) // median row → 0
  }

  test("Imputer mean/median/most_frequent") {
    import spark.implicits._
    val df = Seq(
      (Some(1.0), Some(10.0)), (Some(3.0), Some(10.0)), (None, Some(30.0)),
      (Some(Double.NaN), Some(50.0))).toDF("a", "b")
    val mMean = new Imputer().setInputCols("a", "b").setOutputCols("ao", "bo").fit(df)
    val sm = mMean.getModelData.head.collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(sm("a") == 2.0 && sm("b") == 25.0)
    val outRows = mMean.transform(df).head.select("ao").as[Double].collect()
    assert(outRows(2) == 2.0 && outRows(3) == 2.0)

    val mFreq = new Imputer().setInputCols("b").setOutputCols("bo")
      .setStrategy("most_frequent").fit(df)
    assert(mFreq.getModelData.head.head().getDouble(1) == 10.0)

    val mMed = new Imputer().setInputCols("b").setOutputCols("bo")
      .setStrategy("median").fit(df)
    val med = mMed.getModelData.head.head().getDouble(1)
    assert(med == 10.0 || med == 30.0) // approx median of {10,10,30,50}
  }

  test("CountVectorizer learns vocab by frequency; minDF filters; transform counts") {
    import spark.implicits._
    val df = Seq(
      Seq("a", "b", "c"), Seq("a", "b", "b", "c", "a")).toDF("input")
    val model = new CountVectorizer().fit(df)
    val vocab = model.getModelData.head.head().getSeq[String](0)
    // counts: a=3, b=3, c=2 → a,b (tie term asc), c
    assert(vocab == Seq("a", "b", "c"))
    val out = model.transform(df).head.select("output").collect().map(_.getAs[Vector](0))
    assert(out(1) == Vectors.sparse(3, Array(0, 1, 2), Array(2.0, 2.0, 1.0)))

    val m2 = new CountVectorizer().setMinDF(2.0).fit(
      Seq(Seq("a", "b"), Seq("a", "c")).toDF("input"))
    assert(m2.getModelData.head.head().getSeq[String](0) == Seq("a"))
  }

  test("IDF computes log((m+1)/(d+1)); minDocFreq zeroes rare terms") {
    import spark.implicits._
    val df = Seq(
      Vectors.dense(1.0, 0.0, 1.0), Vectors.dense(1.0, 1.0, 0.0),
      Vectors.dense(1.0, 0.0, 0.0)).map(Tuple1(_)).toDF("input")
    val model = new IDF().fit(df)
    val idf = model.getModelData.head.head().getAs[Vector]("idf").toArray
    assert(approx(idf, Array(math.log(4.0 / 4), math.log(4.0 / 2), math.log(4.0 / 2))))
    val m2 = new IDF().setMinDocFreq(2).fit(df)
    val idf2 = m2.getModelData.head.head().getAs[Vector]("idf").toArray
    assert(idf2(1) == 0.0 && idf2(2) == 0.0)
  }

  test("StringIndexer frequencyDesc with keep/skip handleInvalid; IndexToString inverse") {
    import spark.implicits._
    val train = Seq(("a", 1.0), ("b", 1.0), ("b", 2.0)).toDF("c1", "c2")
    val model = new StringIndexer().setInputCols("c1", "c2").setOutputCols("o1", "o2")
      .setStringOrderType("frequencyDesc").fit(train)
    // c1: b(2) → 0, a(1) → 1 ; c2: 1.0(2) → 0, 2.0(1) → 1
    val out = model.setHandleInvalid("keep").transform(
      Seq(("a", 2.0), ("e", 1.0)).toDF("c1", "c2")).head
    val rows = out.select("o1", "o2").collect()
    assert(rows(0).getDouble(0) == 1.0 && rows(0).getDouble(1) == 1.0)
    assert(rows(1).getDouble(0) == 2.0 && rows(1).getDouble(1) == 0.0) // e unseen → 2

    val skipped = model.setHandleInvalid("skip").transform(
      Seq(("a", 2.0), ("e", 1.0)).toDF("c1", "c2")).head
    assert(skipped.count() == 1)

    // inverse
    val i2s = new IndexToStringModel().setInputCols("o1").setOutputCols("s1")
      .setModelData(model.getModelData.head)
    val back = i2s.transform(
      model.setHandleInvalid("error").transform(train).head.select("o1")).head
    assert(back.select("s1").as[String].collect().sorted.toSeq == Seq("a", "b", "b"))
  }

  test("StringIndexer alphabetAsc/Desc ordering") {
    import spark.implicits._
    val train = Seq(Tuple1("b"), Tuple1("a"), Tuple1("c"), Tuple1("b")).toDF("c1")
    val asc = new StringIndexer().setInputCols("c1").setOutputCols("o1")
      .setStringOrderType("alphabetAsc").fit(train)
    val terms = asc.getModelData.head.head().getSeq[String](1)
    assert(terms == Seq("a", "b", "c"))
  }

  test("OneHotEncoder dropLast semantics") {
    import spark.implicits._
    val df = Seq(0.0, 1.0, 2.0).map(Tuple1(_)).toDF("c")
    val model = new OneHotEncoder().setInputCols("c").setOutputCols("v").fit(df)
    val out = model.transform(df).head.select("v").collect().map(_.getAs[Vector](0))
    assert(out(0) == Vectors.sparse(2, Array(0), Array(1.0)))
    assert(out(2) == Vectors.sparse(2, Array.empty[Int], Array.empty[Double])) // last dropped
    val m2 = new OneHotEncoder().setInputCols("c").setOutputCols("v").setDropLast(false).fit(df)
    val out2 = m2.transform(df).head.select("v").collect().map(_.getAs[Vector](0))
    assert(out2(2) == Vectors.sparse(3, Array(2), Array(1.0)))
  }

  test("OneHotEncoder rejects unseen category indices") {
    import spark.implicits._
    val df = Seq(0.0, 1.0, 2.0).map(Tuple1(_)).toDF("c")
    val model = new OneHotEncoder().setInputCols("c").setOutputCols("v")
      .setDropLast(false).fit(df)
    val bad = Seq(3.0).map(Tuple1(_)).toDF("c")
    intercept[org.apache.spark.SparkException] {
      model.transform(bad).head.collect()
    }
  }

  test("Imputer fails loudly on an all-missing column") {
    import spark.implicits._
    val df = Seq(Some(Double.NaN), None, Some(Double.NaN)).map(Tuple1(_)).toDF("a")
    Seq("mean", "median", "most_frequent").foreach { strategy =>
      val e = intercept[IllegalArgumentException] {
        new Imputer().setInputCols("a").setOutputCols("ao").setStrategy(strategy).fit(df)
      }
      assert(e.getMessage.contains("no valid values"), s"strategy=$strategy")
    }
  }

  test("VectorIndexer maps categorical dims (0 first), passes continuous") {
    import spark.implicits._
    val df = Seq(
      Vectors.dense(-1.0, 10.0), Vectors.dense(0.0, 20.0), Vectors.dense(1.0, 30.0),
      Vectors.dense(-1.0, 40.0), Vectors.dense(0.0, 50.0), Vectors.dense(1.0, 60.0))
      .map(Tuple1(_)).toDF("input")
    val model = new VectorIndexer().setMaxCategories(3).fit(df)
    val out = model.transform(df).head.select("output").collect().map(_.getAs[Vector](0))
    // dim0: {-1,0,1}: 0→0, -1→1, 1→2 ; dim1: 6 distinct > 3 → continuous
    assert(out(0)(0) == 1.0 && out(1)(0) == 0.0 && out(2)(0) == 2.0)
    assert(out(3)(1) == 40.0)
  }

  test("VarianceThresholdSelector drops low-variance dims") {
    import spark.implicits._
    val df = Seq(
      Vectors.dense(1.0, 5.0, 7.0), Vectors.dense(2.0, 5.0, 8.0), Vectors.dense(3.0, 5.0, 9.0))
      .map(Tuple1(_)).toDF("input")
    val model = new VarianceThresholdSelector().setVarianceThreshold(0.5).fit(df)
    val out = model.transform(df).head.select("output").collect().map(_.getAs[Vector](0))
    assert(out(0) == Vectors.dense(1.0, 7.0)) // middle constant dim dropped
  }

  test("KBinsDiscretizer uniform and quantile strategies") {
    import spark.implicits._
    val df = (1 to 100).map(i => Tuple1(Vectors.dense(i.toDouble))).toDF("input")
    val uni = new KBinsDiscretizer().setStrategy("uniform").setNumBins(4).fit(df)
    val outU = uni.transform(df).head.select("output").collect().map(_.getAs[Vector](0)(0))
    assert(outU(0) == 0.0 && outU(99) == 3.0 && outU(49) == 1.0)

    val q = new KBinsDiscretizer().setStrategy("quantile").setNumBins(4).fit(df)
    val outQ = q.transform(df).head.select("output").collect().map(_.getAs[Vector](0)(0))
    assert(outQ.distinct.sorted.toSeq == Seq(0.0, 1.0, 2.0, 3.0))

    // constant dim → all zero
    val dfC = (1 to 10).map(_ => Tuple1(Vectors.dense(7.0))).toDF("input")
    val c = new KBinsDiscretizer().setStrategy("uniform").setNumBins(3).fit(dfC)
    val outC = c.transform(dfC).head.select("output").collect().map(_.getAs[Vector](0)(0))
    assert(outC.forall(_ == 0.0))
  }
}
