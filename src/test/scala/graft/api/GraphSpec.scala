package graft.api

import org.apache.spark.sql.functions.col
import graft.SparkSpec
import graft.feature.{MinMaxScaler, StandardScaler, VectorAssembler}

class GraphSpec extends SparkSpec {

  private def input = {
    import spark.implicits._
    Seq((1.0, 10.0), (2.0, 20.0), (3.0, 30.0), (4.0, 40.0)).toDF("a", "b")
  }

  test("graph as Estimator: branch-and-join DAG fits and transforms") {
    val builder = new GraphBuilder().setMaxOutputTableNum(2)
    val src = builder.createTableId()
    // assembler → two parallel scalers over the same assembled table
    val assembler = new VectorAssembler()
      .setInputCols("a", "b").setOutputCol("vec").setInputSizes(1, 1)
    val assembled = builder.addAlgoOperator(assembler, src)
    val std = new StandardScaler().setInputCol("vec").setOutputCol("std_out")
    val stdOut = builder.addEstimator(std, assembled.head)
    val mm = new MinMaxScaler().setInputCol("vec").setOutputCol("mm_out")
    val mmOut = builder.addEstimator(mm, stdOut.head)
    val graph = builder.buildEstimator(Seq(src), Seq(mmOut.head))

    val model = graph.fit(input)
    val out = model.transform(input).head
    assert(out.columns.contains("std_out") && out.columns.contains("mm_out"))
    // equals the hand-chained pipeline result
    val manual = {
      val a = assembler.transform(input).head
      val s = std.fit(a).transform(a).head
      mm.fit(s).transform(s).head
    }
    assert(out.collect().map(_.toString).sorted.toSeq ===
      manual.collect().map(_.toString).sorted.toSeq)
  }

  test("getModelDataFromEstimator exposes fitted model data as a graph output") {
    val builder = new GraphBuilder().setMaxOutputTableNum(1)
    val src = builder.createTableId()
    val assembler = new VectorAssembler()
      .setInputCols("a").setOutputCol("vec").setInputSizes(1)
    val assembled = builder.addAlgoOperator(assembler, src)
    val std = new StandardScaler().setInputCol("vec")
    builder.addEstimator(std, assembled.head)
    val modelData = builder.getModelDataFromEstimator(std)
    val graph = builder.buildEstimator(Seq(src), Seq(modelData.head))
    val out = graph.fit(input).transform(input).head
    // StandardScaler model data: one row of (mean, std) vectors
    assert(out.count() == 1)
    assert(out.columns.toSeq.contains("mean"))
  }

  test("setModelDataOnModel wires external model data through the graph") {
    import spark.implicits._
    val builder = new GraphBuilder().setMaxOutputTableNum(1)
    val src = builder.createTableId()
    val dataIn = builder.createTableId()
    val assembler = new VectorAssembler()
      .setInputCols("a").setOutputCol("features").setInputSizes(1)
    val assembled = builder.addAlgoOperator(assembler, src)
    val model = new graft.classification.LogisticRegressionModel()
    val scored = builder.addAlgoOperator(model, assembled.head)
    builder.setModelDataOnModel(model, dataIn)
    val graphOp = builder.buildAlgoOperator(Seq(src, dataIn), Seq(scored.head))

    val coeffs = Seq(Tuple1(Array(1.0))).toDF("coefficient")
      .select(org.apache.spark.ml.functions.array_to_vector(col("coefficient")).as("coefficient"))
    val out = graphOp.transform(input, coeffs).head
    assert(out.columns.contains("prediction"))
    assert(out.count() == 4)
  }

  test("Graph and fitted GraphModel survive save/load (reference GraphTest save paths)") {
    val builder = new GraphBuilder().setMaxOutputTableNum(2)
    val src = builder.createTableId()
    val assembler = new VectorAssembler()
      .setInputCols("a", "b").setOutputCol("vec").setInputSizes(1, 1)
    val assembled = builder.addAlgoOperator(assembler, src)
    val std = new StandardScaler().setInputCol("vec").setOutputCol("std_out")
    val stdOut = builder.addEstimator(std, assembled.head)
    val graph = builder.buildEstimator(Seq(src), Seq(stdOut.head))

    // unfitted Graph round trip, then fit the loaded graph
    val gDir = tmpDir()
    graph.save(gDir)
    val loadedGraph = Graph.load(spark, gDir)
    val expected = graph.fit(input).transform(input).head
      .collect().map(_.toString).sorted.toSeq
    val gotG = loadedGraph.fit(input).transform(input).head
      .collect().map(_.toString).sorted.toSeq
    assert(gotG === expected)

    // fitted GraphModel round trip scores identically
    val mDir = tmpDir()
    graph.fit(input).save(mDir)
    val loadedModel = GraphModel.load(spark, mDir)
    val gotM = loadedModel.transform(input).head
      .collect().map(_.toString).sorted.toSeq
    assert(gotM === expected)
  }

  test("a node whose input table is never produced is reported, not hung") {
    val builder = new GraphBuilder().setMaxOutputTableNum(1)
    val src = builder.createTableId()
    val orphan = builder.createTableId() // no stage ever produces this
    val std = new StandardScaler().setInputCol("vec").setOutputCol("out")
    val stdOut = builder.addEstimator(std, orphan)
    val graph = builder.buildEstimator(Seq(src), Seq(stdOut.head))
    intercept[IllegalArgumentException] { graph.fit(input) }
  }
}
