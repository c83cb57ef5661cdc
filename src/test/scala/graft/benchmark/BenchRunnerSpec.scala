package graft.benchmark

import graft.SparkSpec

class BenchRunnerSpec extends SparkSpec {

  test("BenchRunner executes stage+generator specs from a JSON config") {
    spark // force shared session so BenchRunner's getOrCreate reuses it
    val config =
      """{
        |  "version": 1,
        |  "tokenizer": {
        |    "stage": {"className": "graft.feature.Tokenizer", "paramMap": {}},
        |    "inputData": {
        |      "className": "graft.benchmark.RandomStringGenerator",
        |      "paramMap": {"seed": 2, "colNames": [["input"]], "numValues": 2000, "numDistinctValues": 10}
        |    }
        |  },
        |  "kmeansmodel": {
        |    "stage": {
        |      "className": "graft.clustering.KMeansModel",
        |      "paramMap": {"featuresCol": "features", "distanceMeasure": "euclidean"}
        |    },
        |    "modelData": {
        |      "className": "graft.benchmark.KMeansModelDataGenerator",
        |      "paramMap": {"seed": 1, "arraySize": 2, "vectorDim": 4}
        |    },
        |    "inputData": {
        |      "className": "graft.benchmark.DenseVectorGenerator",
        |      "paramMap": {"seed": 2, "colNames": [["features"]], "numValues": 1000, "vectorDim": 4}
        |    }
        |  },
        |  "bucketizer": {
        |    "stage": {
        |      "className": "graft.feature.Bucketizer",
        |      "paramMap": {"inputCols": ["c"], "outputCols": ["o"], "handleInvalid": "keep",
        |                   "splitsArray": [[-1.0, 0.0, 0.5, 1.0, 2.0]]}
        |    },
        |    "inputData": {
        |      "className": "graft.benchmark.DoubleGenerator",
        |      "paramMap": {"seed": 2, "colNames": [["c"]], "numValues": 1500}
        |    }
        |  }
        |}""".stripMargin
    val f = java.nio.file.Files.createTempFile("benchrunner", ".json")
    java.nio.file.Files.writeString(f, config)

    val out = new java.io.ByteArrayOutputStream()
    Console.withOut(new java.io.PrintStream(out)) {
      BenchRunner.main(Array(f.toString))
    }
    val lines = out.toString.linesIterator.filter(_.contains("totalTimeMs")).toSeq
    assert(lines.size == 3, out.toString)
    // reference metric surface (BenchmarkResult.java:32-44), right counts
    val byName = lines.map { l =>
      val name = "\"name\":\"(\\w+)\"".r.findFirstMatchIn(l).get.group(1)
      val outN = "\"outputRecordNum\":(\\d+)".r.findFirstMatchIn(l).get.group(1).toLong
      name -> (l, outN)
    }.toMap
    assert(byName("tokenizer")._2 == 2000L)
    assert(byName("kmeansmodel")._2 == 1000L)
    assert(byName("bucketizer")._2 == 1500L)
    assert(byName.values.forall(_._1.contains("inputThroughput")))
  }
}
