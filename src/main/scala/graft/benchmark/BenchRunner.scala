package graft.benchmark

import org.apache.spark.sql.{DataFrame, Row, SparkSession}

/**
 * JSON-config benchmark runner, reproducing the reference's benchmark
 * protocol (flink-ml-benchmark BenchmarkUtils.java:74-146): a config
 * file maps benchmark names to {stage, inputData[, modelData]} specs,
 * each spec being {className, paramMap}; an Estimator stage is fit and
 * its model-data tables counted, an AlgoOperator stage is transformed
 * and its outputs counted; the reported metrics are totalTimeMs,
 * inputRecordNum, inputThroughput, outputRecordNum, outputThroughput
 * (BenchmarkResult.java:32-44, BenchmarkUtils.java:132-137).
 *
 * Our config files live in benchmarks/ (benchmarks/reference-suite.json
 * mirrors all 36 reference resource workloads with graft class names).
 *
 * Usage: runMain graft.benchmark.BenchRunner <config.json> [--scale X]
 *        [--only name1,name2] [--output-file results.json]
 * `--scale` multiplies every generator's numValues (reference sizes are
 * 1e7-1e8 rows; use --scale 0.01 for a local smoke run). `--output-file`
 * additionally saves the result list as a JSON array (the reference
 * Benchmark CLI's --output-file, BenchmarkUtils.saveResultsAsJson).
 */
object BenchRunner {

  def main(args: Array[String]): Unit = {
    var configPath: Option[String] = None
    var scale = 1.0
    var only: Option[Set[String]] = None
    var outputFile: Option[String] = None
    var i = 0
    while (i < args.length) {
      args(i) match {
        case "--scale" => scale = args(i + 1).toDouble; i += 2
        case "--only" => only = Some(args(i + 1).split(",").toSet); i += 2
        case "--output-file" => outputFile = Some(args(i + 1)); i += 2
        case p => configPath = Some(p); i += 1
      }
    }
    val path = configPath.getOrElse("benchmarks/reference-suite.json")

    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val preexisting = SparkSession.getDefaultSession.isDefined
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val benchmarks = parseConfig(path)
    // unknown --only names are reported, not silently skipped
    val unknown = only.map(_ -- benchmarks.map(_._1).toSet).getOrElse(Set.empty)
    val unknownLines = unknown.toSeq.sorted.map { n =>
      System.err.println(s"[benchrunner] unknown benchmark name: $n")
      s"""{"name":"$n","failed":true,"reason":"unknown benchmark name"}"""
    }
    unknownLines.foreach(println)
    val lines = unknownLines ++ benchmarks
      .filter { case (name, _) => only.forall(_.contains(name)) }
      .map { case (name, spec) =>
        val line =
          try runOne(spark, name, spec, scale, cpus.toInt)
          catch {
            case e: Throwable =>
              System.err.println(s"[benchrunner] $name FAILED: $e")
              s"""{"name":"$name","failed":true}"""
          }
        println(line)
        System.out.flush()
        spark.catalog.clearCache()
        line
      }
    outputFile.foreach { f =>
      val body = if (lines.isEmpty) "[]\n"
        else lines.mkString("[\n  ", ",\n  ", "\n]\n")
      java.nio.file.Files.writeString(java.nio.file.Paths.get(f), body)
    }
    if (!preexisting) spark.stop() // don't kill a caller-owned session (tests)
  }

  // ------------------------------------------------------------ execution

  /** Executes one benchmark; returns its result JSON line. */
  private def runOne(spark: SparkSession, name: String, spec: Spec, scale: Double,
      parts: Int): String = {
    val stage = instantiate(spec.stage)
    val numValues = math.max(1L, (longParam(spec.inputData, "numValues") * scale).toLong)
    val input = generate(spark, spec.inputData, numValues, parts)
    spec.modelData.foreach { md =>
      val table = generate(spark, md, 1L, parts)
      invokeVarargs(stage, "setModelData", Seq(table))
    }

    val t0 = System.nanoTime()
    val outputs: Array[DataFrame] = stage match {
      case _: graft.api.Estimator[_, _] =>
        val model = invokeVarargs(stage, "fit", Seq(input))
        invoke(model, "getModelData").asInstanceOf[Array[DataFrame]]
      case _: graft.api.AlgoOperator[_] =>
        invokeVarargs(stage, "transform", Seq(input)).asInstanceOf[Array[DataFrame]]
      case other =>
        throw new IllegalArgumentException(s"Unsupported stage class ${other.getClass}")
    }
    // reference CountingAndDiscardingSink: consume every output row,
    // count them, discard — forces full materialization of all columns
    val acc = spark.sparkContext.longAccumulator(s"numElements-$name")
    outputs.foreach(_.foreachPartition((it: Iterator[Row]) => it.foreach(_ => acc.add(1))))
    val totalTimeMs = (System.nanoTime() - t0) / 1e6

    def fmt(v: Double) = String.format(java.util.Locale.ROOT, "%.1f", Double.box(v))
    s"""{"name":"$name","totalTimeMs":${fmt(totalTimeMs)},"inputRecordNum":$numValues,"inputThroughput":${fmt(numValues * 1000.0 / totalTimeMs)},"outputRecordNum":${acc.value},"outputThroughput":${fmt(acc.value * 1000.0 / totalTimeMs)}}"""
  }

  // ------------------------------------------------------------ generators

  private def generate(spark: SparkSession, g: Node, numValues: Long, parts: Int): DataFrame = {
    val p = g.paramMap
    val seed = p.get("seed").map(toLong).getOrElse(2L)
    val colNames: Seq[String] = p.get("colNames") match {
      case Some(l: java.util.List[_]) =>
        l.get(0).asInstanceOf[java.util.List[_]].toArray.map(_.toString).toSeq
      case _ => Seq.empty
    }
    def intP(k: String, d: Int) = p.get(k).map(toLong(_).toInt).getOrElse(d)
    g.className.split('.').last match {
      case "DenseVectorGenerator" =>
        DataGenerators.denseVectors(spark, numValues, intP("vectorDim", 1), seed, parts)
          .withColumnRenamed("vec", colNames.headOption.getOrElse("vec"))
      case "DoubleGenerator" =>
        DataGenerators.doubles(spark, numValues, colNames, intP("arity", 0), seed, parts)
      case "RandomStringGenerator" =>
        DataGenerators.randomStrings(spark, numValues, intP("numDistinctValues", 100), seed, parts)
          .withColumnRenamed("str", colNames.headOption.getOrElse("str"))
      case "RandomStringArrayGenerator" =>
        DataGenerators.randomStringArrays(spark, numValues, intP("arraySize", 10),
          intP("numDistinctValues", 100), seed, parts)
          .withColumnRenamed("arr", colNames.headOption.getOrElse("arr"))
      case "LabeledPointWithWeightGenerator" =>
        val df = DataGenerators.labeledPoints(spark, numValues, intP("vectorDim", 1),
          intP("featureArity", 0), intP("labelArity", 2), seed, parts)
        if (colNames.isEmpty) df
        else df.toDF(colNames: _*)
      case "KMeansModelDataGenerator" =>
        DataGenerators.kmeansModelData(spark, intP("arraySize", 2), intP("vectorDim", 1), seed)
      case other =>
        throw new IllegalArgumentException(s"Unknown generator $other")
    }
  }

  // ------------------------------------------------------------ reflection

  private def instantiate(node: Node): AnyRef = {
    val stage = Class.forName(node.className).getDeclaredConstructor().newInstance()
      .asInstanceOf[AnyRef]
    node.paramMap.foreach { case (k, v) => applyParam(stage, k, v) }
    stage
  }

  /** paramMap key "k" -> setter setK(v), with JSON-shape → JVM-type coercion. */
  private def applyParam(target: AnyRef, key: String, value: Any): Unit = {
    val mname = "set" + key.capitalize
    val m = target.getClass.getMethods
      .find(m => m.getName == mname && m.getParameterCount == 1)
      .getOrElse(throw new IllegalArgumentException(
        s"${target.getClass.getSimpleName} has no $mname"))
    m.invoke(target, coerce(value, m.getParameterTypes()(0)).asInstanceOf[AnyRef])
  }

  private def coerce(v: Any, pt: Class[_]): Any = {
    import scala.jdk.CollectionConverters._
    def elems(l: java.util.List[_]): Seq[Any] = l.asScala.toSeq
    v match {
      case l: java.util.List[_] if pt.isArray && pt.getComponentType.isArray =>
        elems(l).map { inner =>
          elems(inner.asInstanceOf[java.util.List[_]]).map(toDouble).toArray
        }.toArray
      case l: java.util.List[_] if pt.isArray =>
        val ct = pt.getComponentType
        if (ct == classOf[String]) elems(l).map(_.toString).toArray
        else if (ct == java.lang.Double.TYPE || ct == classOf[java.lang.Double])
          elems(l).map(toDouble).toArray
        else if (ct == java.lang.Integer.TYPE || ct == classOf[java.lang.Integer])
          elems(l).map(toLong(_).toInt).toArray
        else elems(l).toArray
      case l: java.util.List[_] if classOf[scala.collection.Seq[_]].isAssignableFrom(pt) =>
        // Scala varargs setter: keep each element's JSON type (Int vs Double vs String)
        elems(l).map {
          case n: java.lang.Number if n.isInstanceOf[java.lang.Integer] ||
            n.isInstanceOf[java.lang.Long] => toLong(n).toInt
          case n: java.lang.Number => n.doubleValue()
          case s => s
        }.toList
      case m: java.util.Map[_, _] if pt == classOf[org.apache.spark.ml.linalg.Vector] =>
        // {"values": [...]} — reference VectorParam JSON encoding
        org.apache.spark.ml.linalg.Vectors.dense(
          elems(m.asInstanceOf[java.util.Map[String, Any]].get("values")
            .asInstanceOf[java.util.List[_]]).map(toDouble).toArray)
      case n: java.lang.Number =>
        if (pt == java.lang.Long.TYPE || pt == classOf[java.lang.Long]) n.longValue()
        else if (pt == java.lang.Integer.TYPE || pt == classOf[java.lang.Integer]) n.intValue()
        else if (pt == java.lang.Double.TYPE || pt == classOf[java.lang.Double]) n.doubleValue()
        else if (pt == java.lang.Float.TYPE || pt == classOf[java.lang.Float]) n.floatValue()
        else n
      case b: java.lang.Boolean => b.booleanValue()
      case s => s
    }
  }

  private def toDouble(v: Any): Double = v.asInstanceOf[java.lang.Number].doubleValue()
  private def toLong(v: Any): Long = v.asInstanceOf[java.lang.Number].longValue()

  /** Invoke a Scala varargs method `name(xs: DataFrame*)` reflectively. */
  private def invokeVarargs(target: AnyRef, name: String, dfs: Seq[DataFrame]): AnyRef = {
    val m = target.getClass.getMethods
      .find(m => m.getName == name && m.getParameterCount == 1 &&
        classOf[scala.collection.Seq[_]].isAssignableFrom(m.getParameterTypes()(0)))
      .getOrElse(throw new IllegalArgumentException(s"${target.getClass} has no varargs $name"))
    m.invoke(target, dfs.toList)
  }

  private def invoke(target: AnyRef, name: String): AnyRef =
    target.getClass.getMethod(name).invoke(target)

  // ------------------------------------------------------------ config parse

  private case class Node(className: String, paramMap: Map[String, Any])
  private case class Spec(stage: Node, inputData: Node, modelData: Option[Node])

  private def longParam(n: Node, key: String): Double =
    n.paramMap.get(key).map(toDouble).getOrElse(
      throw new IllegalArgumentException(s"generator needs $key"))

  private def parseConfig(path: String): Seq[(String, Spec)] = {
    import scala.jdk.CollectionConverters._
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    mapper.configure(com.fasterxml.jackson.core.JsonParser.Feature.ALLOW_COMMENTS, true)
    val root = mapper.readValue(new java.io.File(path), classOf[java.util.Map[String, Any]])
    def node(m: Any): Node = {
      val mm = m.asInstanceOf[java.util.Map[String, Any]]
      Node(mm.get("className").toString,
        Option(mm.get("paramMap"))
          .map(_.asInstanceOf[java.util.Map[String, Any]].asScala.toMap)
          .getOrElse(Map.empty))
    }
    root.asScala.toSeq
      .filter { case (k, _) => k != "version" }
      .sortBy(_._1)
      .map { case (name, v) =>
        val mm = v.asInstanceOf[java.util.Map[String, Any]]
        name -> Spec(node(mm.get("stage")), node(mm.get("inputData")),
          Option(mm.get("modelData")).map(node))
      }
  }
}
