package graft

import graft.api.{Estimator, Model, Transformer}
import graft.param.{ParamCodec, WithParams}

/**
 * Generates one markdown reference page per public stage into
 * `docs/operators/`, from the live Params metadata (name, type,
 * default, description) — the docs can never drift from the code
 * because they ARE the code's own param registry, re-rendered.
 * Mirrors the reference's docs site layout (one markdown page per
 * stage with a params table and an example, as under the
 * reference's docs/content/docs/operators directory).
 *
 * Run: `sbt "runMain graft.DocGen"` (writes docs/, idempotent).
 */
object DocGen {

  /** Public stage surface (estimator/transformer entry points; each
    * estimator's page also documents its model class). Mirrors
    * python/graftml/__init__.py's registry. */
  private val stages: Seq[String] = Seq(
    "graft.feature.Binarizer", "graft.feature.Bucketizer", "graft.feature.DCT",
    "graft.feature.ElementwiseProduct", "graft.feature.FeatureHasher",
    "graft.feature.HashingTF", "graft.feature.Interaction", "graft.feature.NGram",
    "graft.feature.Normalizer", "graft.feature.PolynomialExpansion",
    "graft.feature.RandomSplitter", "graft.feature.RegexTokenizer",
    "graft.feature.SQLTransformer", "graft.feature.StopWordsRemover",
    "graft.feature.Tokenizer", "graft.feature.VectorAssembler",
    "graft.feature.VectorSlicer", "graft.feature.IndexToStringModel",
    "graft.feature.CountVectorizer", "graft.feature.IDF", "graft.feature.Imputer",
    "graft.feature.KBinsDiscretizer", "graft.feature.MaxAbsScaler",
    "graft.feature.MinHashLSH", "graft.feature.MinMaxScaler", "graft.feature.PCA",
    "graft.feature.OneHotEncoder", "graft.feature.RobustScaler",
    "graft.feature.StandardScaler", "graft.feature.StringIndexer",
    "graft.feature.UnivariateFeatureSelector",
    "graft.feature.VarianceThresholdSelector", "graft.feature.VectorIndexer",
    "graft.feature.DeterministicShuffler", "graft.feature.GroupedSplitter",
    "graft.feature.StratifiedSampler", "graft.feature.WeightedMixer",
    "graft.feature.WeightedSampler",
    "graft.feature.EpochMixer",
    "graft.feature.FrequencyEncoder", "graft.feature.TargetEncoder",
    "graft.feature.LagFeaturizer", "graft.feature.Resampler",
    "graft.classification.Knn", "graft.classification.LinearSVC",
    "graft.classification.LogisticRegression", "graft.classification.NaiveBayes",
    "graft.regression.LinearRegression",
    "graft.regression.IsotonicCalibrator",
    "graft.clustering.AgglomerativeClustering", "graft.clustering.KMeans",
    "graft.stats.ChiSqTest", "graft.stats.ANOVATest", "graft.stats.FValueTest",
    "graft.stats.DriftDetector", "graft.stats.DataValidator",
    "graft.stats.ColumnProfiler", "graft.stats.CorrelationMatrix",
    "graft.stats.SkewReport",
    "graft.evaluation.BinaryClassificationEvaluator",
    "graft.evaluation.MulticlassEvaluator",
    "graft.evaluation.ClusteringEvaluator",
    "graft.evaluation.CalibrationEvaluator",
    "graft.evaluation.RegressionEvaluator",
    "graft.recommendation.Swing",
    "graft.streaming.OnlineKMeans", "graft.streaming.OnlineLogisticRegression",
    "graft.streaming.OnlinePCA",
    "graft.streaming.OnlineStandardScaler", "graft.streaming.Sessionizer",
    "graft.streaming.StreamingAnomalyDetector",
    "graft.streaming.StreamingDeduplicator",
    "graft.dedup.BloomDecontaminator",
    "graft.dedup.CosineDeduplicator", "graft.dedup.CosineIndexer",
    "graft.dedup.Decontaminator",
    "graft.dedup.EntityResolver", "graft.dedup.HammingIndexer",
    "graft.dedup.MinHashDeduplicator", "graft.dedup.MinHashIndexer",
    "graft.dedup.NgramJaccardJoin",
    "graft.dedup.SimHasher", "graft.dedup.SpanDeduplicator",
    "graft.text.Bm25Scorer", "graft.text.BpeTrainer", "graft.text.C4Filter",
    "graft.text.ChunkSplitter",
    "graft.text.CorpusOverlap", "graft.text.CollocationScorer",
    "graft.text.KeywordExtractor",
    "graft.text.DocumentFingerprinter", "graft.text.ExactDeduplicator",
    "graft.text.LanguageDetector", "graft.text.LineDeduplicator",
    "graft.text.FrequentNgrams", "graft.text.GopherFilter",
    "graft.text.ImportanceScorer",
    "graft.text.HtmlExtractor", "graft.text.IntraDocDeduplicator",
    "graft.text.NgramLm", "graft.text.PiiRedactor", "graft.text.RepetitionStats",
    "graft.text.SequencePacker", "graft.text.TextNormalizer",
    "graft.text.UrlParser",
    "graft.text.TextQualityScorer",
    "graft.text.TokenCounter",
    "graft.ann.BruteForceCosineKnn", "graft.ann.CosineLshKnn",
    "graft.ann.IvfCosineKnn", "graft.ann.IvfIndexer", "graft.ann.ProductQuantizer",
    "graft.ann.ScalarQuantizer",
    "graft.multimodal.AudioDecoder", "graft.multimodal.AudioDHasher",
    "graft.multimodal.BinaryDecodeStub",
    "graft.multimodal.FrameSampler",
    "graft.multimodal.ImageDecoder", "graft.multimodal.ImageDHasher",
    "graft.multimodal.VideoDecoder", "graft.multimodal.VideoDHasher",
    "graft.join.AsOfJoiner", "graft.join.IntervalJoiner", "graft.join.RangeJoiner",
    "graft.join.FuzzyJoiner", "graft.join.Scd2Builder")

  private def instantiate(fqcn: String): WithParams[_] =
    Class.forName(fqcn).getDeclaredConstructor().newInstance().asInstanceOf[WithParams[_]]

  private def kindOf(s: Any): String = s match {
    case _: Estimator[_, _] => "Estimator"
    case _: Model[_]        => "Model"
    case _: Transformer[_]  => "Transformer"
    case _                  => "AlgoOperator"
  }

  /** Default rendered through the param's own JSON codec so the page
    * shows exactly what persistence writes. */
  private def defaultOf(p: graft.param.Param[_]): String = p.defaultValue match {
    case None => "_(required)_"
    case Some(v) =>
      val s = ParamCodec.toJsonString(p.asInstanceOf[graft.param.Param[Any]].jsonEncode(v))
      val shown = if (s.length > 40) s.take(37) + "..." else s
      s"`$shown`"
  }

  private def esc(s: String): String = s.replace("|", "\\|").replace("\n", " ")

  private def modelClassOf(fqcn: String): Option[String] = {
    val m = fqcn + "Model"
    try { Class.forName(m); Some(m) } catch { case _: Throwable => None }
  }

  private def page(fqcn: String): String = {
    val stage = instantiate(fqcn)
    val name = fqcn.substring(fqcn.lastIndexOf('.') + 1)
    val kind = kindOf(stage)
    val sb = new StringBuilder
    sb ++= s"# $name\n\n"
    sb ++= s"`$fqcn` — $kind\n\n"
    sb ++= s"${firstSentenceOfScaladoc(stage)}\n\n"
    sb ++= "## Parameters\n\n"
    sb ++= "| name | default | description |\n|---|---|---|\n"
    stage.params.foreach { p =>
      sb ++= s"| `${p.name}` | ${defaultOf(p)} | ${esc(p.description)} |\n"
    }
    modelClassOf(fqcn).foreach { mc =>
      val model = instantiate(mc)
      val extra = model.params.filterNot(mp => stage.params.exists(_.name == mp.name))
      if (extra.nonEmpty) {
        sb ++= s"\n## Model parameters (`$mc`)\n\n"
        sb ++= "| name | default | description |\n|---|---|---|\n"
        extra.foreach { p =>
          sb ++= s"| `${p.name}` | ${defaultOf(p)} | ${esc(p.description)} |\n"
        }
      }
    }
    sb ++= "\n## Example\n\n"
    sb ++= example(fqcn, name, kind)
    sb.toString
  }

  /** Params are self-describing; the page summary comes from the
    * stage's own io-col params when present. */
  private def firstSentenceOfScaladoc(stage: WithParams[_]): String = {
    val io = Seq("inputCol", "inputCols", "featuresCol", "leftTimeCol")
      .flatMap(n => stage.getParam(n)).headOption
    io.map(p => s"Primary input: `${p.name}`.").getOrElse("")
  }

  private def example(fqcn: String, name: String, kind: String): String = {
    val fitLine = kind match {
      case "Estimator" =>
        s"""val model = stage.fit(df)            // returns ${name}Model
           |val out = model.transform(df).head""".stripMargin
      case _ =>
        "val out = stage.transform(df).head"
    }
    s"""```scala
       |import $fqcn
       |
       |val df = spark.read.parquet("...")   // see examples/ for a runnable end-to-end main
       |val stage = new $name()              // .set… fluent params, defaults above
       |$fitLine
       |```
       |
       |A runnable example main for every stage lives under
       |`src/main/scala/graft/examples/` (sbt `runMain`).
       |""".stripMargin
  }

  def main(args: Array[String]): Unit = {
    val outDir = java.nio.file.Paths.get(args.headOption.getOrElse("docs/operators"))
    java.nio.file.Files.createDirectories(outDir)
    val index = new StringBuilder
    index ++= "# Operator reference\n\nGenerated by `sbt \"runMain graft.DocGen\"` " +
      "from the live Params metadata — do not edit by hand.\n\n"
    var prevPkg = ""
    stages.sorted.foreach { fqcn =>
      val name = fqcn.substring(fqcn.lastIndexOf('.') + 1)
      val pkg = fqcn.substring(0, fqcn.lastIndexOf('.'))
      java.nio.file.Files.writeString(outDir.resolve(s"$name.md"), page(fqcn))
      if (pkg != prevPkg) { index ++= s"\n## $pkg\n\n"; prevPkg = pkg }
      index ++= s"- [$name]($name.md)\n"
    }
    java.nio.file.Files.writeString(outDir.resolve("README.md"), index.toString)
    println(s"wrote ${stages.size} pages to $outDir")
  }
}
