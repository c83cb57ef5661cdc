"""graftml: Python surface for the graft Spark-native engine.

A thin pyspark/py4j delegation layer (see wrapper.py) exposing
Pipeline plus EVERY public stage with full param parity — the JVM
stage owns every param name, default, and validator, so the two
surfaces cannot drift, and a wrapper class is three lines of
registration. Mirrors the reference's flink-ml-python/pyflink/ml
package layout (wrapper.py:24,65-104 delegation pattern).

Usage::

    from graftml import Pipeline, Tokenizer, StandardScaler, KMeans
    model = Pipeline([...stages...]).fit(df)   # DataFrames in/out
    out = model.transform(df)[0]

Scala camelCase setters and snake_case aliases both work:
``stage.setInputCol("x")`` == ``stage.set_input_col("x")``. Varargs
setters take python lists (``setInputCols(["a", "b"])``).
"""

from .wrapper import JavaStage, JavaPipeline, register

# Every public stage in the Scala surface, grouped as in the package
# map. The registry sweep test constructs each one against its JVM
# class, so a typo here fails CI, not a user.
_STAGES = [
    # api
    # (Pipeline/PipelineModel are defined below: list-constructed)
    # feature: transformers
    "graft.feature.Binarizer",
    "graft.feature.Bucketizer",
    "graft.feature.DCT",
    "graft.feature.ElementwiseProduct",
    "graft.feature.FeatureHasher",
    "graft.feature.HashingTF",
    "graft.feature.Interaction",
    "graft.feature.NGram",
    "graft.feature.Normalizer",
    "graft.feature.PolynomialExpansion",
    "graft.feature.RandomSplitter",
    "graft.feature.RegexTokenizer",
    "graft.feature.SQLTransformer",
    "graft.feature.StopWordsRemover",
    "graft.feature.Tokenizer",
    "graft.feature.VectorAssembler",
    "graft.feature.VectorSlicer",
    "graft.feature.IndexToStringModel",
    # feature: estimators + models
    "graft.feature.CountVectorizer", "graft.feature.CountVectorizerModel",
    "graft.feature.IDF", "graft.feature.IDFModel",
    "graft.feature.Imputer", "graft.feature.ImputerModel",
    "graft.feature.KBinsDiscretizer", "graft.feature.KBinsDiscretizerModel",
    "graft.feature.MaxAbsScaler", "graft.feature.MaxAbsScalerModel",
    "graft.feature.MinHashLSH", "graft.feature.MinHashLSHModel",
    "graft.feature.MinMaxScaler", "graft.feature.MinMaxScalerModel",
    "graft.feature.OneHotEncoder", "graft.feature.OneHotEncoderModel",
    "graft.feature.PCA", "graft.feature.PCAModel",
    "graft.feature.RobustScaler", "graft.feature.RobustScalerModel",
    "graft.feature.StandardScaler", "graft.feature.StandardScalerModel",
    "graft.feature.StringIndexer", "graft.feature.StringIndexerModel",
    "graft.feature.UnivariateFeatureSelector",
    "graft.feature.UnivariateFeatureSelectorModel",
    "graft.feature.VarianceThresholdSelector",
    "graft.feature.VarianceThresholdSelectorModel",
    "graft.feature.VectorIndexer", "graft.feature.VectorIndexerModel",
    # feature: data-pipeline operators
    "graft.feature.DeterministicShuffler",
    "graft.feature.GroupedSplitter",
    "graft.feature.StratifiedSampler",
    "graft.feature.WeightedMixer",
    "graft.feature.WeightedSampler",
    "graft.feature.EpochMixer",
    "graft.feature.FrequencyEncoder", "graft.feature.FrequencyEncoderModel",
    "graft.feature.TargetEncoder", "graft.feature.TargetEncoderModel",
    "graft.feature.LagFeaturizer",
    "graft.feature.Resampler",
    # classification / regression / clustering
    "graft.classification.Knn", "graft.classification.KnnModel",
    "graft.classification.LinearSVC", "graft.classification.LinearSVCModel",
    "graft.classification.LogisticRegression",
    "graft.classification.LogisticRegressionModel",
    "graft.classification.NaiveBayes", "graft.classification.NaiveBayesModel",
    "graft.regression.LinearRegression", "graft.regression.LinearRegressionModel",
    "graft.regression.IsotonicCalibrator", "graft.regression.IsotonicCalibratorModel",
    "graft.clustering.AgglomerativeClustering",
    "graft.clustering.KMeans", "graft.clustering.KMeansModel",
    # stats / evaluation / recommendation
    "graft.stats.ChiSqTest", "graft.stats.ANOVATest", "graft.stats.FValueTest",
    "graft.stats.DriftDetector", "graft.stats.DataValidator",
    "graft.stats.ColumnProfiler",
    "graft.evaluation.BinaryClassificationEvaluator",
    "graft.evaluation.MulticlassEvaluator",
    "graft.evaluation.RegressionEvaluator",
    "graft.evaluation.ClusteringEvaluator",
    "graft.evaluation.CalibrationEvaluator",
    "graft.stats.CorrelationMatrix",
    "graft.stats.SkewReport",
    "graft.recommendation.Swing",
    # streaming
    "graft.streaming.OnlineKMeans", "graft.streaming.OnlineKMeansModel",
    "graft.streaming.OnlineLogisticRegression",
    "graft.streaming.OnlineLogisticRegressionModel",
    "graft.streaming.OnlinePCA", "graft.streaming.OnlinePCAModel",
    "graft.streaming.OnlineStandardScaler",
    "graft.streaming.OnlineStandardScalerModel",
    "graft.streaming.Sessionizer",
    "graft.streaming.StreamingAnomalyDetector",
    "graft.streaming.StreamingDeduplicator",
    # dedup / text / ann / multimodal / join
    "graft.dedup.BloomDecontaminator",
    "graft.dedup.CosineDeduplicator",
    "graft.dedup.CosineIndexer", "graft.dedup.CosineIndexModel",
    "graft.dedup.Decontaminator",
    "graft.dedup.EntityResolver",
    "graft.dedup.HammingIndexer", "graft.dedup.HammingIndexModel",
    "graft.dedup.MinHashDeduplicator",
    "graft.dedup.MinHashIndexer", "graft.dedup.MinHashIndexModel",
    "graft.dedup.NgramJaccardJoin",
    "graft.dedup.SimHasher",
    "graft.dedup.SpanDeduplicator",
    "graft.text.AnchorTextRollup",
    "graft.text.Bm25Scorer",
    "graft.text.C4Filter",
    "graft.text.FrequentNgrams",
    "graft.text.GopherFilter",
    "graft.text.ImportanceScorer",
    "graft.text.BpeTrainer", "graft.text.BpeModel",
    "graft.text.ChunkSplitter",
    "graft.text.CorpusOverlap",
    "graft.text.CollocationScorer",
    "graft.text.KeywordExtractor",
    "graft.text.DocumentFingerprinter",
    "graft.text.ExactDeduplicator",
    "graft.text.HtmlExtractor",
    "graft.text.IntraDocDeduplicator",
    "graft.text.LanguageDetector",
    "graft.text.FrontierBuilder", "graft.text.FrontierModel",
    "graft.text.LinkGraphExtractor",
    "graft.text.MainContentExtractor",
    "graft.text.UrlCanonicalizer",
    "graft.text.LineDeduplicator",
    "graft.text.NgramLm", "graft.text.NgramLmModel",
    "graft.text.PiiRedactor",
    "graft.text.RepetitionStats",
    "graft.text.RobotsTxtParser", "graft.text.RobotsUrlFilter",
    "graft.text.RobotsDirectives",
    "graft.text.CrawlScheduler",
    "graft.text.SequencePacker",
    "graft.text.SitemapExtractor",
    "graft.text.UrlParser",
    "graft.text.WarcParser",
    "graft.text.TextNormalizer",
    "graft.text.TextQualityScorer",
    "graft.text.TokenCounter",
    "graft.ann.BruteForceCosineKnn",
    "graft.ann.CosineLshKnn",
    "graft.ann.IvfCosineKnn",
    "graft.ann.IvfIndexer", "graft.ann.IvfIndexModel",
    "graft.ann.ProductQuantizer", "graft.ann.ProductQuantizerModel",
    "graft.ann.ScalarQuantizer", "graft.ann.ScalarQuantizerModel",
    "graft.multimodal.AudioDecoder",
    "graft.multimodal.AudioDHasher",
    "graft.multimodal.BinaryDecodeStub",
    "graft.multimodal.FrameSampler",
    "graft.multimodal.ImageDecoder",
    "graft.multimodal.ImageDHasher",
    "graft.multimodal.VideoDecoder",
    "graft.multimodal.VideoDHasher",
    "graft.multimodal.VideoShotHasher",
    "graft.join.AsOfJoiner",
    "graft.join.IntervalJoiner",
    "graft.join.RangeJoiner",
    "graft.join.FuzzyJoiner",
    "graft.join.Scd2Builder",
]


@register("graft.api.Pipeline")
class Pipeline(JavaPipeline):
    pass


@register("graft.api.PipelineModel")
class PipelineModel(JavaPipeline):
    pass


def _define(qualname):
    name = qualname.rsplit(".", 1)[1]
    cls = register(qualname)(type(name, (JavaStage,), {"__module__": __name__}))
    globals()[name] = cls
    return name


__all__ = ["Pipeline", "PipelineModel"] + [_define(q) for q in _STAGES]
