"""graftml: Python surface for the graft Spark-native engine.

A thin pyspark/py4j delegation layer (see wrapper.py) exposing
Pipeline plus a first slice of stages with full param parity —
the JVM stage owns every param, so names/defaults/validation match
the Scala surface exactly. Mirrors the reference's
flink-ml-python/pyflink/ml package layout.
"""

from .wrapper import JavaStage, JavaPipeline, register


@register("graft.api.Pipeline")
class Pipeline(JavaPipeline):
    pass


@register("graft.api.PipelineModel")
class PipelineModel(JavaPipeline):
    pass


@register("graft.feature.Tokenizer")
class Tokenizer(JavaStage):
    pass


@register("graft.feature.StandardScaler")
class StandardScaler(JavaStage):
    pass


@register("graft.feature.StandardScalerModel")
class StandardScalerModel(JavaStage):
    pass


@register("graft.clustering.KMeans")
class KMeans(JavaStage):
    pass


@register("graft.clustering.KMeansModel")
class KMeansModel(JavaStage):
    pass


@register("graft.classification.LogisticRegression")
class LogisticRegression(JavaStage):
    pass


@register("graft.classification.LogisticRegressionModel")
class LogisticRegressionModel(JavaStage):
    pass


@register("graft.dedup.MinHashDeduplicator")
class MinHashDeduplicator(JavaStage):
    pass


@register("graft.feature.RegexTokenizer")
class RegexTokenizer(JavaStage):
    pass


@register("graft.feature.NGram")
class NGram(JavaStage):
    pass


@register("graft.feature.StopWordsRemover")
class StopWordsRemover(JavaStage):
    pass


@register("graft.feature.CountVectorizer")
class CountVectorizer(JavaStage):
    pass


@register("graft.feature.CountVectorizerModel")
class CountVectorizerModel(JavaStage):
    pass


@register("graft.feature.StringIndexer")
class StringIndexer(JavaStage):
    pass


@register("graft.feature.StringIndexerModel")
class StringIndexerModel(JavaStage):
    pass


@register("graft.feature.VectorAssembler")
class VectorAssembler(JavaStage):
    pass


@register("graft.feature.MinMaxScaler")
class MinMaxScaler(JavaStage):
    pass


@register("graft.feature.MinMaxScalerModel")
class MinMaxScalerModel(JavaStage):
    pass


@register("graft.feature.Bucketizer")
class Bucketizer(JavaStage):
    pass


@register("graft.feature.OneHotEncoder")
class OneHotEncoder(JavaStage):
    pass


@register("graft.feature.OneHotEncoderModel")
class OneHotEncoderModel(JavaStage):
    pass


@register("graft.classification.NaiveBayes")
class NaiveBayes(JavaStage):
    pass


@register("graft.classification.NaiveBayesModel")
class NaiveBayesModel(JavaStage):
    pass


@register("graft.regression.LinearRegression")
class LinearRegression(JavaStage):
    pass


@register("graft.regression.LinearRegressionModel")
class LinearRegressionModel(JavaStage):
    pass


@register("graft.text.ExactDeduplicator")
class ExactDeduplicator(JavaStage):
    pass


@register("graft.text.TextQualityScorer")
class TextQualityScorer(JavaStage):
    pass


@register("graft.dedup.CosineDeduplicator")
class CosineDeduplicator(JavaStage):
    pass


__all__ = [
    "Pipeline", "PipelineModel", "Tokenizer", "StandardScaler",
    "StandardScalerModel", "KMeans", "KMeansModel", "LogisticRegression",
    "LogisticRegressionModel", "MinHashDeduplicator",
    "RegexTokenizer", "NGram", "StopWordsRemover",
    "CountVectorizer", "CountVectorizerModel",
    "StringIndexer", "StringIndexerModel", "VectorAssembler",
    "MinMaxScaler", "MinMaxScalerModel", "Bucketizer",
    "OneHotEncoder", "OneHotEncoderModel",
    "NaiveBayes", "NaiveBayesModel",
    "LinearRegression", "LinearRegressionModel",
    "ExactDeduplicator", "TextQualityScorer", "CosineDeduplicator",
]
