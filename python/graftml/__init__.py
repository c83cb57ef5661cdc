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


__all__ = [
    "Pipeline", "PipelineModel", "Tokenizer", "StandardScaler",
    "StandardScalerModel", "KMeans", "KMeansModel", "LogisticRegression",
    "LogisticRegressionModel", "MinHashDeduplicator",
]
