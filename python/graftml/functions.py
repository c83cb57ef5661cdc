"""SQL-callable conversion/similarity functions (mirrors
flink-ml-python/pyflink/ml/functions.py).

vector_to_array / array_to_vector re-export pyspark's codegen'd
implementations; cosine_similarity is graft's native Catalyst
expression and needs register() (or the GraftExtensions session
extension) on the session first.
"""

from pyspark.ml.functions import vector_to_array, array_to_vector  # noqa: F401
from pyspark.sql import SparkSession
from pyspark.sql.functions import call_function


def register(spark: SparkSession) -> None:
    """Register graft's SQL function names on the session (idempotent)."""
    spark._jvm.graft.functions.Functions.register(spark._jsparkSession)


def cosine_similarity(a, b):
    """Cosine similarity of two array<double> columns (whole-stage
    codegen); call register(spark) once per session before use."""
    return call_function("cosineSimilarity", a, b)
