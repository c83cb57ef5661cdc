"""py4j delegation layer for graft stages.

Mirrors the reference's Python binding architecture
(flink-ml-python/pyflink/ml/wrapper.py:24,65-104): every Python stage
is a thin wrapper holding a JVM stage object; param setters/getters
and fit/transform delegate over py4j, and JVM results are re-wrapped
into the matching Python class. The JVM classes are the single source
of truth for param names, defaults, and validation — the wrapper adds
nothing but plumbing, so Scala/Python behavior cannot drift.

Param-call convention: both the Scala names (``setInputCol``) and
snake_case (``set_input_col``) resolve to the same JVM setter.
"""

from pyspark.sql import DataFrame, SparkSession

# java class name -> python wrapper class, filled by register()
_REGISTRY = {}


def register(java_qualname):
    """Class decorator binding a wrapper to its JVM class."""
    def bind(cls):
        cls._java_qualname = java_qualname
        _REGISTRY[java_qualname] = cls
        return cls
    return bind


def _active_spark(spark=None):
    s = spark or SparkSession.getActiveSession()
    if s is None:
        raise RuntimeError(
            "No active SparkSession; build one before constructing graftml stages")
    return s


def _jvm_class(spark, qualname):
    obj = spark._jvm
    for part in qualname.split("."):
        obj = getattr(obj, part)
    return obj


def _to_scala_seq(spark, jobjs):
    """Build a scala Seq from a python list of JVM objects (Scala
    varargs compile to a Seq parameter, which py4j cannot fill from a
    Java array)."""
    return spark._jvm.org.apache.spark.api.python.PythonUtils.toSeq(jobjs)


def _snake_to_camel(name):
    parts = name.split("_")
    return parts[0] + "".join(p.title() for p in parts[1:])


class JavaStage:
    """Base wrapper: construct the JVM stage, delegate everything."""

    _java_qualname = None

    def __init__(self, spark=None, _jobj=None):
        self._spark = _active_spark(spark)
        self._jobj = _jobj if _jobj is not None else _jvm_class(
            self._spark, self._java_qualname)()

    # ------------------------------------------------------------- wrapping

    def _wrap(self, res):
        if res is None:
            return None
        # py4j JavaObject?
        if not hasattr(res, "getClass"):
            return res
        name = res.getClass().getName()
        if res.equals(self._jobj):
            return self  # fluent setter returned `this`
        if name in _REGISTRY:
            return _REGISTRY[name](spark=self._spark, _jobj=res)
        if name.startswith("org.apache.spark.sql.") and name.endswith("Dataset"):
            return DataFrame(res, self._spark)
        return res

    def _convert_arg(self, a):
        # python list/tuple → scala Seq (Scala varargs setters like
        # setInputCols(String*) compile to one Seq parameter); unwrap
        # our own wrappers, pyspark DataFrames, and ml vectors (pyflink
        # does the same conversion in its wrapper layer)
        if isinstance(a, (list, tuple)):
            return _to_scala_seq(self._spark, [self._convert_arg(x) for x in a])
        if isinstance(a, JavaStage):
            return a._jobj
        if isinstance(a, DataFrame):
            return a._jdf
        try:
            from pyspark.ml.linalg import Vector as _MlVector
            if isinstance(a, _MlVector):
                from pyspark.ml.common import _py2java
                return _py2java(self._spark, a)
        except ImportError:
            pass
        return a

    def __getattr__(self, name):
        # called only for attributes missing on the wrapper: delegate
        # to the JVM object, accepting snake_case aliases (py4j
        # resolves any name lazily, so the alias test is syntactic)
        target = _snake_to_camel(name) if "_" in name else name
        attr = getattr(self._jobj, target)

        def call(*args):
            return self._wrap(attr(*[self._convert_arg(a) for a in args]))
        return call

    # --------------------------------------------- multi-in/out signatures

    def fit(self, *dfs):
        seq = _to_scala_seq(self._spark, [df._jdf for df in dfs])
        return self._wrap(self._jobj.fit(seq))

    def transform(self, *dfs):
        seq = _to_scala_seq(self._spark, [df._jdf for df in dfs])
        jarr = self._jobj.transform(seq)
        return [DataFrame(j, self._spark) for j in jarr]

    def get_model_data(self):
        return [DataFrame(j, self._spark) for j in self._jobj.getModelData()]

    def set_model_data(self, *dfs):
        seq = _to_scala_seq(self._spark, [df._jdf for df in dfs])
        return self._wrap(self._jobj.setModelData(seq))

    def save(self, path):
        self._jobj.save(path)

    @classmethod
    def load(cls, path, spark=None):
        spark = _active_spark(spark)
        companion = _jvm_class(spark, cls._java_qualname)
        jobj = companion.load(spark._jsparkSession, path)
        return cls(spark=spark, _jobj=jobj)


class JavaPipeline(JavaStage):
    """Pipeline takes its stage list at construction."""

    def __init__(self, stages=None, spark=None, _jobj=None):
        spark = _active_spark(spark)
        if _jobj is None:
            seq = _to_scala_seq(spark, [s._jobj for s in (stages or [])])
            _jobj = _jvm_class(spark, self._java_qualname)(seq)
        super().__init__(spark=spark, _jobj=_jobj)
