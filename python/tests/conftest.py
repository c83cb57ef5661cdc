import os
import sys

import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

REPO_CLASSES = os.path.join(
    os.path.dirname(__file__), "..", "..", "target", "scala-2.13", "classes")


@pytest.fixture(scope="session")
def spark():
    from pyspark.sql import SparkSession
    s = (SparkSession.builder
         .master("local[4]")
         .appName("graftml-tests")
         .config("spark.driver.extraClassPath", os.path.abspath(REPO_CLASSES))
         .config("spark.sql.shuffle.partitions", "4")
         .config("spark.ui.enabled", "false")
         .getOrCreate())
    yield s
    s.stop()
