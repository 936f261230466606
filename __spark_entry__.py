"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` smoke-runs the flagship Bloom-index query at sf0.001;
``queries()``/``oracle_sql()`` expose every implemented operator for the
driver's DuckDB correctness gate at sf0.01.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

_REPO = os.path.dirname(os.path.abspath(__file__))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)
# python workers on executors must also see the package (local mode
# inherits the driver env; clusters use spark-submit --py-files)
os.environ["PYTHONPATH"] = (
    _REPO + os.pathsep + os.environ.get("PYTHONPATH", "")
).rstrip(os.pathsep)

from pyspark.sql import DataFrame, SparkSession  # noqa: E402

import metaprofi_spark.queries as _q  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: Bloom bit-sliced index
    build + exact substring membership search with verify join."""
    return _q.bloom_substring_search(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return _q.queries()


def oracle_sql() -> dict[str, str]:
    return _q.oracle_sql()
