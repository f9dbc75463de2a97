"""Driver contract for the spark-graft builder (PySpark target).

``queries()``/``oracle_sql()`` are populated from the milvus_spark registry —
one entry per implemented operator from SURVEY.md §2 (plus the LLM-pipeline
operator suites). ``entry(spark)`` runs the flagship query: filtered ANN
top-k vector search (the core Milvus capability) on sf0.001.
"""

from __future__ import annotations

import sys
from collections.abc import Callable
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

_REPO = str(Path(__file__).resolve().parent)
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

from milvus_spark import registry  # noqa: E402

registry.load_suites()


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: scalar-filtered brute-force ANN top-k on sf0.001."""
    fn = registry.QUERIES["vec_knn_cosine_filtered"]
    return fn(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """Registered queries in deterministic registration order."""
    return dict(registry.QUERIES)


def oracle_sql() -> dict[str, str]:
    return dict(registry.ORACLES)
