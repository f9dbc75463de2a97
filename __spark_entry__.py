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
    """Registered queries, ordered so that entries the driver has never
    sampled (no row in any CORRECTNESS_r*.json yet) come first — each
    round's ~50-query sample then covers new ground instead of re-checking
    the same green rows. Within each group, registration order is kept."""
    import json

    qs = dict(registry.QUERIES)
    sampled: set[str] = set()
    for p in sorted(Path(_REPO).glob("CORRECTNESS_r*.json")):
        try:
            with open(p) as f:
                rows = json.load(f)
            if isinstance(rows, dict):
                sampled.update(rows.keys())
        except (OSError, ValueError):
            pass
    ordered = {k: v for k, v in qs.items() if k not in sampled}
    ordered.update({k: v for k, v in qs.items() if k in sampled})
    return ordered


def oracle_sql() -> dict[str, str]:
    return dict(registry.ORACLES)
