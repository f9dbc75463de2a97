"""Registry wiring SURVEY.md §2 operators to the driver contract.

Every implemented operator registers a ``queries()`` callable and (when
SQL-expressible) a DuckDB ``oracle_sql()`` string. The driver hash-compares
Spark result vs oracle at sf=0.01; column names/types are aligned on both
sides and floating aggregates are rounded to 4 decimals on both sides so the
comparison is numerically stable (fp summation order differs between engines
by ~1 ulp; ranking always tie-breaks on a key column for determinism).
"""

from __future__ import annotations

import os
from collections.abc import Callable
from typing import Optional

from pyspark.sql import DataFrame, SparkSession

QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
ORACLES: dict[str, str] = {}


def register(name: str, oracle: Optional[str] = None):
    """Register a driver-facing query; ``oracle`` is equivalent DuckDB SQL."""

    def deco(fn: Callable[[SparkSession, str], DataFrame]):
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco


def load_suites() -> None:
    """Import all suite modules (side effect: they register queries)."""
    from milvus_spark import suites  # noqa: F401

    _gc_scratch()
    suites.load_all()


def _gc_scratch(max_age_hours: float = 12.0) -> None:
    """Bound _scratch growth: suite queries mkdtemp work dirs per run;
    anything past the age cutoff is from a finished run and dead. 12h is
    chosen to outlive any single run (large-SF benches and long client
    sessions run for hours) while still reclaiming dirs across rounds.
    Concurrent sessions are safe — fresh dirs are never touched."""
    import shutil
    import time

    root = "/root/repo/_scratch"
    if not os.path.isdir(root):
        return
    cutoff = time.time() - max_age_hours * 3600
    for entry in os.listdir(root):
        path = os.path.join(root, entry)
        try:
            if os.path.getmtime(path) < cutoff:
                shutil.rmtree(path, ignore_errors=True)
        except OSError:
            continue
