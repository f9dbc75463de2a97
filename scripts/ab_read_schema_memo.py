"""Interleaved A/B of the r12 Collection._read_segments schema memo
(guide §5 — driver work): variant `merge` is the old per-call
``mergeSchema=true`` read (driver sweeps every segment footer on every
read()), variant `memo` is the r12 stat-validated schema memo. Both
variants run in ONE session, alternating passes; min per variant.

Usage: python scripts/ab_read_schema_memo.py [rounds] [row ...]
"""

from __future__ import annotations

import os
import sys
import time
from pathlib import Path

_REPO = str(Path(__file__).resolve().parent.parent)
sys.path.insert(0, _REPO)

import bench  # noqa: E402
from milvus_spark.operators import lifecycle  # noqa: E402
from milvus_spark.session import get_spark  # noqa: E402

ROWS = ["cli_scalar_serving"]

_NEW = lifecycle.Collection._read_segments


def _old(self):
    return self.spark.read.option("mergeSchema", "true").parquet(self.seg_dir)


def main() -> None:
    rounds = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    rows = sys.argv[2:] or ROWS
    sf = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    import __spark_entry__ as entrymod

    spark = get_spark(
        "ab-read-memo", shuffle_partitions=bench._sized_shuffle_partitions(sf)
    )
    qs = entrymod.queries()
    variants = {"merge": _old, "memo": _NEW}
    for name in rows:  # warm both variants (memoized builds + workers)
        for fn in variants.values():
            lifecycle.Collection._read_segments = fn
            qs[name](spark, sf).count()
    results = {n: {k: [] for k in variants} for n in rows}
    for r in range(rounds):
        for name in rows:
            for key, fn in variants.items():
                lifecycle.Collection._read_segments = fn
                spark.sparkContext.setJobDescription(f"{name} {key} r={r}")
                t0 = time.perf_counter()
                qs[name](spark, sf).count()
                results[name][key].append(round(time.perf_counter() - t0, 3))
    lifecycle.Collection._read_segments = _NEW
    print("\n=== min per (row, variant) ===")
    for name in rows:
        m = {k: min(v) for k, v in results[name].items()}
        print(
            f"{name}: merge={m['merge']:.3f}s memo={m['memo']:.3f}s "
            f"all={results[name]}"
        )


if __name__ == "__main__":
    main()
