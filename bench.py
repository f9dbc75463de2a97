"""Headline benchmark: runs the flagship queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) and prints ONE JSON line:
{"metric": ..., "value": total_sec, "unit": "sec", "queries": {...}, "sf": ...}
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

_REPO = str(Path(__file__).resolve().parent)
sys.path.insert(0, _REPO)

# Queries that exercise each subsystem at bench scale.
BENCH_QUERIES = [
    "rel_agg_group",
    "rel_filter_range_in",
    "rel_requery_join",
    "rel_json_path",
    "vec_knn_cosine_filtered",
    "vec_grouping_search",
    "vec_hybrid_rrf",
]


def main() -> None:
    sf = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    import __spark_entry__ as entrymod
    from milvus_spark.session import get_spark

    spark = get_spark("bench")
    qs = entrymod.queries()
    names = [n for n in BENCH_QUERIES if n in qs]
    # extend with any registered bench-tagged queries not in the core list
    timings: dict[str, float] = {}
    total = 0.0
    for name in names:
        t0 = time.time()
        df = qs[name](spark, sf)
        n = df.count()  # force full execution
        dt = time.time() - t0
        timings[name] = round(dt, 3)
        total += dt
        print(f"# {name}: {n} rows in {dt:.2f}s", file=sys.stderr)
    print(
        json.dumps(
            {
                "metric": "milvus_spark headline queries wall-clock",
                "value": round(total, 3),
                "unit": "sec",
                "queries": timings,
                "sf": sf,
            }
        )
    )


if __name__ == "__main__":
    main()
