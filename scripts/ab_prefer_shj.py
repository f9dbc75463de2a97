"""Interleaved A/B of spark.sql.join.preferSortMergeJoin (guide §3.1) on
the join-heavy bench rows — the config-tier change r11 deferred as
unmeasurable on its degraded host. Runtime-settable conf, so variants
alternate passes inside ONE session; min per variant.

RESULT (r12): REJECTED, and the experiment exposed a measurement trap.
The first run read shj 1.24-1.49x faster on ALL six rows — but capturing
every bench plan under both settings showed the flag flips NO join
anywhere (self-joins fail the planner's muchSmaller guard; every other
join already broadcasts), and re-running with the variant order REVERSED
inverted the "win" (smj then "won" by the same margins, e.g.
geo_grid_join_dwithin 0.569 s second-position vs 0.827 s first-position).
Back-to-back paired alternation gives the SECOND pass of each pair a
systematic ~1.2-1.45x advantage at sub-second row cost. PROTOCOL: a
paired A/B on this host must be run in BOTH orders (or with randomized
order) before a sub-1.5x margin is believed; a plan diff must confirm
the knob changes anything at all.

Usage: python scripts/ab_prefer_shj.py [rounds] [row ...]
"""

from __future__ import annotations

import os
import sys
import time
from pathlib import Path

_REPO = str(Path(__file__).resolve().parent.parent)
sys.path.insert(0, _REPO)

import bench  # noqa: E402
from milvus_spark.session import get_spark  # noqa: E402

ROWS = [
    "dedup_semantic",
    "geo_grid_join_dwithin",
    "win_range_join_nearby",
    "rel_requery_join",
    "dedup_ngram_jaccard",
    "dedup_minhash_lsh",
]


def main() -> None:
    rounds = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    rows = sys.argv[2:] or ROWS
    sf = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    import __spark_entry__ as entrymod

    spark = get_spark(
        "ab-shj", shuffle_partitions=bench._sized_shuffle_partitions(sf)
    )
    qs = entrymod.queries()
    variants = {"smj": "true", "shj": "false"}
    for name in rows:  # warm both variants
        for v in variants.values():
            spark.conf.set("spark.sql.join.preferSortMergeJoin", v)
            qs[name](spark, sf).count()
    results = {n: {k: [] for k in variants} for n in rows}
    for r in range(rounds):
        for name in rows:
            for key, v in variants.items():
                spark.conf.set("spark.sql.join.preferSortMergeJoin", v)
                spark.sparkContext.setJobDescription(f"{name} {key} r={r}")
                t0 = time.perf_counter()
                qs[name](spark, sf).count()
                results[name][key].append(time.perf_counter() - t0)
    spark.conf.set("spark.sql.join.preferSortMergeJoin", "true")
    print("\n=== min per (row, variant) ===")
    for name in rows:
        m = {k: min(v) for k, v in results[name].items()}
        print(
            f"{name}: smj={m['smj']:.3f}s shj={m['shj']:.3f}s "
            f"({'shj wins' if m['shj'] < m['smj'] else 'smj wins'} "
            f"{max(m.values())/max(1e-9,min(m.values())):.2f}x)"
        )


if __name__ == "__main__":
    main()
