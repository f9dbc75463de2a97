"""Profile the two rows BENCH_r11 read >3x their pinned baselines on
UNTOUCHED code (r11 verdict #6): cli_scalar_serving (r9 pin 0.583 s,
driver 1.877 s) and stream_exact_dedup (r5 pin 1.419 s, driver 3.158 s).

Runs each row isolated in one fresh session: warm pass, then min-of-9
timed passes, plus a decomposition of cli_scalar_serving (client.query
plan-build time vs execution). Record the minima in BASELINE.md
(min-across-windows protocol). Usage: python scripts/profile_flagged_r12.py
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

ROWS = ["cli_scalar_serving", "stream_exact_dedup"]


def main() -> None:
    sf = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    import __spark_entry__ as entrymod

    spark = get_spark(
        "profile-flagged", shuffle_partitions=bench._sized_shuffle_partitions(sf)
    )
    qs = entrymod.queries()
    for name in ROWS:
        qs[name](spark, sf).count()  # warm: memoized builds + workers
        times = []
        for _ in range(9):
            t0 = time.perf_counter()
            qs[name](spark, sf).count()
            times.append(round(time.perf_counter() - t0, 3))
        print(f"{name}: min {min(times):.3f}s  all {times}")

    # decomposition: how much of cli_scalar_serving is driver-side plan
    # build (client.query + plan asserts) vs job execution?
    from milvus_spark.suites.addons_r9b import _scalar_serving_client, _plan

    client = _scalar_serving_client(spark, sf)
    t0 = time.perf_counter()
    rng = client.query(
        "svo",
        filter="o_totalprice >= 5000 and o_totalprice <= 20000",
        output_fields=["o_orderkey", "o_totalprice"],
    ).select("o_orderkey", "o_totalprice")
    t1 = time.perf_counter()
    _ = _plan(rng)
    t2 = time.perf_counter()
    st = client.query(
        "svo",
        filter='o_orderstatus in ["F", "P"]',
        output_fields=["o_orderkey"],
    ).select("o_orderkey")
    t3 = time.perf_counter()
    _ = _plan(st)
    t4 = time.perf_counter()
    rng.join(st, "o_orderkey", "left_semi").count()
    t5 = time.perf_counter()
    print(
        f"decomposition: query1 {t1-t0:.3f}s plan1 {t2-t1:.3f}s "
        f"query2 {t3-t2:.3f}s plan2 {t4-t3:.3f}s execute {t5-t4:.3f}s"
    )


if __name__ == "__main__":
    main()
