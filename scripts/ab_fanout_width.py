"""Interleaved A/B/C of fan_out_ids width {1, 8, 32} on the mm_* codec rows.

One Spark session; variants alternate passes (round-robin) so host-window
drift cancels; min per variant is the reported number (the repo's r11
measurement protocol). Width is injected by monkeypatching
multimodal.fan_out_ids before the query builds its plan.

Usage: python scripts/ab_fanout_width.py [rounds] [row ...]
"""

from __future__ import annotations

import os
import sys
import time
from pathlib import Path

_REPO = str(Path(__file__).resolve().parent.parent)
sys.path.insert(0, _REPO)

import bench  # noqa: E402
from milvus_spark.operators import multimodal  # noqa: E402
from milvus_spark.session import get_spark  # noqa: E402

WIDTHS = (1, 8, 32)
ROWS = ["mm_png_real_decode", "mm_jpeg_real_decode", "mm_avi_frame_sample"]


def _steal_frac() -> float:
    with open("/proc/stat") as f:
        parts = f.readline().split()
    vals = list(map(int, parts[1:9]))
    return vals[7] / max(1, sum(vals))


def main() -> None:
    rounds = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    rows = sys.argv[2:] or ROWS
    sf = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    import __spark_entry__ as entrymod

    spark = get_spark(
        "ab-fanout", shuffle_partitions=bench._sized_shuffle_partitions(sf)
    )
    qs = entrymod.queries()
    orig = multimodal.fan_out_ids
    # the suites bind the name at import (`from ... import fan_out_ids`),
    # so the patch must land on each suite module, not just multimodal
    from milvus_spark.suites import (  # noqa: E402
        addons_r7, addons_r8, addons_r9, addons_r9b, addons_r11,
    )

    mods = [multimodal, addons_r7, addons_r8, addons_r9, addons_r9b, addons_r11]

    def set_width(w):
        def f(df, rows_per_task=256):
            if w <= 1:
                return df
            return df.repartition(w)

        for m in mods:
            m.fan_out_ids = f

    # warm every (row, width) once
    for name in rows:
        for w in WIDTHS:
            set_width(w)
            qs[name](spark, sf).count()
    results: dict[str, dict[int, list[float]]] = {
        n: {w: [] for w in WIDTHS} for n in rows
    }
    for r in range(rounds):
        for name in rows:
            for w in WIDTHS:
                set_width(w)
                spark.sparkContext.setJobDescription(f"{name} w={w} r={r}")
                s0 = _steal_frac()
                t0 = time.perf_counter()
                qs[name](spark, sf).count()
                dt = time.perf_counter() - t0
                results[name][w].append(dt)
                print(
                    f"round {r} {name} w={w}: {dt:.3f}s (steal~{_steal_frac()-s0:.4f})",
                    file=sys.stderr,
                )
    for m in mods:
        m.fan_out_ids = orig
    print("\n=== min per (row, width) ===")
    for name in rows:
        mins = {w: min(v) for w, v in results[name].items()}
        best = min(mins, key=mins.get)
        print(
            f"{name}: "
            + "  ".join(f"w{w}={mins[w]:.3f}s" for w in WIDTHS)
            + f"  -> best width {best}"
        )


if __name__ == "__main__":
    main()
