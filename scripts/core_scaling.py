"""Core-scaling demonstration (r12, the r11 verdict's ask #8): at sf0.1
the driver's 8-vs-32-core bench cannot separate — 33/38 rows are
fixed-overhead-bound (sub-second kernels, microsecond numpy work). This
script times selected rows on a FACTOR-x replicated corpus (the
scale_smoke builder: shifted pks, dims fixed) at 8 AND 32 cores, one
FRESH PROCESS per core count so master=local[N] is honest, and prints one
JSON line: {"factor": N, "rows": {name: {"sec_8": s, "sec_32": s,
"ratio_8_over_32": r}}}.

Split-size note: the replicated parquet is still only tens of MB, so the
default 128 MB maxPartitionBytes would cap SCAN parallelism at 1-2 tasks
regardless of cores — the split count, not the core count, would be the
variable under test. The child sessions therefore pin
spark.sql.files.maxPartitionBytes=512k, which is exactly the regime a
100 TB corpus is in naturally (splits >> cores). The id-fan-out rows
(mm_*) do not depend on this: their width comes from fan_out_ids.

Usage: python scripts/core_scaling.py [factor] [row ...]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time
from pathlib import Path

_REPO = str(Path(__file__).resolve().parent.parent)
sys.path.insert(0, _REPO)

DEFAULT_ROWS = [
    # fan-out codec rows (fan_out_ids width scales with est_rows)
    "mm_jpeg_real_decode",
    "mm_png_real_decode",
    "mm_avi_frame_sample",
    # brute-force kernel rows (mapInPandas BLAS kernel per scan split)
    "vec_knn_cosine_filtered",
    "vec_maxsim_ip",
    "vec_binary_hamming",
]


def _child(cpus: int, scaled_dir: str, rows: list[str]) -> dict:
    out = subprocess.run(
        [sys.executable, __file__, "--child", str(cpus), scaled_dir, *rows],
        env={**os.environ, "SPARK_GRAFT_CPUS": str(cpus)},
        capture_output=True,
        text=True,
        check=True,
    )
    return json.loads(out.stdout.strip().splitlines()[-1])


def child_main(cpus: int, scaled_dir: str, rows: list[str]) -> None:
    from milvus_spark.session import get_spark
    import bench
    import __spark_entry__ as entrymod

    spark = get_spark(
        f"core-scaling-{cpus}",
        shuffle_partitions=bench._sized_shuffle_partitions(scaled_dir),
    )
    # runtime-settable; see the split-size note in the module docstring
    spark.conf.set("spark.sql.files.maxPartitionBytes", str(512 << 10))
    qs = entrymod.queries()
    report = {}
    for name in rows:
        qs[name](spark, scaled_dir).count()  # warm: fixtures + workers
        best = None
        for _ in range(3):
            t0 = time.perf_counter()
            qs[name](spark, scaled_dir).count()
            dt = time.perf_counter() - t0
            best = dt if best is None else min(best, dt)
        report[name] = round(best, 3)
        print(f"# cpus={cpus} {name}: {best:.2f}s", file=sys.stderr)
    print(json.dumps(report))


def main() -> None:
    if len(sys.argv) > 1 and sys.argv[1] == "--child":
        child_main(int(sys.argv[2]), sys.argv[3], sys.argv[4:])
        return
    factor = int(sys.argv[1]) if len(sys.argv) > 1 else 20
    rows = sys.argv[2:] or DEFAULT_ROWS
    from milvus_spark.session import get_spark
    from scale_smoke import build_scaled

    spark = get_spark("core-scaling-build", shuffle_partitions=64)
    scaled_dir = os.path.join(_REPO, "_scratch", f"scale{factor}")
    build_scaled(spark, factor, scaled_dir)
    spark.stop()

    r32 = _child(32, scaled_dir, rows)
    r8 = _child(8, scaled_dir, rows)
    out = {
        "factor": factor,
        "rows": {
            n: {
                "sec_8": r8[n],
                "sec_32": r32[n],
                "ratio_8_over_32": round(r8[n] / max(r32[n], 1e-9), 2),
            }
            for n in rows
        },
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
