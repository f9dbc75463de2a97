"""Capture .explain("formatted") for bench queries into plans/r12/.

Usage: python scripts/capture_plans.py before|after [name ...]
Writes plans/r12/<query>_<tag>.txt for each bench query (or the named
subset). Uses the same session/bench sizing as bench.py so the plans match
what the bench actually runs.
"""

from __future__ import annotations

import os
import sys
from pathlib import Path

_REPO = str(Path(__file__).resolve().parent.parent)
sys.path.insert(0, _REPO)

import bench  # noqa: E402
from milvus_spark.session import get_spark  # noqa: E402


def main() -> None:
    tag = sys.argv[1] if len(sys.argv) > 1 else "before"
    only = set(sys.argv[2:])
    sf = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    import __spark_entry__ as entrymod

    spark = get_spark(
        "capture-plans", shuffle_partitions=bench._sized_shuffle_partitions(sf)
    )
    qs = entrymod.queries()
    outdir = Path(_REPO) / "plans" / "r12"
    outdir.mkdir(parents=True, exist_ok=True)
    for name in bench.BENCH_QUERIES:
        if name not in qs or (only and name not in only):
            continue
        try:
            df = qs[name](spark, sf)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
        except Exception as exc:  # noqa: BLE001
            plan = f"ERROR capturing plan: {exc}"
        (outdir / f"{name}_{tag}.txt").write_text(plan)
        print(f"wrote {name}_{tag}.txt ({len(plan)} bytes)", file=sys.stderr)


if __name__ == "__main__":
    main()
