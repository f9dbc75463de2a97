"""Quiet-machine profile of the bench rows showing multi-round creep
(r9 verdict ask #3): vec_element_collapse, src_packed_manifest,
mm_crossmodal_topk. Times each query min-of-N after an untimed warmup —
the bench methodology — and prints per-run times so contention noise is
visible. Run on an idle machine."""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

_REPO = str(Path(__file__).resolve().parent.parent)
sys.path.insert(0, _REPO)

NAMES = sys.argv[1:] or [
    "vec_element_collapse",
    "src_packed_manifest",
    "mm_crossmodal_topk",
]


def main() -> None:
    sf = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    import __spark_entry__ as entrymod
    from milvus_spark.session import get_spark

    import bench

    spark = get_spark("profile", shuffle_partitions=bench._sized_shuffle_partitions(sf))
    qs = entrymod.queries()
    for name in NAMES:
        fn = qs[name]
        fn(spark, sf).collect()  # warmup (builds memoized artifacts)
        runs = []
        for _ in range(5):
            t0 = time.time()
            fn(spark, sf).collect()
            runs.append(round(time.time() - t0, 3))
        print(json.dumps({"query": name, "runs": runs, "min": min(runs)}), flush=True)


if __name__ == "__main__":
    main()
