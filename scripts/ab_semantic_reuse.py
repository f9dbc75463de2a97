"""Interleaved A/B for dedup_semantic: HEAD (two aliased pair sides, each
re-deriving the assign subtree) vs a SELF-JOIN on one identical frame so
ReuseExchange shares the assign pipeline (cross-join + argmin aggregate)
between the sides.

One session, variants alternate passes, min per variant. Also verifies the
variant's result equals HEAD's exactly (collected + sorted) before timing.

Usage: python scripts/ab_semantic_reuse.py [rounds]
"""

from __future__ import annotations

import os
import sys
import time
from pathlib import Path

_REPO = str(Path(__file__).resolve().parent.parent)
sys.path.insert(0, _REPO)

import bench  # noqa: E402
from milvus_spark.session import get_spark, load_table  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402


def semantic_dedup_reuse(e, k: int, theta: float):
    from milvus_spark.operators.semantic import _sq_agg, assign_clusters
    from pyspark.sql import Window as W

    m = assign_clusters(e, k)
    norm = F.sqrt(_sq_agg(F.zip_with("v", "v", lambda a, b: a * b)))
    side = m.withColumn("n", norm)
    x, y = side.alias("x"), side.alias("y")
    dot = _sq_agg(F.zip_with(F.col("x.v"), F.col("y.v"), lambda a, b: a * b))
    pairs = (
        x.join(y, F.col("x.cid") == F.col("y.cid"))
        .filter(F.col("x.vec_id") < F.col("y.vec_id"))
        .select(
            F.col("x.cid").alias("cid"),
            F.col("x.vec_id").alias("keep_id"),
            F.col("y.vec_id").alias("drop_id"),
            (dot / (F.col("x.n") * F.col("y.n"))).alias("cos"),
        )
        .filter(F.col("cos") >= theta)
    )
    w = W.partitionBy("drop_id").orderBy(F.col("cos").desc(), F.col("keep_id"))
    return (
        pairs.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "drop_id", "keep_id", "cid",
            (F.round("cos", 4) + F.lit(0.0)).alias("cos"),
        )
    )


def main() -> None:
    rounds = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    sf = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    from milvus_spark.operators.semantic import semantic_dedup
    from milvus_spark.suites.text import _SEM_K, _SEM_THETA

    spark = get_spark(
        "ab-semantic", shuffle_partitions=bench._sized_shuffle_partitions(sf)
    )
    e = load_table(spark, sf, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )
    variants = {
        "head": lambda: semantic_dedup(e, _SEM_K, _SEM_THETA),
        "reuse": lambda: semantic_dedup_reuse(e, _SEM_K, _SEM_THETA),
    }
    # equivalence first
    rows = {
        name: sorted(map(tuple, fn().collect())) for name, fn in variants.items()
    }
    assert rows["head"] == rows["reuse"], "variant diverges from HEAD"
    print(f"equivalent: {len(rows['head'])} rows", file=sys.stderr)
    # does ReuseExchange fire?
    plan = variants["reuse"]()._jdf.queryExecution().executedPlan().toString()
    print("ReusedExchange in reuse plan:", "ReusedExchange" in plan, file=sys.stderr)

    results = {name: [] for name in variants}
    for r in range(rounds):
        for name, fn in variants.items():
            spark.sparkContext.setJobDescription(f"sem {name} r={r}")
            t0 = time.perf_counter()
            fn().count()
            results[name].append(time.perf_counter() - t0)
            print(f"round {r} {name}: {results[name][-1]:.3f}s", file=sys.stderr)
    print("\n=== min per variant ===")
    for name, v in results.items():
        print(f"{name}: {min(v):.3f}s (all: {[round(t,2) for t in v]})")


if __name__ == "__main__":
    main()
