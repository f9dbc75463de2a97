"""Skew handling for hot keys: salted two-stage aggregation and a
salt-replicated join.

At 100 TB a single hot key (one language, one tenant, one null bucket) can
route an entire shuffle partition to one reducer. Three tools, in order of
preference:

1. **Catalyst partial aggregation** — algebraic aggs (count/sum/min/max/avg)
   already do map-side combine, so each task ships one row per (key) it saw;
   a hot key is pre-reduced before the shuffle. Nothing to do.
2. **AQE skew handling** — ``spark.sql.adaptive.skewJoin.enabled`` splits
   oversized shuffle partitions at runtime (on in session.py). Nothing to do.
3. **Explicit salting** (this module) — for the cases 1–2 don't cover:
   non-algebraic aggregates whose per-key state is large (exact distinct
   sets, collect_list) and sort-merge joins where one side's hot key defeats
   AQE's split because the other side must be replicated.

The reference meets the same problem as hot shard channels / hot partition
keys (pk hashing to channels, partition-key mode task_search.go:196-225);
its answer is hash distribution, the same spirit as salting.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def with_salt(df: DataFrame, high_card_col: str, buckets: int) -> DataFrame:
    """Deterministic salt in [0, buckets): stable across retries (no rand(),
    which breaks task re-execution idempotency)."""
    return df.withColumn("_salt", F.pmod(F.xxhash64(F.col(high_card_col)), F.lit(buckets)))


def salted_distinct_count(
    df: DataFrame, key: str, distinct_col: str, buckets: int = 16
) -> DataFrame:
    """Exact count(DISTINCT distinct_col) per key, skew-safe: stage 1
    dedups within (key, salt) — per-task state is 1/buckets of the hot
    key's set — stage 2 sums the per-salt partial counts (salting by the
    distinct column keeps each distinct value in exactly one bucket, so
    partial counts are additive)."""
    # COUNT(DISTINCT col) excludes NULLs — keep the contract
    salted = with_salt(df.filter(F.col(distinct_col).isNotNull()), distinct_col, buckets)
    partial = (
        salted.select(key, "_salt", distinct_col)
        .distinct()
        .groupBy(key, "_salt")
        .agg(F.count(F.lit(1)).alias("_n"))
    )
    return partial.groupBy(key).agg(F.sum("_n").cast("long").alias("n_distinct"))


def salted_join(
    big: DataFrame, small: DataFrame, key: str, buckets: int = 8
) -> DataFrame:
    """Skewed big-side join: the big side salts on a high-cardinality column,
    the small side is replicated once per salt bucket, and the join key
    becomes (key, salt) — a hot key now spreads over ``buckets`` reducers.
    Use when the small side is too big to broadcast outright and AQE's
    skew split can't help (it cannot replicate the other side)."""
    # deterministic per-row salt: monotonically_increasing_id depends on
    # partition layout and breaks retry idempotency (recomputed map tasks
    # re-salt rows differently than already-fetched reducer output) — hash
    # the whole row instead
    b = big.withColumn(
        "_salt", F.pmod(F.xxhash64(F.struct(*[F.col(c) for c in big.columns])), F.lit(buckets))
    )
    s = small.withColumn(
        "_salt", F.explode(F.array(*[F.lit(i) for i in range(buckets)]))
    )
    return b.join(s, [key, "_salt"]).drop("_salt")
