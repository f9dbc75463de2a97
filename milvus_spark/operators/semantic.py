"""Semantic (embedding-space) dedup kernel — SemDeDup-shaped
(Abbas et al. 2023, arXiv:2303.09540): one deterministic k-means assignment
(centroids = the first K vectors by id, the same coarse-quantizer kernel as
vec_kmeans_step / operators/ivf.py), then within each cluster drop every
vector that has an earlier (lower-id) cluster-mate with cosine >= theta,
reporting the strongest such keeper.

Scale shape: the quadratic pair work is confined to a cluster — exactly why
SemDeDup clusters first; K scales with the corpus (the paper holds n/K
roughly constant), so per-cluster work stays bounded. Assignment is a
broadcast nested-loop over K centroids with pure-JVM zip_with/aggregate
distances (no shuffle before the per-vector argmin); the pair stage is a
shuffle EQUI-join on cid (never a global cross join), so each cluster's
pairs materialize only on that cluster's partition. Norms are precomputed
once per side; the cosine stays in whole-stage codegen.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _sq_agg(arr: Column) -> Column:
    return F.aggregate(arr, F.lit(0.0), lambda acc, x: acc + x)


def assign_clusters(e: DataFrame, k: int) -> DataFrame:
    """Deterministic k-means ASSIGNMENT (centroids = first k vectors by id;
    ties to the lowest cid): (vec_id, cid, v). Broadcast-K, no shuffle
    before the per-vector argmin."""
    cents = e.filter(F.col("vec_id") < k).select(
        F.col("vec_id").alias("cid"), F.col("v").alias("cv")
    )
    sqdist = _sq_agg(F.zip_with("v", "cv", lambda a, b: (a - b) * (a - b)))
    scored = e.crossJoin(F.broadcast(cents)).select(
        "vec_id", "v", "cid", sqdist.alias("d")
    )
    return (
        scored.groupBy("vec_id")
        .agg(
            F.min_by(
                F.struct("cid", "v"), F.struct("d", F.col("cid").cast("double"))
            ).alias("s")
        )
        .select("vec_id", F.col("s.cid").alias("cid"), F.col("s.v").alias("v"))
    )


def semantic_dedup(e: DataFrame, k: int, theta: float) -> DataFrame:
    """``e`` has columns (vec_id, v: array<double>). Returns one row per
    DROPPED vector: (drop_id, keep_id, cid, cos) where keep_id is the
    strongest earlier cluster-mate (ties → lowest keep_id)."""
    m = assign_clusters(e, k)
    norm = F.sqrt(_sq_agg(F.zip_with("v", "v", lambda a, b: a * b)))
    side = m.withColumn("n", norm)
    a = side.select(
        F.col("cid"), F.col("vec_id").alias("keep_id"),
        F.col("v").alias("va"), F.col("n").alias("na"),
    )
    b = side.select(
        F.col("cid"), F.col("vec_id").alias("drop_id"),
        F.col("v").alias("vb"), F.col("n").alias("nb"),
    )
    dot = _sq_agg(F.zip_with("va", "vb", lambda x, y: x * y))
    pairs = (
        a.join(b, "cid")
        .filter(F.col("keep_id") < F.col("drop_id"))
        .select(
            "cid", "keep_id", "drop_id",
            (dot / (F.col("na") * F.col("nb"))).alias("cos"),
        )
        .filter(F.col("cos") >= theta)
    )
    from pyspark.sql import Window as W

    w = W.partitionBy("drop_id").orderBy(F.col("cos").desc(), F.col("keep_id"))
    return (
        pairs.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "drop_id", "keep_id", "cid",
            (F.round("cos", 4) + F.lit(0.0)).alias("cos"),
        )
    )
