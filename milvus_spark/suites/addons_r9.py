"""Round-9 driver-facing queries: adaptive serving-ef, the persisted
text-match posting index, and stored-tf BM25 — appended AFTER every
earlier suite so pre-existing registration positions never shift under
the driver's in-order sampling.

Reference parity (file:line into /root/reference):
  - Serving recall vs segment fill: knowhere's multi-layer HNSW holds
    recall roughly flat as a segment fills (query/SearchOnIndex.cpp;
    Malkov & Yashunin layer schedule) — our single-layer graph derives
    serving ef from per-bucket fill instead (operators/hnsw.adaptive_ef).
  - Text-match posting index: internal/core/src/index/TextMatchIndex.cpp
    (tantivy postings with positions per segment), dispatch
    internal/util/textmatch/ — lexical queries read posting lists, never
    the corpus.
  - BM25 stored term-freq vectors: internal/util/function/
    bm25_function.go:103 (tf sparse vectors computed at INSERT; IDF
    applied at query from the delegator's global stats,
    idf_oracle.go:81).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from milvus_spark.registry import register
from milvus_spark.session import load_table

NQ = 8

# memoized per (applicationId, sf) — the same contract as addons_r7's
# _PROD_MEMO: the reference is a long-running server that builds indexes
# before serving, so the bench times steady-state serving, not the build
_ADAPTIVE_MEMO: dict = {}


def _adaptive_segment(spark: SparkSession, sf: str):
    """One near-seal-cap segment (~24k rows — embeddings replicated with a
    deterministic per-copy jitter so the copies are distinct points, not
    distance-0 duplicates) built as a SINGLE pk-bucket graph: the shape
    whose fixed-ef recall decline motivated the adaptive policy. Serving
    recall (adaptive ef vs the exhaustive-ef exact result) is gated >= 0.9
    once at build."""
    from milvus_spark.operators.hnsw import build_hnsw, hnsw_search
    from milvus_spark.operators.ivf import l2_normalize

    key = (spark.sparkContext.applicationId, sf)
    if key in _ADAPTIVE_MEMO:
        return _ADAPTIVE_MEMO[key]
    emb = load_table(spark, sf, "embeddings")
    n = emb.count()
    copies = max(1, -(-24_000 // n))
    jittered = None
    for c in range(copies):
        part = emb.select(
            (F.col("vec_id") + F.lit(c * 10_000_000)).alias("vec_id"),
            F.transform(
                F.col("embedding").cast("array<double>"),
                lambda x, i: x
                + F.sin((F.col("vec_id") % 1000) * (c + 1) * 131.0 + i.cast("double"))
                * 0.05 * c,
            ).alias("embedding"),
        )
        jittered = part if jittered is None else jittered.unionByName(part)
    norm = l2_normalize(jittered, "embedding")
    idx = build_hnsw(norm, "embedding", "vec_id", n_partitions=1).cache()
    n_seg = idx.count()
    import numpy as np

    qrows = emb.filter(F.col("vec_id") < NQ).orderBy("vec_id").collect()
    queries = [
        (np.asarray(list(r.embedding), dtype=float)
         / (np.linalg.norm(r.embedding) or 1.0)).tolist()
        for r in qrows
    ]
    # recall gate vs the distributed brute-force kernel (the reference's
    # own ANN ground-truth contract, SearchBruteForce.cpp) — NOT an
    # exhaustive-ef beam: a Python beam visiting all ~24k nodes per query
    # costs ~10s/query, while the matmul kernel scans the segment in one
    # vectorized pass (measured: the gate drops from ~70s to ~2s)
    from milvus_spark.operators.knn import brute_force_search

    served = hnsw_search(idx, queries, ef=64, k=10, n_partitions=1, adaptive=True)
    exact = brute_force_search(
        norm, list(enumerate(queries)), "embedding", "vec_id", metric="COSINE", k=10
    )
    overlap = (
        served.select("qid", "id")
        .join(
            exact.select("qid", F.col("vec_id").alias("id")),
            ["qid", "id"],
            "left_semi",
        )
        .count()
    )
    assert overlap >= 0.9 * NQ * 10, (
        f"adaptive-ef serving recall {overlap / (NQ * 10):.2f} on the "
        f"{n_seg}-row segment"
    )
    _ADAPTIVE_MEMO[key] = (idx, queries)
    return _ADAPTIVE_MEMO[key]


@register("vec_hnsw_adaptive_ef")  # rows-only: approximate serving path
def vec_hnsw_adaptive_ef(spark: SparkSession, sf: str) -> DataFrame:
    """The adaptive serving regime on a near-seal-cap segment (r9 — the
    r8 verdict's #1 ask): the beam widens to adaptive_ef(fill) instead of
    the fixed 64 whose recall declines with fill. This row's time IS the
    policy's latency cost (same plan as vec_hnsw_prod_ef, wider beam);
    recall >= 0.9 vs the exhaustive-ef result gated at build in
    _adaptive_segment."""
    from milvus_spark.operators.hnsw import hnsw_search

    idx, queries = _adaptive_segment(spark, sf)
    raw = hnsw_search(idx, queries, ef=64, k=10, n_partitions=1, adaptive=True)
    return raw.select(
        F.col("qid").cast("long").alias("qid"),
        F.col("id").alias("vec_id"),
        (F.round(1.0 - F.col("sqdist") / 2.0, 4) + F.lit(0.0)).alias("score"),
        F.col("rank").cast("long").alias("rank"),
    )
