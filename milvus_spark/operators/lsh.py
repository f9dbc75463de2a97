"""Random-hyperplane LSH ANN: the alternative scale path to IVF.

Reference parity: the reference accelerates ANN with knowhere indexes
(query/SearchOnSealed.cpp); the correctness contract for any approximate
path is recall vs brute force (query/SearchBruteForce.cpp — our
operators/knn.py), the same methodology its search tests use.

Spark design (mirrors operators/ivf.py):
  - "Index build" = sign(H·v) bucket assignment (nbits seeded hyperplanes →
    one int bucket id) + corpus rewrite partitioned by bucket — for cosine,
    P(same bit) = 1 − θ/π, so near vectors collide in most bits.
  - "Index search" = multiprobe: the query's bucket plus every bucket within
    hamming distance ``probe_radius`` (flipping low-confidence bits first is
    the classic refinement; we flip all ≤r combinations — deterministic).
    The probe-list filter lands on the partition column → parquet partition
    pruning skips every non-probed bucket directory, then exact cosine
    scoring within candidates — identical tail to IVF's nprobe search.
  - Scale: buckets are ~uniform (hyperplanes are random), so no skew; probe
    count is (nbits choose ≤r), independent of corpus size; shuffle volume
    is per-batch top-k only.
"""

from __future__ import annotations

from itertools import combinations
from typing import Sequence

import numpy as np
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def hyperplanes(dim: int, nbits: int, seed: int = 7) -> np.ndarray:
    """Deterministic Gaussian hyperplanes (nbits × dim)."""
    rng = np.random.default_rng(seed)
    return rng.standard_normal((nbits, dim))


def _bucket_of(V: np.ndarray, H: np.ndarray) -> np.ndarray:
    bits = (V @ H.T) > 0  # (n, nbits)
    weights = (1 << np.arange(H.shape[0], dtype=np.int64))[None, :]
    return (bits * weights).sum(axis=1).astype(np.int64)


def assign_buckets(df: DataFrame, vec_col: str, H: np.ndarray) -> DataFrame:
    """Add bucket = packed sign bits of H·v (map-side, Arrow batch)."""

    def assign(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            V = np.asarray([np.asarray(v, dtype=np.float64) for v in pdf[vec_col]])
            out = pdf.drop(columns=[vec_col])
            out["bucket"] = _bucket_of(V, H)
            out[vec_col] = pdf[vec_col]
            yield out

    fields = [f"{name} {dt}" for name, dt in df.dtypes if name != vec_col]
    vec_dt = dict(df.dtypes)[vec_col]
    schema = ", ".join(fields + ["bucket long", f"{vec_col} {vec_dt}"])
    return df.mapInPandas(assign, schema=schema)


def write_bucketed(df: DataFrame, vec_col: str, H: np.ndarray, path: str) -> None:
    """LSH index build: rewrite the corpus partitioned by bucket."""
    assign_buckets(df, vec_col, H).write.mode("overwrite").partitionBy("bucket").parquet(path)


def probe_buckets(q: Sequence[float], H: np.ndarray, probe_radius: int = 1) -> list[int]:
    """The query's bucket plus all buckets within hamming ≤ probe_radius."""
    base = int(_bucket_of(np.asarray([q], dtype=np.float64), H)[0])
    nbits = H.shape[0]
    out = [base]
    for r in range(1, probe_radius + 1):
        for flip in combinations(range(nbits), r):
            m = 0
            for b in flip:
                m |= 1 << b
            out.append(base ^ m)
    return out


def lsh_search(
    spark: SparkSession,
    bucketed_path: str,
    H: np.ndarray,
    queries: Sequence[tuple[int, Sequence[float]]],
    vec_col: str,
    pk_col: str,
    metric: str = "COSINE",
    k: int = 10,
    probe_radius: int = 1,
    round_to: int = 4,
    matches: DataFrame | None = None,
    excluded: list | None = None,
) -> DataFrame:
    """ANN top-k probing the hamming ball around each query's bucket; exact
    scoring within — same pruned-scan + broadcast-probe tail as ivf_search.

    ``matches`` (optional, one long pk column): FilterBits→VectorSearch on
    the bucketed layout — surviving pk ids semi-join the probed rows
    before scoring; bucket pruning stays first."""
    import pandas as pd

    from pyspark.sql import Window as W

    from milvus_spark.operators.knn import _score_block, metric_ascending
    from milvus_spark.operators.rounding import round_half_up

    if metric.upper() == "IP":
        # sign-hyperplane buckets are angle-only (norm-blind): a huge-norm
        # vector with the top inner product can sit several sign bits away
        # and no probe radius short of nbits recovers it — refuse rather
        # than silently return wrong neighbors (COSINE/L2 over the
        # normalized corpus are the supported regimes)
        raise ValueError(
            "LSH index cannot serve metric IP (norm-blind bucketing); "
            "use COSINE, or search without the index"
        )
    asc = metric_ascending(metric)
    qids = np.asarray([int(q[0]) for q in queries], dtype=np.int64)
    Q = np.asarray([list(map(float, q[1])) for q in queries], dtype=np.float64)

    probe_rows = [
        (int(qid), int(b))
        for qid, qv in queries
        for b in probe_buckets(qv, H, probe_radius)
    ]
    probe_df = spark.createDataFrame(probe_rows, "qid long, bucket long")

    corpus = spark.read.parquet(bucketed_path)
    probed_ids = sorted({b for _, b in probe_rows})
    cand = corpus.filter(F.col("bucket").isin(probed_ids)).join(
        F.broadcast(probe_df), "bucket"
    )
    if matches is not None:
        mt = matches.select(F.col(matches.columns[0]).cast("long").alias(pk_col))
        cand = cand.join(mt, pk_col, "left_semi")
    if excluded:
        # persisted delete bitset: tombstoned pks drop from the probed rows;
        # [pk, bound] entries mask only epochs below the bound (upserts)
        from milvus_spark.operators.bitset import apply_delete_bitset

        cand = apply_delete_bitset(cand, pk_col, excluded)

    sign = 1.0 if asc else -1.0
    kk, met, rt = int(k), metric, round_to

    def score(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            frames = []
            for qid, grp in pdf.groupby("qid"):
                qi = int(np.where(qids == qid)[0][0])
                V = np.asarray([np.asarray(v, dtype=np.float64) for v in grp[vec_col]])
                s = round_half_up(_score_block(V, Q[qi : qi + 1], met)[0], rt)
                ids = grp[pk_col].to_numpy()
                idx = np.lexsort((ids, sign * s))[: min(kk, len(ids))]
                frames.append(pd.DataFrame({"qid": qid, pk_col: ids[idx], "score": s[idx]}))
            if frames:
                yield pd.concat(frames)

    partial = cand.select("qid", pk_col, vec_col).mapInPandas(
        score, schema=f"qid long, {pk_col} long, score double"
    )
    orderby = [F.col("score").asc() if asc else F.col("score").desc(), F.col(pk_col).asc()]
    w = W.partitionBy("qid").orderBy(*orderby)
    return (
        partial.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
        .select("qid", pk_col, "score", "rank")
    )


# ---------------------------------------------------------------- multi-table
def hyperplane_tables(dim: int, nbits: int, n_tables: int, seed: int = 7) -> np.ndarray:
    """L independent hash tables (OR-amplification): (L, nbits, dim)."""
    rng = np.random.default_rng(seed)
    return rng.standard_normal((n_tables, nbits, dim))


def lsh_index(df: DataFrame, vec_col: str, pk_col: str, HT: np.ndarray) -> DataFrame:
    """Narrow LSH index table: one (pk, table, bucket) row per table.

    The index carries no vectors — at 100 TB it is a small derived table
    (like the reference's index artifacts); candidate verification joins
    vectors back by pk afterwards.
    """
    L, nbits, _ = HT.shape

    def assign(batches):
        import pandas as pd

        for pdf in batches:
            if len(pdf) == 0:
                continue
            V = np.asarray([np.asarray(v, dtype=np.float64) for v in pdf[vec_col]])
            ids = pdf[pk_col].to_numpy()
            frames = []
            for t in range(L):
                frames.append(
                    pd.DataFrame(
                        {pk_col: ids, "table": t, "bucket": _bucket_of(V, HT[t])}
                    )
                )
            yield pd.concat(frames)

    return df.select(pk_col, vec_col).mapInPandas(
        assign, schema=f"{pk_col} long, table int, bucket long"
    )


def embedding_near_dup(
    df: DataFrame,
    vec_col: str,
    pk_col: str,
    HT: np.ndarray,
    threshold: float,
    round_to: int = 4,
) -> DataFrame:
    """Embedding near-duplicate pairs: multi-table LSH candidates, exact
    cosine verify ≥ threshold.

    Plan shape (the web-scale dedup pipeline):
      index = L×(pk, bucket) rows  →  self-join on (table, bucket)
      → distinct candidate pairs (small: OR-amplified collisions)
      → join vectors back by pk (broadcast the pair list)
      → exact JVM-side cosine, threshold filter.
    Collision probability per table = (1 − θ/π)^nbits; across L tables a
    true near-dup (θ ≈ 0) is found with prob ≈ 1, while random pairs
    (θ ≈ π/2) collide at ~2^-nbits per table — the candidate set stays
    near-linear instead of quadratic.
    """
    idx = lsh_index(df, vec_col, pk_col, HT)
    i2 = idx.select(
        F.col(pk_col).alias("_pk2"), F.col("table").alias("t2"), F.col("bucket").alias("b2")
    )
    cand = (
        idx.hint("shuffle_hash")
        .join(
            i2,
            (idx.table == i2.t2) & (idx.bucket == i2.b2) & (idx[pk_col] < i2._pk2),
        )
        .select(F.col(pk_col).alias("ia"), F.col("_pk2").alias("ib"))
        .distinct()
    )
    e = df.select(
        F.col(pk_col),
        F.col(vec_col).cast("array<double>").alias("_v"),
        F.sqrt(
            F.aggregate(
                F.col(vec_col).cast("array<double>"), F.lit(0.0), lambda a, x: a + x * x
            )
        ).alias("_n"),
    )
    a = e.select(F.col(pk_col).alias("ia"), F.col("_v").alias("va"), F.col("_n").alias("na"))
    b = e.select(F.col(pk_col).alias("ib"), F.col("_v").alias("vb"), F.col("_n").alias("nb"))
    dot = F.aggregate(F.zip_with("va", "vb", lambda x, y: x * y), F.lit(0.0), lambda s, x: s + x)
    return (
        a.join(F.broadcast(cand), "ia")
        .join(b.hint("shuffle_hash"), "ib")
        .select(
            "ia",
            "ib",
            # zero-norm guard: zero vectors bucket together in every table
            # and would NULL (or ANSI-error) the division — define their
            # similarity as 0, matching _score_block's COSINE convention
            F.round(
                F.when(
                    (F.col("na") > 0) & (F.col("nb") > 0),
                    dot / (F.col("na") * F.col("nb")),
                ).otherwise(F.lit(0.0)),
                round_to,
            ).alias("cos"),
        )
        .filter(F.col("cos") >= threshold)
    )
