"""Scalar quantization (SQ8): the 1-byte-per-dim compressed index tier.

Reference parity (file:line into /root/reference):
  - Knowhere's IVF_SQ8 sits in the same compressed-index family as PQ in
    the index zoo (internal/util/indexparamcheck/index_type.go); its
    correctness contract — like every ANN path — is recall against brute
    force (query/SearchBruteForce.cpp), the gate tests/test_sq.py enforces.

Spark design (100 TB posture):
  - "Train" = ONE distributed aggregation pass computing per-dimension
    [min, max] (2·d doubles on the driver — nothing like PQ's sampled
    codebooks is needed; SQ8's trainer is exact and cheap).
  - "Encode" = map-side Arrow pass: v_j → round(255·(v_j−min_j)/range_j),
    stored as a d-byte BINARY code — a 4× scan-size cut vs fp32 (d=64:
    64 B/row vs 256 B).
  - "Search" = per-query (d × 256) lookup tables of squared-distance
    contributions against the 256 reconstruction points of each dim
    (driver-built, tiny, closure-broadcast), summed per row over the code
    column only; per-batch partial shortlist, then exact refine of the
    shortlist via broadcast requery — identical plan shape to PQ's ADC,
    with per-dim tables instead of per-subspace.
"""

from __future__ import annotations

from typing import Sequence

import numpy as np
import pandas as pd

from milvus_spark.operators.rounding import round_half_up
from pyspark.sql import DataFrame
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from milvus_spark.operators.knn import _score_block, metric_ascending


def train_sq8(df: DataFrame, vec_col: str, dim: int) -> np.ndarray:
    """Per-dimension [min, max] → (2, d) in one shuffle of ≤ d rows/partition.

    Plan-size note: 2·dim separate min/max expressions in one agg blow past
    whole-stage-codegen limits at embedding dims (d=1536 → 3072 exprs in
    the plan). posexplode + groupBy(pos) keeps the plan constant-size at
    any dim; map-side partial aggregation reduces each scan partition to at
    most d (pos, min, max) rows before the tiny d-row shuffle."""
    stats = (
        df.select(F.posexplode(F.col(vec_col).cast("array<double>")).alias("pos", "val"))
        .groupBy("pos")
        .agg(F.min("val").alias("mn"), F.max("val").alias("mx"))
        .collect()
    )
    if len(stats) != dim:
        raise ValueError(
            f"cannot train SQ8 bounds: saw {len(stats)} dims, expected {dim} "
            f"(empty collection or ragged vectors)"
        )
    mins = np.empty(dim, dtype=np.float64)
    maxs = np.empty(dim, dtype=np.float64)
    for r in stats:
        mins[r["pos"]] = r["mn"]
        maxs[r["pos"]] = r["mx"]
    return np.stack([mins, maxs])


def encode_sq8(df: DataFrame, vec_col: str, pk_col: str, bounds: np.ndarray) -> DataFrame:
    """Map-side Arrow pass: vector → d-byte code (uint8 per dim)."""
    mins, maxs = bounds
    rng = np.maximum(maxs - mins, 1e-12)

    def enc(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            V = np.asarray([np.asarray(v, dtype=np.float64) for v in pdf[vec_col]])
            codes = np.clip(
                np.round(255.0 * (V - mins[None, :]) / rng[None, :]), 0, 255
            ).astype(np.uint8)
            yield pd.DataFrame({pk_col: pdf[pk_col], "code": [c.tobytes() for c in codes]})

    return df.select(pk_col, vec_col).mapInPandas(
        enc, schema=f"{pk_col} long, code binary"
    )


def sq8_search(
    encoded: DataFrame,
    corpus: DataFrame,
    bounds: np.ndarray,
    queries: Sequence[tuple[int, Sequence[float]]],
    vec_col: str,
    pk_col: str,
    metric: str = "L2",
    k: int = 10,
    shortlist: int = 100,
    round_to: int = 4,
    matches: DataFrame | None = None,
    excluded: list | None = None,
) -> DataFrame:
    """Approximate scan over the code table + exact refine of the shortlist.

    SQ8's reconstruction error is per-dim range/510, so its candidate
    ranking is far tighter than PQ's — a ~10×k shortlist suffices even on
    uniform synthetic vectors.

    ``matches`` (optional, one long pk column): FilterBits→VectorSearch —
    surviving pk ids semi-join the code table BEFORE the scan, so the
    shortlist holds only filter-passing rows."""
    asc = metric_ascending(metric)
    mins, maxs = bounds
    d = len(mins)
    rng = np.maximum(maxs - mins, 1e-12)
    recon = mins[:, None] + (np.arange(256)[None, :] / 255.0) * rng[:, None]  # (d, 256)
    qids = np.asarray([int(q[0]) for q in queries], dtype=np.int64)
    Q = np.asarray([list(map(float, q[1])) for q in queries], dtype=np.float64)
    mu = metric.upper()
    Qt = Q
    if mu == "COSINE":
        # codes encode the l2-normalized corpus (build path) — normalize
        # the query so dot tables rank by cosine
        n = np.linalg.norm(Q, axis=1, keepdims=True)
        n[n == 0] = 1.0
        Qt = Q / n
    if mu in ("IP", "COSINE"):
        # (nq, d, 256) per-dim dot contributions: sum = ⟨q, recon⟩ —
        # shortlist DESCENDING (an L2 shortlist would cut large-norm
        # vectors holding the top inner product)
        tables = recon[None, :, :] * Qt[:, :, None]
        adc_sign = -1.0
    else:
        # (nq, d, 256) squared-distance contribution tables
        tables = (recon[None, :, :] - Qt[:, :, None]) ** 2
        adc_sign = 1.0
    sl, kk = int(shortlist), int(k)

    def scan(batches):
        cols = np.arange(d)
        for pdf in batches:
            if len(pdf) == 0:
                continue
            codes = np.stack(
                [np.frombuffer(b, dtype=np.uint8) for b in pdf["code"]]
            ).astype(np.int64)  # (n, d)
            ids = pdf[pk_col].to_numpy()
            frames = []
            for qi in range(len(Q)):
                s = tables[qi][cols[None, :], codes].sum(axis=1)
                idx = np.lexsort((ids, adc_sign * s))[: min(sl, len(ids))]
                frames.append(
                    pd.DataFrame({"qid": qids[qi], pk_col: ids[idx], "adist": s[idx]})
                )
            yield pd.concat(frames)

    if matches is not None:
        mt = matches.select(F.col(matches.columns[0]).cast("long").alias(pk_col))
        encoded = encoded.join(mt, pk_col, "left_semi")
    if excluded:
        # persisted delete bitset: tombstoned pks drop before the code scan;
        # [pk, bound] entries mask only epochs below the bound (upserts)
        from milvus_spark.operators.bitset import apply_delete_bitset

        encoded = apply_delete_bitset(encoded, pk_col, excluded)
    partial = encoded.mapInPandas(scan, schema=f"qid long, {pk_col} long, adist double")
    adc_order = F.col("adist").asc() if adc_sign > 0 else F.col("adist").desc()
    w_sl = W.partitionBy("qid").orderBy(adc_order, F.col(pk_col).asc())
    short = (
        partial.withColumn("srank", F.row_number().over(w_sl))
        .filter(F.col("srank") <= sl)
        .select("qid", pk_col)
    )
    # force the broadcast only when the shortlist is production-bounded
    # (nq x shortlist rows, a few MB); the exhaustive oracle regime
    # (shortlist >= corpus) must NOT override AQE's size check — at scale
    # that hint would broadcast the whole scored corpus
    short_side = (
        F.broadcast(short) if sl * len(queries) <= 200_000 else short
    )
    cand = short_side.join(corpus.select(pk_col, vec_col), pk_col)
    sign = 1.0 if asc else -1.0
    met, rt = metric, round_to

    def refine(batches):
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
                frames.append(
                    pd.DataFrame({"qid": qid, pk_col: ids[idx], "score": s[idx]})
                )
            if frames:
                yield pd.concat(frames)

    scored = cand.select("qid", pk_col, vec_col).mapInPandas(
        refine, schema=f"qid long, {pk_col} long, score double"
    )
    orderby = [F.col("score").asc() if asc else F.col("score").desc(), F.col(pk_col).asc()]
    w = W.partitionBy("qid").orderBy(*orderby)
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= kk)
        .select("qid", pk_col, "score", "rank")
    )
