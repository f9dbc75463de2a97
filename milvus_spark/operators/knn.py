"""Brute-force vector search: the reference semantic for all ANN paths.

Reference parity (file:line into /root/reference):
  - VectorANNS plan node: pkg/proto/plan.proto:339-345
  - Brute-force scoring: internal/core/src/query/SearchBruteForce.cpp
  - Metrics: pkg/util/metric/metric_type.go:19-53 (L2 is *squared* euclidean,
    the knowhere convention; COSINE/IP are similarities ranked descending)
  - Range search: internal/core/src/query/CachedSearchIterator.h:133-147
  - Grouping search: exec/operator/SearchGroupByNode.cpp +
    search-groupby/SearchGroupByOperator.cpp (top groups by best hit,
    group_size hits per group)
  - Pre-filter mode (FilterBits → VectorSearch): query/PlanProto.cpp:622-780

Scale design (100 TB posture):
  - Queries are tiny (nq ≤ thousands) → carried to executors as a plain
    closure ndarray (Spark broadcasts the serialized task); the corpus is
    never cross-joined row-by-row.
  - Scoring runs in mapInPandas: one numpy matmul per Arrow batch
    (vectorized, zero Python per-row cost), emitting only the per-batch
    top-k per query → shuffle volume is O(num_batches · nq · k), not
    O(rows · nq).
  - Final exact top-k is a Window over that small intermediate — the same
    partial-heap → reduce-tree shape as the reference's per-segment heaps
    merged at querynode/proxy (internal/querynodev2/segments/result.go:50).
  - Ordering is made deterministic by ranking on (rounded score, pk) so
    results are reproducible across partitionings and match the oracle.
"""

from __future__ import annotations

from typing import Iterable, Optional, Sequence

import numpy as np
import pandas as pd

from milvus_spark.operators.rounding import round_half_up
from pyspark.sql import Column, DataFrame
from pyspark.sql import Window as W
from pyspark.sql import functions as F

# metric -> (higher_is_better)
SIMILARITY_METRICS = {"IP", "COSINE", "BM25", "MAX_SIM_IP", "MAX_SIM_COSINE"}
DISTANCE_METRICS = {"L2", "HAMMING", "JACCARD", "MAX_SIM_L2"}


def metric_ascending(metric: str) -> bool:
    m = metric.upper()
    if m in SIMILARITY_METRICS:
        return False
    if m in DISTANCE_METRICS:
        return True
    raise ValueError(f"unknown metric {metric}")


def _score_block(V: np.ndarray, Q: np.ndarray, metric: str) -> np.ndarray:
    """Score all corpus rows in V (n×d) against all queries Q (nq×d).

    Returns (nq, n) float64. One BLAS matmul per call — this is the hot path.
    """
    m = metric.upper()
    if (
        Q.ndim == 2 and V.ndim == 2 and Q.shape[1] != V.shape[1]
        and m not in ("HAMMING", "JACCARD")
    ):
        # surfaced through the Python-worker traceback with the
        # reference's message instead of an opaque matmul shape error
        raise ValueError(
            f"vector dimension mismatch: query dim {Q.shape[1]}, "
            f"stored dim {V.shape[1]}"
        )
    if m == "IP":
        return Q @ V.T
    if m == "COSINE":
        qn = np.linalg.norm(Q, axis=1, keepdims=True)
        vn = np.linalg.norm(V, axis=1, keepdims=True)
        qn[qn == 0] = 1.0
        vn[vn == 0] = 1.0
        return (Q / qn) @ (V / vn).T
    if m == "L2":
        # squared euclidean via ||q||² + ||v||² - 2q·v (knowhere convention)
        q2 = (Q * Q).sum(axis=1)[:, None]
        v2 = (V * V).sum(axis=1)[None, :]
        d = q2 + v2 - 2.0 * (Q @ V.T)
        np.maximum(d, 0.0, out=d)
        return d
    if m in ("HAMMING", "JACCARD"):
        # BINARY_VECTOR rows: packed uint8 bytes (Milvus binary wire format).
        # Unpack once, then both metrics are BLAS matmuls over bit matrices.
        Vb = np.unpackbits(V.astype(np.uint8), axis=1).astype(np.float64)
        Qb = np.unpackbits(Q.astype(np.uint8), axis=1).astype(np.float64)
        inter = Qb @ Vb.T
        if m == "HAMMING":
            return Qb @ (1.0 - Vb).T + (1.0 - Qb) @ Vb.T
        union = Qb.sum(axis=1)[:, None] + Vb.sum(axis=1)[None, :] - inter
        with np.errstate(invalid="ignore", divide="ignore"):
            d = 1.0 - inter / union
        return np.where(union > 0, d, 0.0)
    raise ValueError(f"unsupported dense metric {metric}")


def brute_force_search(
    df: DataFrame,
    queries: Sequence[tuple[int, Sequence[float]]],
    vec_col: str,
    pk_col: str,
    metric: str = "COSINE",
    k: int = 10,
    filter_cond: Optional[Column] = None,
    round_to: int = 4,
    radius: Optional[float] = None,
    range_filter: Optional[float] = None,
) -> DataFrame:
    """ANN top-k (exact): returns (qid, pk, score, rank), rank 1..k per qid.

    ``radius``/``range_filter`` implement range search: keep hits with
    score better than ``radius`` and not better than ``range_filter``
    (Milvus semantics: radius is the outer bound, range_filter the inner).
    """
    asc = metric_ascending(metric)
    if filter_cond is not None:
        df = df.filter(filter_cond)  # pre-filter mode: FilterBits → VectorSearch

    qids = np.asarray([int(q[0]) for q in queries], dtype=np.int64)
    Q = np.asarray([list(map(float, q[1])) for q in queries], dtype=np.float64)
    sign = 1.0 if asc else -1.0
    kk = int(k)
    met = metric
    pk, vc, rt = pk_col, vec_col, round_to
    rad, rng = radius, range_filter

    def score_batches(batches: Iterable[pd.DataFrame]):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            ids = pdf[pk].to_numpy()
            V = np.asarray([np.asarray(v, dtype=np.float64) for v in pdf[vc]])
            S = round_half_up(_score_block(V, Q, met), rt)  # (nq, n), rounded
            # Partial top-k per query under the SAME total order as the final
            # window — (rounded score, pk) — so merging per-batch top-k is an
            # exact global top-k. Range bounds are applied BEFORE selection
            # (an inner range_filter excludes the best hits; survivors must
            # still be eligible).
            frames = []
            for qi, qid in enumerate(qids):
                row = S[qi]
                mask = np.ones(len(row), dtype=bool)
                if rad is not None:
                    mask &= (row < rad) if asc else (row > rad)
                if rng is not None:
                    mask &= (row >= rng) if asc else (row <= rng)
                if not mask.any():
                    continue
                mids, mrow = ids[mask], row[mask]
                idx = np.lexsort((mids, sign * mrow))[: min(kk, len(mids))]
                frames.append(
                    pd.DataFrame(
                        {
                            "qid": qid,
                            # pk keeps its collection dtype: VARCHAR
                            # primary keys (the reference's other pk
                            # type) flow through untouched, and the
                            # lexsort tie-break above sorts unicode
                            # arrays exactly as the SQL ORDER BY does
                            pk: mids[idx] if pk_str else mids[idx].astype(np.int64),
                            "score": mrow[idx],
                        }
                    )
                )
            if frames:
                yield pd.concat(frames)

    pk_dt = dict(df.dtypes).get(pk_col, "bigint")
    pk_str = pk_dt in ("string", "varchar")
    partial = df.select(pk_col, vec_col).mapInPandas(
        score_batches,
        schema=f"qid long, {pk_col} {'string' if pk_str else 'long'}, score double",
    )

    order = [F.col("score").asc() if asc else F.col("score").desc(), F.col(pk_col).asc()]
    w = W.partitionBy("qid").orderBy(*order)
    return (
        partial.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
        .select("qid", pk_col, "score", "rank")
    )


def multi_metric_search(
    df: DataFrame,
    queries: Sequence[tuple[int, Sequence[float]]],
    vec_col: str,
    pk_col: str,
    metrics: Sequence[str],
    k: int = 10,
    round_to: int = 4,
) -> DataFrame:
    """Hybrid-search fan-out in ONE corpus scan (r8): score every metric
    of a multi-metric request against the same vector column per Arrow
    batch — the vectors are deserialized and the parquet read paid ONCE
    instead of once per sub-search (the reference's delegator also visits
    each segment once per hybrid request, task_search.go:489). Returns
    (sid, qid, pk, score, rank) where ``sid`` indexes ``metrics``;
    per-(sid, qid) ranking is IDENTICAL to a standalone
    :func:`brute_force_search` of that metric — same rounding, same
    (score, pk) total order via a sign-folded order key, so fusion layers
    can consume the slices interchangeably."""
    qids = np.asarray([int(q[0]) for q in queries], dtype=np.int64)
    Q = np.asarray([list(map(float, q[1])) for q in queries], dtype=np.float64)
    signs = [1.0 if metric_ascending(m) else -1.0 for m in metrics]
    kk, rt = int(k), round_to
    pk, vc = pk_col, vec_col
    mets = list(metrics)

    def score_batches(batches: Iterable[pd.DataFrame]):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            ids = pdf[pk].to_numpy()
            V = np.asarray([np.asarray(v, dtype=np.float64) for v in pdf[vc]])
            frames = []
            for sid, met in enumerate(mets):
                S = round_half_up(_score_block(V, Q, met), rt)
                sign = signs[sid]
                for qi, qid in enumerate(qids):
                    row = S[qi]
                    idx = np.lexsort((ids, sign * row))[: min(kk, len(ids))]
                    frames.append(
                        pd.DataFrame(
                            {
                                "sid": sid,
                                "qid": qid,
                                pk: ids[idx] if pk_str else ids[idx].astype(np.int64),
                                "score": row[idx],
                            }
                        )
                    )
            if frames:
                yield pd.concat(frames)

    pk_str = dict(df.dtypes).get(pk_col, "bigint") in ("string", "varchar")
    partial = df.select(pk_col, vec_col).mapInPandas(
        score_batches,
        schema=f"sid int, qid long, {pk_col} {'string' if pk_str else 'long'}, score double",
    )
    # one window over ALL sub-searches: the per-sid order direction folds
    # into a sign key (ties at equal score are unaffected — ±0.0 compare
    # equal), so ranking matches each metric's standalone window exactly
    okey = F.when(
        F.col("sid").isin([s for s, g in enumerate(signs) if g > 0]),
        F.col("score"),
    ).otherwise(-F.col("score"))
    w = W.partitionBy("sid", "qid").orderBy(okey.asc(), F.col(pk_col).asc())
    return (
        partial.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
        .select("sid", "qid", pk_col, "score", "rank")
    )


def grouping_search(
    df: DataFrame,
    queries: Sequence[tuple[int, Sequence[float]]],
    vec_col: str,
    pk_col: str,
    group_col: str,
    metric: str = "COSINE",
    limit: int = 3,
    group_size: int = 2,
    round_to: int = 4,
    strict_group_size: bool = False,
) -> DataFrame:
    """Top-``limit`` groups per query, ``group_size`` hits per group.

    Groups are ranked by their best hit's score (SearchGroupByOperator.cpp);
    deterministic tie-breaks on (score, pk) within groups and
    (best_score, group) across groups. ``strict_group_size``
    (QueryInfo.strict_group_size, plan.proto:91-104): only groups that can
    fill all ``group_size`` slots are eligible.
    """
    asc = metric_ascending(metric)
    qids = np.asarray([int(q[0]) for q in queries], dtype=np.int64)
    Q = np.asarray([list(map(float, q[1])) for q in queries], dtype=np.float64)
    met, pk, vc, gc, rt = metric, pk_col, vec_col, group_col, round_to
    gsize = int(group_size)

    def score_batches(batches: Iterable[pd.DataFrame]):
        nq = len(qids)
        sign = 1.0 if asc else -1.0
        for pdf in batches:
            if len(pdf) == 0 or nq == 0:
                continue
            ids = pdf[pk].to_numpy()
            grp = pdf[gc].to_numpy()
            V = np.asarray([np.asarray(v, dtype=np.float64) for v in pdf[vc]])
            S = round_half_up(_score_block(V, Q, met), rt)
            n = len(ids)
            # per-batch partial: top group_size rows of every (query, group)
            # in ONE numpy pass across all queries (r10 — replaces a
            # per-qid Python loop of pandas sort_values().groupby().head()
            # that kept this kernel ~2x its baseline): lexsort the
            # flattened (nq, n) score block by (qid, group, directed score,
            # pk), then a run-start cumcount mask keeps the first gsize
            # rows of each (qid, group) run. Row set is IDENTICAL to the
            # old partial — same keys, same tie-break — and downstream
            # windows re-rank, so emit order is immaterial.
            _, gcodes = np.unique(grp, return_inverse=True)
            q_rep = np.repeat(np.arange(nq, dtype=np.int64), n)
            g_tile = np.tile(gcodes, nq)
            order = np.lexsort(
                (np.tile(ids, nq), (sign * S).ravel(), g_tile, q_rep)
            )
            # (qid, group) runs are contiguous after the sort; rank within
            # each run = index - run_start
            run_key = q_rep[order] * (int(gcodes.max()) + 1) + g_tile[order]
            pos = np.arange(len(run_key), dtype=np.int64)
            new_run = np.empty(len(run_key), dtype=bool)
            new_run[0] = True
            new_run[1:] = run_key[1:] != run_key[:-1]
            run_start = np.maximum.accumulate(np.where(new_run, pos, 0))
            keep = order[pos - run_start < gsize]
            ridx = keep % n
            yield pd.DataFrame(
                {
                    "qid": qids[keep // n],
                    pk: ids[ridx] if pk_str else ids[ridx].astype(np.int64),
                    gc: grp[ridx],
                    "score": S.ravel()[keep],
                }
            )

    gtype = dict(df.dtypes)[group_col]
    pk_str = dict(df.dtypes).get(pk_col, "bigint") in ("string", "varchar")
    pk_dt = "string" if pk_str else "long"
    partial = df.select(pk_col, vec_col, group_col).mapInPandas(
        score_batches, schema=f"qid long, {pk_col} {pk_dt}, {group_col} {gtype}, score double"
    )

    # Final merge in ONE applyInPandas over qid (r10 — replaces a
    # 4-exchange window→groupBy→window→broadcast-join chain that dominated
    # wall time): the reference reduces exactly this way too — per-segment
    # partial group top-k, then ONE delegator merge per query
    # (SearchGroupByOperator.cpp; result reduce in
    # internal/querynodev2/segments/result.go). Input per qid is bounded
    # by num_batches × groups_per_batch × group_size — the same merge
    # fan-in the reference's proxy holds — so the single-task finalize is
    # scale-safe wherever the reference's merge is.
    return grouping_merge(
        partial, pk_col, group_col, gtype, asc, limit, group_size,
        strict_group_size, pk_dt=pk_dt,
    )


def grouping_merge(
    partial: DataFrame,
    pk_col: str,
    group_col: str,
    gtype: str,
    asc: bool,
    limit: int,
    group_size: int,
    strict_group_size: bool = False,
    pk_dt: str = "long",
) -> DataFrame:
    """The delegator-side grouping merge, shared by the brute-force kernel
    and the graph-served path: ``partial`` is any bounded candidate frame
    (qid, pk, group, score). Semantics identical to the reference's reduce
    (SearchGroupByOperator.cpp): within-group order (score directed, pk
    asc), group rank by (best hit's score directed, group asc), strict
    mode drops groups that can't fill group_size slots."""
    pk, gc = pk_col, group_col
    gsize, lim = int(group_size), int(limit)
    strict = bool(strict_group_size)

    def finalize(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(
            ["score", pk], ascending=[asc, True], kind="mergesort"
        )
        kept = pdf.groupby(gc, sort=False).head(gsize)
        # first kept row per group is its best (the frame is globally
        # sorted in the metric's direction)
        firsts = kept.drop_duplicates(subset=[gc])[[gc, "score"]]
        if strict:
            nh = kept.groupby(gc, sort=False).size()
            firsts = firsts[
                firsts[gc].map(nh).to_numpy() >= gsize
            ]
        top = firsts.sort_values(
            ["score", gc], ascending=[asc, True], kind="mergesort"
        ).head(lim)
        top = top.assign(
            grank=np.arange(1, len(top) + 1, dtype=np.int64)
        ).drop(columns=["score"])
        out = kept.merge(top, on=gc, how="inner")
        return out[["qid", gc, pk, "score", "grank"]]

    return partial.groupBy("qid").applyInPandas(
        finalize,
        schema=f"qid long, {group_col} {gtype}, {pk_col} {pk_dt}, score double, grank long",
    )


def queries_from_table(
    df: DataFrame, pk_col: str, vec_col: str, pred: Column
) -> list[tuple[int, list[float]]]:
    """Search-by-pk helper: use stored vectors of matching rows as queries
    (test_milvus_client_search_by_pk.py). Collects only the tiny query set.
    """
    rows = df.filter(pred).select(pk_col, vec_col).orderBy(pk_col).collect()
    return [(int(r[0]), list(map(float, r[1]))) for r in rows]


def iterative_postfilter_search(
    df: DataFrame,
    queries: Sequence[tuple[int, Sequence[float]]],
    vec_col: str,
    pk_col: str,
    metric: str,
    k: int,
    filter_cond: Column,
    round_to: int = 4,
    widen: int = 4,
) -> DataFrame:
    """Post-filter execution order (hint "iterative_filter",
    query/PlanProto.cpp:667-698: Mvcc → VectorSearch → IterativeFilter):
    score FIRST, apply the scalar filter to the candidates, widen the fetch
    geometrically until every query holds k survivors. Result-identical to
    pre-filter mode; preferable when the filter is expensive relative to
    scoring or barely selective (the reference's motivation for the hint).
    Each widening round is a bounded partial top-k — never a full ranking."""
    if widen < 2:
        raise ValueError(f"widen must be >= 2 (got {widen}); 1 would never grow the fetch")
    asc = metric_ascending(metric)
    # survivors computed once and persisted — each widening round re-joins
    # against the same filtered pk set instead of re-running the filter scan
    fpks = df.filter(filter_cond).select(pk_col).persist()
    total = None  # corpus size fetched lazily, only on the first shortfall
    kf = max(widen * k, k)
    try:
        while True:
            hits = brute_force_search(
                df, queries, vec_col, pk_col, metric=metric,
                k=kf if total is None else min(kf, total),
                round_to=round_to,
            )
            kept = hits.join(fpks, pk_col, "left_semi")
            # a query with ZERO survivors is absent from the groupBy — count
            # satisfied queries against the full query list, not kept's qids
            satisfied = (
                kept.groupBy("qid").agg(F.count(F.lit(1)).alias("n"))
                .filter(F.col("n") >= k).count()
            )
            if satisfied >= len(queries):
                break
            if total is None:
                total = df.count()
            if kf >= total:
                break
            kf *= widen
        order = [
            F.col("score").asc() if asc else F.col("score").desc(),
            F.col(pk_col).asc(),
        ]
        w = W.partitionBy("qid").orderBy(*order)
        out = (
            kept.drop("rank")
            .withColumn("rank", F.row_number().over(w).cast("long"))
            .filter(F.col("rank") <= k)
            .select("qid", pk_col, "score", "rank")
        )
        # materialize before unpersist so the cached survivor set is live
        # for the plan's execution (localCheckpoint keeps it self-contained)
        return out.localCheckpoint(eager=True)
    finally:
        fpks.unpersist()
