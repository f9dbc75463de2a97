"""SPARSE_WAND: exact sparse top-k with max-score early termination.

Reference parity (file:line into /root/reference):
  - internal/core/src/common/Types.h:690-693 — SPARSE_INVERTED_INDEX and
    SPARSE_WAND are the two sparse index types; WAND is the same posting
    layout served with max-score skipping (knowhere's WAND search path).
  - internal/util/indexparamcheck/sparse_float_vector_base_checker_test.go:71-74
    — SPARSE_WAND is a first-class index type in the param checker.

WAND (Broder et al., CIKM'03 "Efficient query evaluation using a two-level
retrieval process") is EXACT for IP top-k: per-dimension score upper bounds
let the scorer stop accumulating documents that provably cannot enter the
top-k. The distributed shape here follows the reference's per-segment
model: postings shard by a deterministic pk hash into segment buckets
(partitionBy directories — a query reads only its own dims' row groups in
each segment), each segment kernel runs vectorized term-at-a-time
max-score with early termination and emits its local top-k, and the
segment partials merge through one ranked window — the same
partial-then-delegator-merge topology every other index family here uses.

At 100 TB the posting artifact is the scan bound: a query touches only
(its dims' postings) x (live segments), and the kernel's early
termination bounds per-segment CPU. One shuffle is REQUIRED and bounded:
the dim-sorted layout scatters a document's postings within each segment
file (that's what buys the dim row-group pruning), so the QUERY-DIM
postings — already pruned, never the corpus — regroup once into
doc-complete segment kernels; only nq x k x n_segments rows leave them.
A doc-sorted layout would kill the dim pruning to save that bounded
shuffle — the wrong trade at scale.
"""

from __future__ import annotations

from typing import Dict, Sequence, Tuple

import numpy as np
import pandas as pd

from milvus_spark.operators.rounding import round_half_up
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

# rounded-domain safety margin multiplier: early termination prunes a doc
# only when it trails the kth-best accumulated score by MORE than one ulp
# of the rounded output domain, so a pruned doc can never round into a tie
# it would win on the pk tie-break
_MARGIN_ULPS = 2.0


def default_n_buckets(
    df: DataFrame = None,
    *,
    est_bytes: int = None,
    target_bytes: int = 256 << 20,
    floor: int = 8,
    cap: int = 4096,
) -> int:
    """Scale-adaptive default for the sealed-segment bucket count.

    A constant 8 buckets is right for the local fixtures but at warehouse
    scale it would make each segment's posting shard enormous (one task
    per segment kernel). Derive the default from the optimizer's size
    estimate of the input frame instead — the same ~256 MB-per-partition
    arithmetic the bench uses for shuffle partitions: local fixtures
    estimate far below one target's worth so the default stays at the
    floor (artifacts, oracle plans and bench rows unchanged at test
    scale), while a 100 TB collection lands in the thousands. An explicit
    ``n_buckets`` build param always wins."""
    if est_bytes is None:
        try:
            raw = df._jdf.queryExecution().optimizedPlan().stats().sizeInBytes()
            # py4j maps java.math.BigInteger to a Python int directly —
            # r12 fix: the r11 `.longValue()` call raised on every runtime
            # read, silently pinning the default at the floor at any scale
            est_bytes = int(raw.longValue()) if hasattr(raw, "longValue") else int(raw)
        except Exception:
            return floor
    if est_bytes >= 1 << 60:
        # Catalyst's "unknown size" fallback is Long.MaxValue
        # (defaultSizeInBytes); trusting it would build `cap` near-empty
        # posting segments. Treat it as unknown and keep the floor.
        return floor
    return int(max(floor, min(est_bytes // target_bytes + 1, cap)))


def wand_postings(
    df: DataFrame, field: str, pk_col: str, n_buckets: int = 8
) -> DataFrame:
    """Segment-sharded posting rows (id, dim, val, sbucket) for a sparse
    map column: documents bucket by pk hash (the sealed-segment analog),
    and rows sort by dim within each bucket so a query's dimensions prune
    parquet row groups inside every segment directory."""
    post = df.select(
        F.col(pk_col).cast("long").alias("id"),
        F.explode(F.col(field)).alias("dim", "val"),
    ).select(
        "id",
        F.col("dim").cast("long").alias("dim"),
        F.col("val").cast("double").alias("val"),
    )
    post = post.withColumn(
        "sbucket", F.pmod(F.xxhash64(F.col("id")), F.lit(n_buckets)).cast("int")
    )
    return post.repartition(n_buckets, "sbucket").sortWithinPartitions(
        "sbucket", "dim"
    )


def _segment_topk(
    pdf: pd.DataFrame,
    qmap: Dict[int, Dict[int, float]],
    k: int,
    round_to: int,
    stats: dict = None,
) -> pd.DataFrame:
    """Exact per-segment top-k for every query via term-at-a-time
    max-score: dimensions process in decreasing impact (q_weight x
    segment-local max val); once the kth-best accumulated score provably
    exceeds what any trailing document could still reach, accumulation
    narrows to the surviving candidate set (their final scores stay
    exact — WAND's contract is exact top-k, not approximate)."""
    ids = pdf["id"].to_numpy(dtype=np.int64)
    dims = pdf["dim"].to_numpy(dtype=np.int64)
    vals = pdf["val"].to_numpy(dtype=np.float64)
    uids, inv = np.unique(ids, return_inverse=True)
    n = uids.size
    if n == 0:
        return pd.DataFrame({"qid": [], "id": [], "score": []}).astype(
            {"qid": np.int64, "id": np.int64, "score": np.float64}
        )
    order = np.argsort(dims, kind="stable")
    ds, iv, vs = dims[order], inv[order], vals[order]
    uniq_dims, starts = np.unique(ds, return_index=True)
    starts = np.append(starts, ds.size)
    dim_slice = {
        int(d): (int(starts[i]), int(starts[i + 1]))
        for i, d in enumerate(uniq_dims)
    }
    margin = _MARGIN_ULPS * 10.0 ** (-round_to)
    out_q: list = []
    out_i: list = []
    out_s: list = []
    for qid, qv in qmap.items():
        legs: list = []
        for d, w in qv.items():
            sl = dim_slice.get(int(d))
            if sl is None:
                continue
            a, b = sl
            legs.append((float(w) * float(vs[a:b].max()), a, b, float(w)))
        if not legs:
            continue
        legs.sort(key=lambda t: (-t[0], t[1]))
        impacts = np.array([t[0] for t in legs])
        # rem[j] = total impact of legs after j — the score any document
        # could still gain once leg j has been accumulated
        rem = np.append(np.cumsum(impacts[::-1])[::-1][1:], 0.0)
        acc = np.zeros(n)
        touched = np.zeros(n, dtype=bool)
        cand = None
        for j, (_imp, a, b, w) in enumerate(legs):
            seg_iv, seg_v = iv[a:b], vs[a:b]
            if cand is None:
                np.add.at(acc, seg_iv, w * seg_v)
                touched[seg_iv] = True
                rub = float(rem[j])
                if rub <= margin:
                    continue  # trailing legs can't reorder anything
                nt = int(np.count_nonzero(touched))
                if nt > k:
                    ta = acc[touched]
                    theta = float(np.partition(ta, nt - k)[nt - k])
                    best_out = float(np.partition(ta, nt - k - 1)[nt - k - 1])
                    if theta - rub > margin and theta - (best_out + rub) > margin:
                        # every doc outside the candidate band is beaten
                        # even after gaining the full remaining bound
                        cand = touched & (acc >= theta - rub - margin)
                        if stats is not None:
                            stats["engaged"] = stats.get("engaged", 0) + 1
                            stats["legs_full"] = stats.get("legs_full", 0) + j + 1
                            stats["legs_total"] = stats.get(
                                "legs_total", 0
                            ) + len(legs)
            else:
                keep = cand[seg_iv]
                if keep.any():
                    np.add.at(acc, seg_iv[keep], w * seg_v[keep])
                if stats is not None:
                    stats["rows_skipped"] = stats.get("rows_skipped", 0) + int(
                        (~keep).sum()
                    )
        pool = np.flatnonzero(cand if cand is not None else touched)
        # canonical rescore (r12, Hypothesis-found): the max-score pass
        # accumulates legs in impact order, which is DATA-dependent — at
        # an exact half-decimal boundary a 1-ulp summation-order
        # difference flips round_half_up (e.g. 0.825+2.475+0.00015 vs
        # 0.825+0.00015+2.475 straddling 3.30015). Reported scores must
        # not depend on leg processing order, so the surviving pool is
        # re-accumulated in ASCENDING dim order — the engine's canonical
        # summation — before rounding and the top-k cut. Pool size is
        # bounded by the candidate band, so this pass is cheap.
        pmask = np.zeros(n, dtype=bool)
        pmask[pool] = True
        acc2 = np.zeros(n)
        for d, w in sorted((int(d), float(w)) for d, w in qv.items()):
            sl = dim_slice.get(d)
            if sl is None:
                continue
            a, b = sl
            seg_iv, seg_v = iv[a:b], vs[a:b]
            keep = pmask[seg_iv]
            if keep.any():
                np.add.at(acc2, seg_iv[keep], float(w) * seg_v[keep])
        sc = round_half_up(acc2[pool], round_to)
        top = np.lexsort((uids[pool], -sc))[:k]
        sel = pool[top]
        out_q.extend([int(qid)] * len(sel))
        out_i.extend(uids[sel].tolist())
        out_s.extend(round_half_up(acc2[sel], round_to).tolist())
    return pd.DataFrame(
        {
            "qid": np.asarray(out_q, dtype=np.int64),
            "id": np.asarray(out_i, dtype=np.int64),
            "score": np.asarray(out_s, dtype=np.float64),
        }
    )


def wand_search(
    posting: DataFrame,
    queries: Sequence[Tuple[int, Dict[int, float]]],
    k: int = 10,
    round_to: int = 4,
) -> DataFrame:
    """Distributed exact WAND top-k over segment-sharded postings.

    ``posting`` is (id, dim, val, sbucket) — sealed postings (with any
    delete mask already applied) plus, for sealed+growing serving, the
    exploded growing delta as additional rows. The dim filter prunes the
    scan to the query dims (row-group pushdown on the dim-sorted layout);
    each sbucket group runs the max-score kernel; one ranked window merges
    the nq x k x n_segments partials."""
    qmap = {
        int(qid): {int(d): float(w) for d, w in qv.items()} for qid, qv in queries
    }
    all_dims = sorted({d for qv in qmap.values() for d in qv})
    if not all_dims:
        raise ValueError("wand_search needs at least one non-empty query")
    pruned = posting.filter(F.col("dim").isin(all_dims))

    def kern(pdf: pd.DataFrame) -> pd.DataFrame:
        return _segment_topk(pdf, qmap, k, round_to)

    hits = pruned.groupBy("sbucket").applyInPandas(
        kern, "qid long, id long, score double"
    )
    w = Window.partitionBy("qid").orderBy(F.col("score").desc(), F.col("id").asc())
    return (
        hits.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= int(k))
    )
