"""Hybrid (multi-vector) search fusion + rerankers.

Reference parity (file:line into /root/reference):
  - Hybrid search fan-out: internal/proxy/task_search.go:489
    (initAdvancedSearchRequest) — N sub-searches fused on pk.
  - RRF / weighted merge: internal/util/function/chain/operator_merge.go
    (default rrf k = 60, rerank_builder.go:388-395).
  - Score normalization (norm_score=true): operator_merge.go:586-607 —
    COSINE → (1+s)/2, IP/MAX_SIM → 0.5 + atan(s)/π, BM25 → 2·atan(s)/π,
    distance metrics → 1 − 2·atan(d)/π.
  - Decay rerank: internal/util/function/chain/expr/decay_expr.go:81-100
    (gauss / exp / linear, Elasticsearch-style).
  - Boost (filter-conditional weight): internal/core/src/rescores/ +
    exec/operator/RescoresNode.cpp.

All fusion is pure column arithmetic over the per-sub-search top-k result
DataFrames (qid, pk, score, rank) — tiny inputs (nq·k rows each), so the
fusion join is broadcast-sized no matter the corpus scale.
"""

from __future__ import annotations

import math
import re
from functools import reduce
from typing import Optional, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import Window as W
from pyspark.sql import functions as F

DEFAULT_RRF_K = 60


def normalize_score(score: Column, metric: str) -> Column:
    """Milvus norm_score mapping to [0,1] (operator_merge.go:586-607)."""
    m = metric.upper()
    if m == "COSINE":
        return (F.lit(1.0) + score) * 0.5
    if m == "BM25":
        return F.lit(2.0) * F.atan(score) / math.pi
    if m in ("IP", "MHJACCARD", "MAX_SIM", "MAX_SIM_IP", "MAX_SIM_COSINE", "MAX_SIM_L2"):
        # MAX_SIM_L2 scores are already negated distances (higher = better),
        # so the similarity mapping applies, not the distance inversion
        return F.lit(0.5) + F.atan(score) / math.pi
    # distance metrics (smaller = better) → inverted to larger = better
    return F.lit(1.0) - F.lit(2.0) * F.atan(score) / math.pi


def rrf_fusion(
    results: Sequence[DataFrame],
    pk_col: str,
    k: int = DEFAULT_RRF_K,
    limit: int = 10,
    round_to: int = 4,
) -> DataFrame:
    """Reciprocal-rank fusion: score(pk) = Σ_i 1/(k + rank_i(pk))."""
    parts = [
        r.select("qid", pk_col, (F.lit(1.0) / (F.lit(float(k)) + F.col("rank"))).alias("rrf"))
        for r in results
    ]
    allhits = reduce(DataFrame.unionByName, parts)
    fused = allhits.groupBy("qid", pk_col).agg(F.round(F.sum("rrf"), round_to).alias("score"))
    w = W.partitionBy("qid").orderBy(F.col("score").desc(), F.col(pk_col).asc())
    return (
        fused.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= limit)
        .select("qid", pk_col, "score", "rank")
    )


def rrf_fusion_tagged(
    tagged: DataFrame,
    pk_col: str,
    k: int = DEFAULT_RRF_K,
    limit: int = 10,
    round_to: int = 4,
) -> DataFrame:
    """RRF over a single ``sid``-tagged multi-search frame (the
    one-corpus-scan hybrid kernel, knn.multi_metric_search) — same math
    as :func:`rrf_fusion` but with NO per-sub-search split: splitting the
    tagged frame into per-sid DataFrames and unioning them back plans the
    scan subtree once per sub-search (measured 2× slower at sf0.1 —
    ReusedExchange does not fire across the union branches), while the
    grouped aggregate here keeps one subtree and the corpus scan executes
    once per hybrid request."""
    fused = (
        tagged.select(
            "qid", pk_col,
            (F.lit(1.0) / (F.lit(float(k)) + F.col("rank"))).alias("rrf"),
        )
        .groupBy("qid", pk_col)
        .agg(F.round(F.sum("rrf"), round_to).alias("score"))
    )
    w = W.partitionBy("qid").orderBy(F.col("score").desc(), F.col(pk_col).asc())
    return (
        fused.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= limit)
        .select("qid", pk_col, "score", "rank")
    )


def weighted_fusion_tagged(
    tagged: DataFrame,
    metrics: Sequence[str],
    weights: Sequence[float],
    pk_col: str,
    limit: int = 10,
    norm_score: bool = True,
    round_to: int = 4,
) -> DataFrame:
    """Weighted fusion over a ``sid``-tagged multi-search frame — the
    per-sub-search weight and score normalization fold into one CASE
    chain on ``sid``, keeping the single-scan plan (see
    :func:`rrf_fusion_tagged`)."""
    if len(metrics) != len(weights):
        raise ValueError("one metric and one weight per sub-search")
    ws: Optional[Column] = None
    for sid, (m, wgt) in enumerate(zip(metrics, weights)):
        s = normalize_score(F.col("score"), m) if norm_score else F.col("score")
        term = F.lit(float(wgt)) * s
        ws = (
            F.when(F.col("sid") == sid, term)
            if ws is None
            else ws.when(F.col("sid") == sid, term)
        )
    fused = (
        tagged.select("qid", pk_col, ws.alias("ws"))
        .groupBy("qid", pk_col)
        .agg(F.round(F.sum("ws"), round_to).alias("score"))
    )
    w = W.partitionBy("qid").orderBy(F.col("score").desc(), F.col(pk_col).asc())
    return (
        fused.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= limit)
        .select("qid", pk_col, "score", "rank")
    )


def weighted_fusion(
    results: Sequence[DataFrame],
    metrics: Sequence[str],
    weights: Sequence[float],
    pk_col: str,
    limit: int = 10,
    norm_score: bool = True,
    round_to: int = 4,
) -> DataFrame:
    """Weighted fusion: score(pk) = Σ_i w_i · norm_i(s_i(pk)); a pk missing
    from sub-search i contributes 0 for that term (outer union semantics)."""
    if not (len(results) == len(metrics) == len(weights)):
        raise ValueError(
            f"weighted fusion needs one metric and one weight per sub-search "
            f"(got {len(results)} results, {len(metrics)} metrics, "
            f"{len(weights)} weights)"
        )
    parts = []
    for r, m, wgt in zip(results, metrics, weights):
        s = normalize_score(F.col("score"), m) if norm_score else F.col("score")
        parts.append(r.select("qid", pk_col, (F.lit(float(wgt)) * s).alias("ws")))
    allhits = reduce(DataFrame.unionByName, parts)
    fused = allhits.groupBy("qid", pk_col).agg(F.round(F.sum("ws"), round_to).alias("score"))
    w = W.partitionBy("qid").orderBy(F.col("score").desc(), F.col(pk_col).asc())
    return (
        fused.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= limit)
        .select("qid", pk_col, "score", "rank")
    )


def decay_factor(
    x: Column,
    function: str = "gauss",
    origin: float = 0.0,
    scale: float = 1.0,
    offset: float = 0.0,
    decay: float = 0.5,
) -> Column:
    """Decay factor in [0,1] of a numeric column (decay_expr.go:81-100)."""
    adjusted = F.greatest(F.lit(0.0), F.abs(x - F.lit(float(origin))) - F.lit(float(offset)))
    if function == "gauss":
        sigma_sq = (scale**2) / math.log(decay)  # negative
        return F.exp(F.pow(adjusted, F.lit(2.0)) / F.lit(sigma_sq))
    if function == "exp":
        lam = math.log(decay) / scale
        return F.exp(F.lit(lam) * adjusted)
    if function == "linear":
        slope = (1 - decay) / scale
        return F.greatest(F.lit(float(decay)), F.lit(1.0) - F.lit(slope) * adjusted)
    raise ValueError(f"unknown decay function {function}")


def boost_score(score: Column, cond: Column, weight: float) -> Column:
    """Filter-conditional boost: score × (weight if cond else 1)."""
    return score * F.when(cond, F.lit(float(weight))).otherwise(F.lit(1.0))


def model_rerank(
    topk: DataFrame,
    docs: DataFrame,
    pk_col: str,
    text_col: str,
    query_text: str,
    limit: int = 10,
    orig_ascending: bool = False,
) -> DataFrame:
    """Model-based rerank slot (rerank providers internal/util/function/
    rerank/*_provider.go — external cross-encoder services in the reference).

    No model runtime exists in this container, so the scorer is a
    DETERMINISTIC STAND-IN: token-overlap ratio between query and document
    (a real deployment swaps ``_relevance`` for a cross-encoder pandas UDF
    with the same (query, text) → score contract). The plan shape is the real
    one: rerank only touches the top-k candidate set (broadcast), re-fetches
    text by pk, and re-sorts — the corpus is never rescanned.

    ``orig_ascending``: direction of the ORIGINAL score for tie-breaking —
    True for distance metrics (smaller is better), else descending.
    Query tokens go through the SAME analyzer as the documents
    ([^a-z0-9]+ split) and are deduped so a repeated query word cannot
    deflate the overlap denominator.
    """
    qt = sorted({w for w in re.split(r"[^a-z0-9]+", query_text.lower()) if w})
    toks = F.filter(F.split(F.lower(F.col(text_col)), "[^a-z0-9]+"), lambda x: x != "")
    overlap = F.size(
        F.array_intersect(F.array_distinct(toks), F.array(*[F.lit(w) for w in qt]))
    ) / F.lit(float(len(qt) or 1))
    cand = F.broadcast(topk.select("qid", pk_col, F.col("score").alias("orig_score"))).join(
        docs.select(pk_col, text_col), pk_col
    )
    rescored = cand.select(
        "qid", pk_col, "orig_score", F.round(overlap, 4).alias("rerank_score")
    )
    orig = F.col("orig_score").asc() if orig_ascending else F.col("orig_score").desc()
    w = W.partitionBy("qid").orderBy(F.col("rerank_score").desc(), orig, F.col(pk_col).asc())
    return (
        rescored.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= limit)
    )

