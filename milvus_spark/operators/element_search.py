"""Element-level and embedding-list search over struct-array vector fields.

Milvus 2.6 struct arrays (ARRAY of STRUCT with a vector sub-field,
DataType_ArrayOfVector) support two search kinds, classified by the query
placeholder shape (internal/proxy/struct_hybrid_search.go:40-45,
classifyHybridSubSearch):

  - **element-level** (hybridSubSearchStructElement): the query is a single
    vector; every ELEMENT of the struct array is a candidate hit. The
    ``element_scope.collapse`` search param merges element scores per
    document — strategies max / sum / avg / topk_sum / topk_avg
    (struct_hybrid_search.go:22-31,123-149); without collapse the hits are
    (pk, element_idx) pairs. An ``element_filter`` predicate restricts which
    elements participate (IterativeElementFilterNode, query/PlanProto.cpp:682).
  - **embedding-list** (hybridSubSearchStructEmbList): the query is a LIST of
    vectors; score(Q, D) = Σ_{q∈Q} max_{d∈D} sim(q, d) — late-interaction
    MAX_SIM (pkg/util/metric/metric_type.go:49-53).

Spark-first shape (100 TB posture): the struct array never explodes into a
shuffle. Element filtering is ``F.filter`` on the array, per-element scores
are ``transform``/``zip_with``/``aggregate`` higher-order functions (JVM
codegen, no Python), and per-doc collapse is an array aggregation — all
map-side on the corpus scan. Queries (nq ≤ thousands) ride a broadcast
cross join. Only (qid, pk, score) survivors reach the bounded two-level
top-k rank, so no partition ever holds O(corpus) rows.
"""

from __future__ import annotations

from typing import Callable, Optional, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import Window as W
from pyspark.sql import functions as F

COLLAPSE_STRATEGIES = ("max", "sum", "avg", "topk_sum", "topk_avg")
# sum-family collapse requires a positively-related metric
# (validateElementCollapseMetricType, struct_hybrid_search.go:166-177)
_SUM_FAMILY = ("sum", "topk_sum")


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda s, x: s + x)


def _norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda s, x: s + x * x))


def elem_score(vec: Column, qv: Column, metric: str) -> Column:
    """Per-element similarity/distance, pure Catalyst. L2 is squared
    euclidean (knowhere convention, metric_type.go:19-25)."""
    m = metric.upper()
    if m.startswith("MAX_SIM_"):
        m = m[len("MAX_SIM_"):]
    if m == "IP":
        return _dot(vec, qv)
    if m == "COSINE":
        nv, nq = _norm(vec), _norm(qv)
        return F.when((nv > 0) & (nq > 0), _dot(vec, qv) / (nv * nq)).otherwise(F.lit(0.0))
    if m == "L2":
        return F.aggregate(
            F.zip_with(vec, qv, lambda x, y: (x - y) * (x - y)),
            F.lit(0.0),
            lambda s, x: s + x,
        )
    raise ValueError(f"unsupported element metric {metric}")


def _ascending(metric: str) -> bool:
    # single source of truth for metric direction — knn's table already
    # covers the MAX_SIM_* variants
    from milvus_spark.operators.knn import metric_ascending

    return metric_ascending(metric)


def _bounded_topk(scored: DataFrame, k: int, asc: bool, tie_cols: Sequence[str], buckets: int = 32) -> DataFrame:
    """Two-level per-qid top-k (rank within (qid, hash bucket), then rank the
    ≤ buckets·k survivors) — bounded window input at any corpus size, the
    same partial-heap→merge contract as the reference's per-segment heaps
    (querynodev2/segments/result.go:50)."""
    order = [F.col("score").asc() if asc else F.col("score").desc()] + [
        F.col(c).asc() for c in tie_cols
    ]
    wb = W.partitionBy("qid", "_b").orderBy(*order)
    wf = W.partitionBy("qid").orderBy(*order)
    return (
        scored.withColumn("_b", F.pmod(F.xxhash64(*tie_cols), F.lit(buckets)))
        .withColumn("_rb", F.row_number().over(wb))
        .filter(F.col("_rb") <= k)
        .drop("_b", "_rb")
        .withColumn("rank", F.row_number().over(wf).cast("long"))
        .filter(F.col("rank") <= k)
    )


def _queries_df(df: DataFrame, queries, emb_list: bool) -> DataFrame:
    spark = df.sparkSession
    if emb_list:
        rows = [(int(q), [[float(x) for x in v] for v in vs]) for q, vs in queries]
        return spark.createDataFrame(rows, "qid long, qv array<array<double>>")
    rows = [(int(q), [float(x) for x in v]) for q, v in queries]
    return spark.createDataFrame(rows, "qid long, qv array<double>")


def element_search(
    df: DataFrame,
    queries: Sequence[tuple[int, Sequence[float]]],
    array_col: str,
    vec_field: str,
    pk_col: str,
    metric: str = "IP",
    k: int = 10,
    element_pred: Optional[Callable[[Column], Column]] = None,
    doc_cond: Optional[Column] = None,
    collapse: Optional[dict] = None,
    round_to: int = 4,
) -> DataFrame:
    """Element-level search: single query vector vs every struct-array
    element.

    ``collapse=None`` → element hits (qid, pk, element_idx, score, rank);
    ``element_idx`` is the element's position in the ORIGINAL array (element
    identity survives element_filter, hybridElementKey semantics
    struct_hybrid_search.go:28-31).
    ``collapse={"strategy": s, "topk": n}`` → doc hits (qid, pk, score,
    rank) with per-doc element-score aggregation.
    """
    asc = _ascending(metric)
    if doc_cond is not None:
        df = df.filter(doc_cond)
    qdf = _queries_df(df, queries, emb_list=False)
    # index elements BEFORE filtering so element_idx is the original offset
    pairs = F.transform(array_col, lambda e, i: F.struct(i.alias("i"), e.alias("e")))
    if element_pred is not None:
        pairs = F.filter(pairs, lambda p: element_pred(p["e"]))
    base = df.select(F.col(pk_col).alias("pk"), pairs.alias("_pairs")).filter(
        F.size("_pairs") > 0
    )
    joined = base.crossJoin(F.broadcast(qdf))
    scored_arr = F.transform(
        "_pairs",
        lambda p: F.struct(
            p["i"].alias("element_idx"),
            F.round(elem_score(p["e"][vec_field].cast("array<double>"), F.col("qv"), metric), round_to).alias("s"),
        ),
    )
    if collapse is None:
        ex = joined.select(
            "qid", "pk", F.explode(scored_arr).alias("_h")
        ).select(
            "qid",
            "pk",
            F.col("_h.element_idx").cast("long").alias("element_idx"),
            F.col("_h.s").alias("score"),
        )
        out = _bounded_topk(ex, k, asc, ["pk", "element_idx"])
        return out.select(
            "qid", F.col("pk").alias(pk_col), "element_idx", "score", "rank"
        )
    strategy = collapse.get("strategy")
    if strategy not in COLLAPSE_STRATEGIES:
        raise ValueError(f"unsupported element_scope.collapse.strategy: {strategy}")
    topk = int(collapse.get("topk", 0))
    if strategy in ("topk_sum", "topk_avg"):
        if topk <= 0:
            raise ValueError(f"element_scope.collapse.topk is required for strategy {strategy}")
    elif topk:
        raise ValueError("element_scope.collapse.topk is only valid for topk strategies")
    if strategy in _SUM_FAMILY and asc:
        # sum of distances is not a ranking score
        raise ValueError(
            f"element_scope.collapse.strategy {strategy} is only supported "
            f"for positively related metrics"
        )
    vals = F.transform(scored_arr, lambda h: h["s"])
    if strategy == "max":
        doc_score = F.array_min(vals) if asc else F.array_max(vals)
    elif strategy == "sum":
        doc_score = F.aggregate(vals, F.lit(0.0), lambda s, x: s + x)
    elif strategy == "avg":
        doc_score = F.aggregate(vals, F.lit(0.0), lambda s, x: s + x) / F.size(vals)
    else:  # topk_sum / topk_avg over the best-k element scores
        best = F.slice(F.sort_array(vals, asc=asc), 1, topk)
        tot = F.aggregate(best, F.lit(0.0), lambda s, x: s + x)
        doc_score = tot if strategy == "topk_sum" else tot / F.size(best)
    scored = joined.select("qid", "pk", F.round(doc_score, round_to).alias("score"))
    out = _bounded_topk(scored, k, asc, ["pk"])
    return out.select("qid", F.col("pk").alias(pk_col), "score", "rank")


def emb_list_search(
    df: DataFrame,
    queries: Sequence[tuple[int, Sequence[Sequence[float]]]],
    array_col: str,
    vec_field: str,
    pk_col: str,
    metric: str = "MAX_SIM_IP",
    k: int = 10,
    element_pred: Optional[Callable[[Column], Column]] = None,
    doc_cond: Optional[Column] = None,
    round_to: int = 4,
) -> DataFrame:
    """Embedding-list (late interaction) search over struct-array vector
    sub-fields: score(Q, D) = Σ_{q∈Q} max_{d∈D} sim(q, d); for MAX_SIM_L2
    the per-query-vector term is −min‖q−d‖² (similarity = negated distance,
    ranked descending like the reference's MAX_SIM_* family)."""
    m = metric.upper()
    l2 = m.endswith("L2")
    if doc_cond is not None:
        df = df.filter(doc_cond)
    qdf = _queries_df(df, queries, emb_list=True)
    elems = F.col(array_col)
    if element_pred is not None:
        elems = F.filter(elems, element_pred)
    vecs = F.transform(elems, lambda e: e[vec_field].cast("array<double>"))
    base = df.select(F.col(pk_col).alias("pk"), vecs.alias("_vs")).filter(F.size("_vs") > 0)
    joined = base.crossJoin(F.broadcast(qdf))

    def per_qvec(qv: Column) -> Column:
        sims = F.transform("_vs", lambda v: elem_score(v, qv, m))
        return -F.array_min(sims) if l2 else F.array_max(sims)

    total = F.aggregate(F.transform("qv", per_qvec), F.lit(0.0), lambda s, x: s + x)
    scored = joined.select("qid", "pk", F.round(total, round_to).alias("score"))
    out = _bounded_topk(scored, k, asc=False, tie_cols=["pk"])
    return out.select("qid", F.col("pk").alias(pk_col), "score", "rank")
