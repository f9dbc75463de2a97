"""Search aggregation: faceted bucketing of ANN search results.

Reference parity: SearchAggregation (internal/proxy/search_pipeline.go:813,
search_agg.NewSearchAggregationComputer;
tests/python_client/milvus_client/test_milvus_client_search_aggregation.py):
the hits of a vector search are grouped into buckets by up to FOUR nested
group-by fields; each bucket carries its hit count, optional metrics
(count/sum/avg/min/max over hit fields), and optionally its top hits.

Spark shape: the input is the already-reduced top-k hit set (≤ nq·limit
rows — tiny at any corpus size), so bucketing is a groupBy over a small
relation followed by per-level rank windows; every window partitions by
(qid, parent-bucket prefix). Nothing here ever touches the corpus again —
the facet computation is a post-reduction step, exactly where the
reference's proxy runs it.
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import DataFrame
from pyspark.sql import Window as W
from pyspark.sql import functions as F

MAX_LEVELS = 4
MAX_RESULT_ENTRIES = 10000

_METRIC_OPS = {"count", "sum", "avg", "min", "max"}


def _metric_col(op: str, field: str):
    if op == "count":
        # COUNT(field) semantics: NULLs excluded ("*" keeps the row count)
        c = F.count(F.lit(1)) if field == "*" else F.count(F.col(field))
        return c.cast("long")
    fn = {"sum": F.sum, "avg": F.avg, "min": F.min, "max": F.max}[op]
    c = fn(F.col(field))
    return F.round(c, 4) if op in ("sum", "avg") else c


def aggregate_search_hits(
    hits: DataFrame,
    fields: Sequence[str],
    size: int,
    metrics: Optional[dict] = None,
    qid_col: str = "qid",
    top_hits: int = 0,
    pk_col: str = "vec_id",
    score_col: str = "score",
) -> DataFrame:
    """Bucket a search hit set by nested group fields.

    ``metrics`` maps output name → {op: field} (op ∈ count/sum/avg/min/max).
    Returns one row per surviving leaf bucket: (qid, *fields, count,
    *metrics[, hits]). Per level, the ``size`` largest buckets (count desc,
    value asc) within each parent bucket survive — the nested sub_groups
    rule. ``top_hits > 0`` adds a ``hits`` column: each bucket's best
    ``top_hits`` (pk, score) pairs by score desc (TopHits)."""
    fields = list(fields)
    if not fields or len(fields) > MAX_LEVELS:
        raise ValueError(
            f"search aggregation supports 1..{MAX_LEVELS} group levels, got {len(fields)}"
        )
    if size < 1:
        raise ValueError(f"size must be >= 1, got {size}")
    if size ** len(fields) > MAX_RESULT_ENTRIES:
        raise ValueError(
            f"aggregation would produce up to {size ** len(fields)} entries "
            f"(> {MAX_RESULT_ENTRIES}); lower size or nesting"
        )
    for f in fields:
        if f not in hits.columns:
            raise ValueError(f"unknown aggregation group field {f!r}")
    aggs = [F.count(F.lit(1)).cast("long").alias("count")]
    for out, spec in (metrics or {}).items():
        if out in ("count", "hits", qid_col) or out in fields:
            raise ValueError(f"metric name {out!r} collides with a built-in column")
        if not isinstance(spec, dict) or len(spec) != 1:
            raise ValueError(
                f"metric {out!r} must be a single {{op: field}} pair, got {spec!r}"
            )
        (op, fld), = spec.items()
        if op not in _METRIC_OPS:
            raise ValueError(f"unknown metric op {op!r}")
        aggs.append(_metric_col(op, fld).alias(out))
    if top_hits > 0:
        # per-bucket best hits: sort the collected (score, pk) structs and
        # slice — bucket populations are bounded by the search limit
        # struct sort on (-score, pk) ascending == the repo-wide top-k order
        # (score desc, pk asc); a reverse of (score, pk) asc would break
        # ties by pk DESCENDING, diverging from every other ranking path
        aggs.append(
            F.transform(
                F.slice(
                    F.array_sort(
                        F.collect_list(
                            F.struct(
                                (-F.col(score_col)).alias("negs"),
                                F.col(pk_col).alias("pk"),
                            )
                        )
                    ),
                    1,
                    top_hits,
                ),
                lambda h: F.struct((-h["negs"]).alias(score_col), h["pk"].alias(pk_col)),
            ).alias("hits")
        )
    leaf = hits.groupBy(qid_col, *fields).agg(*aggs)
    # per-level pruning: level k's buckets rank by TOTAL count within the
    # parent prefix; deeper levels only see surviving parents
    for k in range(1, len(fields) + 1):
        prefix = fields[:k]
        level = leaf.groupBy(qid_col, *prefix).agg(F.sum("count").alias("_n"))
        w = W.partitionBy(qid_col, *fields[: k - 1]).orderBy(
            F.col("_n").desc(), F.col(prefix[-1]).asc()
        )
        keep = level.withColumn("_rk", F.row_number().over(w)).filter(
            F.col("_rk") <= size
        ).select(qid_col, *prefix)
        leaf = leaf.join(keep, [qid_col, *prefix], "left_semi")
    return leaf
