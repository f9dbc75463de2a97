"""Function-chain rerank pipeline: declarative op list → DataFrame transform.

Reference parity (file:line into /root/reference):
  - Chain operators Filter / GroupBy / Limit / Map / Merge / Select / Sort:
    internal/util/function/chain/operator_{filter,group_by,limit,map,select,
    sort}.go:29-34, dataframe.go, optimization_plan.go — a mini dataframe IR
    evaluated at the proxy over search results.
  - Merge fusion (rrf / weighted): chain/operator_merge.go,
    rerank_builder.go:42-47.

Here the chain IS DataFrame ops — each spec entry maps 1:1 onto a Catalyst
transformation, so the proxy-side interpreter disappears and chains run
distributed with full optimization. Spec format (JSON-able):

    [{"op": "merge", "how": "rrf", "k": 60},            # fuse the N inputs
     {"op": "filter", "expr": "score > 0.01"},          # Milvus expr string
     {"op": "map", "name": "boosted", "expr": "score * 2"},
     {"op": "select", "cols": ["qid", "pk", "boosted"]},
     {"op": "sort", "by": [["boosted", false], ["pk", true]]},
     {"op": "limit", "n": 10, "per": ["qid"]}]          # per-group head-n
"""

from __future__ import annotations

from typing import Any, Optional, Sequence

from pyspark.sql import DataFrame
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from milvus_spark.plans.expr import compile_expr


def apply_chain(
    inputs: Sequence[DataFrame],
    spec: Sequence[dict[str, Any]],
    pk_col: str = "pk",
) -> DataFrame:
    """Run a chain spec over one or more input result DataFrames."""
    dfs = list(inputs)
    cur: Optional[DataFrame] = dfs[0] if len(dfs) == 1 else None
    for i, step in enumerate(spec):
        op = step["op"]
        if op == "merge":
            if i != 0:
                # a mid-chain merge would silently re-fuse the ORIGINAL
                # inputs and discard every step applied so far
                raise ValueError("merge must be the first chain step")
            how = step.get("how", "rrf")
            from milvus_spark.operators.hybrid import rrf_fusion, weighted_fusion

            if how == "rrf":
                cur = rrf_fusion(
                    dfs, pk_col, k=step.get("k", 60), limit=step.get("limit", 1 << 30)
                )
            elif how == "weighted":
                cur = weighted_fusion(
                    dfs,
                    step["metrics"],
                    step["weights"],
                    pk_col,
                    limit=step.get("limit", 1 << 30),
                    norm_score=step.get("norm_score", True),
                )
            else:
                raise ValueError(f"unknown merge {how}")
            continue
        if cur is None:
            raise ValueError("chain with multiple inputs must start with merge")
        if op == "filter":
            cur = cur.filter(compile_expr(step["expr"], cur.schema))
        elif op == "map":
            cur = cur.withColumn(step["name"], compile_expr(step["expr"], cur.schema))
        elif op == "select":
            cur = cur.select(*step["cols"])
        elif op == "sort":
            cur = cur.orderBy(
                *[F.col(c).asc() if asc else F.col(c).desc() for c, asc in step["by"]]
            )
        elif op == "group_by":
            # whitelisted aggregate ops only: chain specs are JSON-able
            # client input, so a bare getattr(F, fn) would hand them
            # arbitrary functions (fn="expr" → unrestricted SQL)
            _AGGS = {
                "count": F.count, "sum": F.sum, "avg": F.avg,
                "min": F.min, "max": F.max, "first": F.first, "last": F.last,
            }
            aggs = []
            for out, (fn, col) in step["aggs"].items():
                if fn not in _AGGS:
                    raise ValueError(f"unknown aggregate {fn!r} (use {sorted(_AGGS)})")
                aggs.append(_AGGS[fn](col).alias(out))
            cur = cur.groupBy(*step["keys"]).agg(*aggs)
        elif op == "limit":
            per = step.get("per")
            n = int(step["n"])
            if per:
                order = step.get("order_by") or [["score", False], [pk_col, True]]
                w = W.partitionBy(*per).orderBy(
                    *[F.col(c).asc() if asc else F.col(c).desc() for c, asc in order]
                )
                cur = (
                    cur.withColumn("__rn", F.row_number().over(w))
                    .filter(F.col("__rn") <= n)
                    .drop("__rn")
                )
            else:
                cur = cur.limit(n)
        else:
            raise ValueError(f"unknown chain op {op}")
    assert cur is not None
    return cur
