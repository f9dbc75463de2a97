"""ARRAY-field operators: contains family, length, element filtering and
quantified element match over array-of-struct columns.

Reference parity (file:line into /root/reference):
  - array_contains / _all / _any, array_length on ARRAY fields:
    JSONContainsExpr pkg/proto/plan.proto:168,
    internal/core/src/exec/expression/JsonContainsExpr.cpp.
  - ElementFilterExpr (per-element predicate on array-of-struct):
    plan.proto:264, ElementFilterBitsNode.cpp, IterativeElementFilterNode.cpp.
  - MatchExpr quantifiers match_all/any/least: plan.proto:279, MatchExpr.cpp
    (472) — `forall`, `exists`, `size(filter(..)) >= n` here.
  - Struct-array building mirrors VECTOR_ARRAY/ROW types (Types.h:58).

Scale notes: the array build is one groupBy shuffle on the parent key
(map-side partial collect_list); every quantifier after that is a map-side
higher-order function inside codegen. Oracles verify semantics from the flat
table — the engine's arrays must agree with relational recomputation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from milvus_spark.operators.text import tokens
from milvus_spark.registry import register
from milvus_spark.session import load_table


# --- array_contains family over token arrays ----------------------------------
@register(
    "arr_contains_family",
    oracle="""
    WITH t AS (
      SELECT doc_id,
             list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'), x -> x <> '') AS toks
      FROM documents
    )
    SELECT doc_id,
           list_contains(toks, 'spark') AS has_spark,
           len(list_intersect(list_distinct(toks), ['join', 'merge'])) > 0 AS has_any,
           len(list_filter(['table', 'query'], w -> NOT list_contains(toks, w))) = 0 AS has_all,
           CAST(len(toks) AS BIGINT) AS arr_len
    FROM t
    WHERE list_contains(toks, 'spark')
    """,
)
def arr_contains_family(spark: SparkSession, sf: str) -> DataFrame:
    d = load_table(spark, sf, "documents").withColumn("toks", tokens(F.col("text")))
    has_spark = F.array_contains("toks", "spark")
    has_any = F.arrays_overlap(F.array_distinct("toks"), F.array(F.lit("join"), F.lit("merge")))
    has_all = F.size(F.array_except(F.array(F.lit("table"), F.lit("query")), F.col("toks"))) == 0
    return d.filter(has_spark).select(
        "doc_id",
        has_spark.alias("has_spark"),
        has_any.alias("has_any"),
        has_all.alias("has_all"),
        F.size("toks").cast("long").alias("arr_len"),
    )


# --- element_filter on array-of-struct (order line items) ---------------------
@register(
    "arr_element_filter",
    oracle="""
    SELECT l_orderkey,
           CAST(sum(CASE WHEN l_quantity > 45 AND l_discount > 0.08 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_match
    FROM lineitem
    GROUP BY l_orderkey
    HAVING sum(CASE WHEN l_quantity > 45 AND l_discount > 0.08 THEN 1 ELSE 0 END) >= 2
    """,
)
def arr_element_filter(spark: SparkSession, sf: str) -> DataFrame:
    """element_filter(items, $[quantity] > 45 && $[discount] > 0.08) with a
    match_least(2) quantifier, over per-order arrays of line-item structs."""
    li = load_table(spark, sf, "lineitem")
    items = li.groupBy("l_orderkey").agg(
        F.collect_list(F.struct("l_linenumber", "l_quantity", "l_discount")).alias("items")
    )
    matched = F.filter(
        "items", lambda x: (x["l_quantity"] > 45) & (x["l_discount"] > 0.08)
    )
    return (
        items.withColumn("n_match", F.size(matched).cast("long"))
        .filter(F.col("n_match") >= 2)
        .select("l_orderkey", "n_match")
    )


# --- match_all / match_any quantifiers ----------------------------------------
@register(
    "arr_match_quantifiers",
    oracle="""
    SELECT l_orderkey,
           (count(*) = sum(CASE WHEN l_discount <= 0.08 THEN 1 ELSE 0 END)) AS all_low_disc,
           (sum(CASE WHEN l_quantity >= 48 THEN 1 ELSE 0 END) > 0) AS any_heavy,
           CAST(count(*) AS BIGINT) AS n_items
    FROM lineitem
    GROUP BY l_orderkey
    HAVING sum(CASE WHEN l_quantity >= 48 THEN 1 ELSE 0 END) > 0
       AND count(*) = sum(CASE WHEN l_discount <= 0.08 THEN 1 ELSE 0 END)
    """,
)
def arr_match_quantifiers(spark: SparkSession, sf: str) -> DataFrame:
    """match_all(items, discount <= 0.08) && match_any(items, quantity >= 48)
    via forall/exists higher-order functions on the struct arrays."""
    li = load_table(spark, sf, "lineitem")
    items = li.groupBy("l_orderkey").agg(
        F.collect_list(F.struct("l_quantity", "l_discount")).alias("items")
    )
    all_low = F.forall("items", lambda x: x["l_discount"] <= 0.08)
    any_heavy = F.exists("items", lambda x: x["l_quantity"] >= 48)
    return (
        items.filter(all_low & any_heavy)
        .select(
            "l_orderkey",
            all_low.alias("all_low_disc"),
            any_heavy.alias("any_heavy"),
            F.size("items").cast("long").alias("n_items"),
        )
    )


# --- element_filter / MATCH_* through the filter-expression LANGUAGE ----------
@register(
    "arr_expr_element_filter",
    oracle="""
    SELECT l_orderkey, CAST(count(*) AS BIGINT) AS n_items
    FROM lineitem
    GROUP BY l_orderkey
    HAVING l_orderkey % 3 = 0
       AND sum(CASE WHEN l_quantity > 45 AND l_discount > 0.08 THEN 1 ELSE 0 END) > 0
    """,
)
def arr_expr_element_filter(spark: SparkSession, sf: str) -> DataFrame:
    """The same element_filter semantics as arr_element_filter, but entered
    through the filter-expression STRING — ``doc_pred &&
    element_filter(items, $[f] ...)`` — exactly the surface a Milvus client
    sends (planparserv2 plan_parser_v2_test.go:3651-3669; ElementFilterExpr
    plan.proto:264 splits into doc predicate + per-element predicate,
    query/PlanProto.cpp:638-690). Compiles to exists() over the struct array,
    fully inside codegen."""
    from milvus_spark.plans.expr import apply_filter

    li = load_table(spark, sf, "lineitem")
    items = li.groupBy("l_orderkey").agg(
        F.collect_list(F.struct("l_quantity", "l_discount")).alias("items")
    )
    out = apply_filter(
        items,
        "l_orderkey % 3 == 0 && "
        "element_filter(items, $[l_quantity] > 45 && $[l_discount] > 0.08)",
    )
    return out.select("l_orderkey", F.size("items").cast("long").alias("n_items"))


@register(
    "arr_expr_match_quantifiers",
    oracle="""
    SELECT l_orderkey,
           CAST(count(*) AS BIGINT) AS n_items,
           (sum(CASE WHEN l_tax = 0.0 THEN 1 ELSE 0 END) = 1) AS one_taxfree
    FROM lineitem
    GROUP BY l_orderkey
    HAVING sum(CASE WHEN l_quantity >= 40 THEN 1 ELSE 0 END) >= 3
       AND sum(CASE WHEN l_discount > 0.05 THEN 1 ELSE 0 END) <= 2
    """,
)
def arr_expr_match_quantifiers(spark: SparkSession, sf: str) -> DataFrame:
    """MATCH_LEAST / MATCH_MOST as a filter string and MATCH_EXACT as a
    projected boolean — the five-quantifier MatchExpr family entered through
    the expression language (plan.proto:279; kernel counting semantics
    MatchExpr.cpp:102-113: least ≥, most ≤, exact =, with only valid
    elements counted). size(filter(...)) keeps the count map-side."""
    from milvus_spark.plans.expr import apply_filter, compile_expr

    li = load_table(spark, sf, "lineitem")
    items = li.groupBy("l_orderkey").agg(
        F.collect_list(F.struct("l_quantity", "l_discount", "l_tax")).alias("items")
    )
    out = apply_filter(
        items,
        "MATCH_LEAST(items, $[l_quantity] >= 40, threshold=3) && "
        "MATCH_MOST(items, $[l_discount] > 0.05, threshold=2)",
    )
    exact = compile_expr(
        "MATCH_EXACT(items, $[l_tax] == 0.0, threshold=1)", out.schema
    )
    return out.select(
        "l_orderkey",
        F.size("items").cast("long").alias("n_items"),
        exact.alias("one_taxfree"),
    )


# --- struct-array sub-field projection (structA[sub] as an array) -------------
@register(
    "arr_struct_subfield",
    oracle="""
    SELECT l_orderkey,
           CAST(count(*) AS BIGINT) AS n_items,
           (sum(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END) > 0) AS has_return
    FROM lineitem
    GROUP BY l_orderkey
    HAVING count(*) <= 3
       AND sum(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END) > 0
    """,
)
def arr_struct_subfield(spark: SparkSession, sf: str) -> DataFrame:
    """Sub-field projection through the filter LANGUAGE —
    ``array_contains(items[l_returnflag], "R") && array_length(items[l_quantity])
    <= 3`` treats a struct-array sub-field as the array of its per-element
    values (PR #47172, struct_array_element_query.py:181-370; Catalyst
    GetArrayStructFields — a map-side projection, no explode)."""
    from milvus_spark.plans.expr import apply_filter, compile_expr

    li = load_table(spark, sf, "lineitem")
    items = li.groupBy("l_orderkey").agg(
        F.collect_list(F.struct("l_quantity", "l_returnflag")).alias("items")
    )
    out = apply_filter(
        items,
        'array_contains(items[l_returnflag], "R") && array_length(items[l_quantity]) <= 3',
    )
    has_ret = compile_expr('array_contains(items[l_returnflag], "R")', out.schema)
    return out.select(
        "l_orderkey",
        F.size("items").cast("long").alias("n_items"),
        has_ret.alias("has_return"),
    )


# --- chain-based rerank (function-chain IR → DataFrame ops) -------------------
@register(
    "vec_chain_rerank",
    oracle=f"""
    WITH q AS (SELECT vec_id AS qid, CAST(embedding AS DOUBLE[]) AS qv
               FROM embeddings WHERE vec_id < 4),
    s1 AS (
      SELECT qid, vec_id, score,
             row_number() OVER (PARTITION BY qid ORDER BY score DESC, vec_id) AS rank
      FROM (SELECT q.qid, e.vec_id,
                   round(list_cosine_similarity(CAST(e.embedding AS DOUBLE[]), q.qv), 4) AS score
            FROM embeddings e, q)
    ),
    s2 AS (
      SELECT qid, vec_id, score,
             row_number() OVER (PARTITION BY qid ORDER BY score ASC, vec_id) AS rank
      FROM (SELECT q.qid, e.vec_id,
                   round(list_distance(CAST(e.embedding AS DOUBLE[]), q.qv)^2, 4) AS score
            FROM embeddings e, q)
    ),
    fused AS (
      SELECT qid, vec_id, round(sum(1.0 / (60 + rank)), 4) AS score
      FROM (SELECT qid, vec_id, rank FROM s1 WHERE rank <= 20
            UNION ALL SELECT qid, vec_id, rank FROM s2 WHERE rank <= 20)
      GROUP BY qid, vec_id
    ),
    mapped AS (
      SELECT qid, vec_id, score, round(score * 100, 4) AS pct
      FROM fused WHERE score > 0.02
    )
    SELECT qid, vec_id, score, pct FROM (
      SELECT qid, vec_id, score, pct,
             row_number() OVER (PARTITION BY qid ORDER BY pct DESC, vec_id) AS rn
      FROM mapped
    ) WHERE rn <= 5
    """,
)
def vec_chain_rerank(spark: SparkSession, sf: str) -> DataFrame:
    from milvus_spark.operators.chain import apply_chain
    from milvus_spark.operators.knn import brute_force_search, queries_from_table

    emb = load_table(spark, sf, "embeddings")
    qs = queries_from_table(emb, "vec_id", "embedding", F.col("vec_id") < 4)
    r1 = brute_force_search(emb, qs, "embedding", "vec_id", metric="COSINE", k=20)
    r2 = brute_force_search(emb, qs, "embedding", "vec_id", metric="L2", k=20)
    spec = [
        {"op": "merge", "how": "rrf", "k": 60},
        {"op": "filter", "expr": "score > 0.02"},
        {"op": "map", "name": "pct", "expr": "score * 100"},
        {"op": "select", "cols": ["qid", "vec_id", "score", "pct"]},
        {"op": "limit", "n": 5, "per": ["qid"], "order_by": [["pct", False], ["vec_id", True]]},
    ]
    out = apply_chain([r1, r2], spec, pk_col="vec_id")
    return out.select("qid", "vec_id", "score", F.round("pct", 4).alias("pct"))
