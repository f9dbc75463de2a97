"""Rerank operators: model-rerank stub plan shape, decay/boost math, chain ops."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from milvus_spark.operators.chain import apply_chain
from milvus_spark.operators.hybrid import decay_factor, model_rerank, normalize_score


def test_model_rerank(spark, sf_dir):
    from milvus_spark.operators.embedding import with_text_embedding
    from milvus_spark.operators.knn import brute_force_search

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(100)
    emb = with_text_embedding(docs, "text").select("doc_id", "embedding").cache()
    q = emb.filter("doc_id = 0").collect()[0].embedding
    topk = brute_force_search(emb, [(0, list(q))], "embedding", "doc_id", metric="COSINE", k=20)
    rr = model_rerank(topk, docs, "doc_id", "text", query_text="spark merge join", limit=5)
    rows = rr.collect()
    assert 0 < len(rows) <= 5
    assert [r.rank for r in sorted(rows, key=lambda r: r.rank)] == list(range(1, len(rows) + 1))
    # rerank scores are non-increasing with rank
    ordered = sorted(rows, key=lambda r: r.rank)
    assert all(a.rerank_score >= b.rerank_score for a, b in zip(ordered, ordered[1:]))
    # plan keeps the corpus out of the rerank (broadcast candidate side)
    plan = rr._jdf.queryExecution().executedPlan().toString()
    assert "Broadcast" in plan


def test_decay_math(spark):
    df = spark.range(1).select(
        decay_factor(F.lit(0.0), "gauss", origin=0.0, scale=10.0, offset=0.0, decay=0.5).alias("at0"),
        decay_factor(F.lit(10.0), "gauss", origin=0.0, scale=10.0, offset=0.0, decay=0.5).alias("at_scale"),
        decay_factor(F.lit(5.0), "exp", origin=0.0, scale=5.0, offset=0.0, decay=0.5).alias("exp_at_scale"),
        decay_factor(F.lit(3.0), "linear", origin=0.0, scale=6.0, offset=0.0, decay=0.4).alias("lin_half"),
    ).collect()[0]
    assert abs(df.at0 - 1.0) < 1e-9
    assert abs(df.at_scale - 0.5) < 1e-9  # decay reached exactly at scale
    assert abs(df.exp_at_scale - 0.5) < 1e-9
    assert abs(df.lin_half - 0.7) < 1e-9  # halfway to scale with decay 0.4


def test_normalize_score_ranges(spark):
    row = spark.range(1).select(
        normalize_score(F.lit(1.0), "COSINE").alias("cos_hi"),
        normalize_score(F.lit(-1.0), "COSINE").alias("cos_lo"),
        normalize_score(F.lit(1000.0), "IP").alias("ip_hi"),
        normalize_score(F.lit(0.0), "L2").alias("l2_zero"),
        normalize_score(F.lit(1e9), "L2").alias("l2_far"),
    ).collect()[0]
    assert row.cos_hi == 1.0 and row.cos_lo == 0.0
    assert 0.99 < row.ip_hi <= 1.0
    assert row.l2_zero == 1.0 and 0.0 <= row.l2_far < 0.01


def test_chain_group_by_and_errors(spark):
    df = spark.createDataFrame(
        [(0, 1, 0.9), (0, 2, 0.8), (1, 1, 0.7)], ["qid", "pk", "score"]
    )
    out = apply_chain(
        [df],
        [{"op": "group_by", "keys": ["qid"], "aggs": {"best": ("max", "score")}}],
    ).collect()
    assert {(r.qid, r.best) for r in out} == {(0, 0.9), (1, 0.7)}
    with pytest.raises(ValueError):
        apply_chain([df, df], [{"op": "filter", "expr": "score > 0"}])
    with pytest.raises(ValueError):
        apply_chain([df], [{"op": "nope"}])
