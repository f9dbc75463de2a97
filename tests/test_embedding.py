"""Embedding ingest function: deterministic provider, Arrow batching, shape."""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from milvus_spark.operators.embedding import DIM, with_text_embedding


def test_embedding_function(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(20)
    out = with_text_embedding(docs, "text")
    rows = out.select("doc_id", "embedding").orderBy("doc_id").collect()
    assert all(len(r.embedding) == DIM for r in rows)
    # unit-normalized
    norms = [float(np.linalg.norm(r.embedding)) for r in rows]
    assert all(abs(n - 1.0) < 1e-3 for n in norms)
    # deterministic across re-ingest
    again = with_text_embedding(docs, "text").select("doc_id", "embedding").orderBy("doc_id").collect()
    assert [r.embedding for r in rows] == [r.embedding for r in again]
    # similar texts → higher cosine than dissimilar (sanity of the fake)
    a, b = np.array(rows[0].embedding), np.array(rows[1].embedding)
    assert abs(float(a @ b)) < 1.0


def test_embedding_searchable(spark, sf_dir):
    """Ingest-then-search roundtrip: embed docs, search with a doc's own
    embedding, expect itself as top hit (COSINE=1)."""
    from milvus_spark.operators.knn import brute_force_search

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(50)
    emb = with_text_embedding(docs, "text").select("doc_id", "embedding").cache()
    q = emb.filter(F.col("doc_id") == 3).collect()[0].embedding
    res = brute_force_search(emb, [(3, list(q))], "embedding", "doc_id", metric="COSINE", k=3)
    top = res.filter(F.col("rank") == 1).collect()[0]
    assert top.doc_id == 3 and abs(top.score - 1.0) < 1e-3
