"""Auto-refresh policy (r9 — the r8 verdict's #6 ask): the seal-policy
analog (component_param.go:5605-5630 — the reference seals AND indexes by
size policy). An index created with auto_refresh_rows=N refreshes itself
once post-build ingest reaches N rows, so the sealed+growing serving
path's exact-scanned delta never grows unboundedly between manual
refreshes. Oracle-exact at every step (exhaustive-ef searches vs the
brute-force cosine truth)."""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F


def _truth(emb_rows, q, k=10):
    qv = np.asarray(q) / np.linalg.norm(q)
    cos = {
        r.vec_id: float(
            np.dot(np.asarray(r.embedding) / np.linalg.norm(r.embedding), qv)
        )
        for r in emb_rows
    }
    return set(sorted(cos, key=lambda i: (-round(cos[i], 12), i))[:k])


def test_auto_refresh_fires_past_threshold(spark, sf_dir, tmp_path):
    from milvus_spark.client import MilvusSparkClient

    client = MilvusSparkClient(spark, root=str(tmp_path))
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    client.create_collection("ar", pk_field="vec_id", vector_field="embedding")
    client.insert("ar", emb.filter(F.col("vec_id") % 3 == 0))
    client.create_index(
        "ar", "embedding", "HNSW", {"M": 8, "auto_refresh_rows": 300}
    )
    q = [emb.filter(F.col("vec_id") == 0).first().embedding]

    # batch 1 (~167 rows): below threshold — the index goes stale and the
    # pending counter accumulates, serving rides the sealed+growing merge
    client.insert("ar", emb.filter(F.col("vec_id") % 3 == 1))
    entry = client.describe_index("ar", "embedding", "HNSW")
    assert client._fresh_index("ar", "embedding", "HNSW") is None
    assert 0 < entry["pending_rows"] < 300
    vis = emb.filter(F.col("vec_id") % 3 != 2).collect()
    got = client.search("ar", q, limit=10, search_params={"ef": 10**6}).collect()
    assert {r.vec_id for r in got} == _truth(vis, q[0])

    # batch 2 (~167 rows): crosses the threshold — refresh fires inside
    # insert(), serving flips back to pure epoch search (fresh index)
    client.insert("ar", emb.filter(F.col("vec_id") % 3 == 2))
    entry = client.describe_index("ar", "embedding", "HNSW")
    assert entry["pending_rows"] == 0
    assert client._fresh_index("ar", "embedding", "HNSW") is not None
    assert entry.get("epochs"), "refresh should have appended an epoch"
    got = client.search("ar", q, limit=10, search_params={"ef": 10**6}).collect()
    assert {r.vec_id for r in got} == _truth(emb.collect(), q[0])
    client.drop_collection("ar")


def test_auto_refresh_refusal_keeps_stale_fallback(spark, sf_dir, tmp_path):
    """A refused refresh shape (duplicate insert of a LIVE pk without a
    delete) leaves the pending counter and the stale index in place — the
    manual contract's stale fallback, now under the policy. Search stays
    exact via the fallback paths."""
    from milvus_spark.client import MilvusSparkClient

    client = MilvusSparkClient(spark, root=str(tmp_path))
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    client.create_collection("arf", pk_field="vec_id", vector_field="embedding")
    client.insert("arf", emb.filter(F.col("vec_id") < 400))
    client.create_index(
        "arf", "embedding", "HNSW", {"M": 8, "auto_refresh_rows": 10}
    )
    # duplicate-insert a live pk: past the threshold, but refresh refuses
    client.insert("arf", emb.filter(F.col("vec_id") < 50))
    entry = client.describe_index("arf", "embedding", "HNSW")
    assert entry["pending_rows"] >= 10  # counter kept: refresh refused
    assert client._fresh_index("arf", "embedding", "HNSW") is None
    q = [emb.filter(F.col("vec_id") == 1).first().embedding]
    got = client.search("arf", q, limit=5, search_params={"ef": 10**6}).collect()
    assert got[0].vec_id == 1
    client.drop_collection("arf")
