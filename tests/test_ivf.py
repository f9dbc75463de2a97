"""IVF ANN: recall@10 ≥ 0.95 vs brute force (the reference's ANN correctness
contract — BASELINE.md vector-ops row), and partition pruning at the scan."""

from __future__ import annotations

import shutil
import tempfile

import numpy as np
import pytest
from pyspark.sql import functions as F

from milvus_spark.operators.ivf import build_centroids, ivf_search, l2_normalize, write_clustered
from milvus_spark.operators.knn import brute_force_search


@pytest.fixture(scope="module")
def clustered(spark, sf_dir):
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    # COSINE collection → spherical k-means over normalized vectors
    norm = l2_normalize(emb, "embedding")
    cents = build_centroids(norm, "embedding", k=16, seed=42)
    path = tempfile.mkdtemp(prefix="ivf_", dir="/root/repo/_scratch")
    shutil.rmtree(path)
    write_clustered(norm, "embedding", cents, path)
    yield emb, norm, cents, path
    shutil.rmtree(path, ignore_errors=True)


def test_ivf_recall(spark, clustered):
    emb, norm, cents, path = clustered
    qrows = norm.filter(F.col("vec_id") < 8).collect()
    queries = [(r.vec_id, list(r.embedding)) for r in qrows]

    exact = brute_force_search(emb, queries, "embedding", "vec_id", metric="COSINE", k=10)
    truth = {}
    for r in exact.collect():
        truth.setdefault(r.qid, set()).add(r.vec_id)

    approx = ivf_search(
        spark, path, cents, queries, "embedding", "vec_id",
        metric="COSINE", k=10, nprobe=12,
    )
    got = {}
    for r in approx.collect():
        got.setdefault(r.qid, set()).add(r.vec_id)

    recalls = [len(got.get(q, set()) & truth[q]) / len(truth[q]) for q in truth]
    assert np.mean(recalls) >= 0.95, f"recall {np.mean(recalls):.3f} ({recalls})"


def test_partition_pruning(spark, clustered):
    _, _, cents, path = clustered
    corpus = spark.read.parquet(path)
    plan = corpus.filter(F.col("cluster_id").isin([1, 2, 3]))._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "cluster_id" in plan
    # pruned scan reads fewer files than the full corpus
    full_parts = corpus.rdd.getNumPartitions()
    pruned_parts = corpus.filter(F.col("cluster_id").isin([1, 2, 3])).rdd.getNumPartitions()
    assert pruned_parts <= full_parts
