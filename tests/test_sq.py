"""Scalar quantization (SQ8): code scan + exact refine must hit the
brute-force recall gate (the reference's ANN correctness contract), and
the code table must be 1 byte/dim."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from milvus_spark.operators.knn import brute_force_search
from milvus_spark.operators.sq import encode_sq8, sq8_search, train_sq8


@pytest.fixture(scope="module")
def sq_index(spark, sf_dir):
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    bounds = train_sq8(emb, "embedding", dim=64)
    encoded = encode_sq8(emb, "embedding", "vec_id", bounds).cache()
    encoded.count()
    yield emb, bounds, encoded
    encoded.unpersist()


def test_sq8_recall_with_refine(spark, sq_index):
    emb, bounds, encoded = sq_index
    qrows = emb.filter(F.col("vec_id") < 8).collect()
    queries = [(r.vec_id, list(r.embedding)) for r in qrows]

    exact = brute_force_search(emb, queries, "embedding", "vec_id", metric="L2", k=10)
    truth = {}
    for r in exact.collect():
        truth.setdefault(r.qid, set()).add(r.vec_id)

    approx = sq8_search(
        encoded, emb, bounds, queries, "embedding", "vec_id",
        metric="L2", k=10, shortlist=100,
    )
    got = {}
    for r in approx.collect():
        got.setdefault(r.qid, set()).add(r.vec_id)

    # SQ8's reconstruction error is tiny (range/510 per dim) — expect
    # near-perfect recall, well above the PQ gate
    recalls = [len(got.get(q, set()) & truth[q]) / len(truth[q]) for q in truth]
    assert np.mean(recalls) >= 0.95, f"recall {np.mean(recalls):.3f} ({recalls})"


def test_sq8_code_size_and_bounds(sq_index):
    emb, bounds, encoded = sq_index
    assert bounds.shape == (2, 64)
    assert (bounds[1] >= bounds[0]).all()
    row = encoded.first()
    assert len(row.code) == 64  # 1 byte per dim (4x smaller than fp32)


def test_sq8_ip_metric_finds_large_norm_top1(spark):
    """Regression: IP SQ8 scans need dot-contribution tables with a
    DESCENDING shortlist (see the PQ twin test)."""
    import numpy as np

    from milvus_spark.operators.sq import encode_sq8, sq8_search, train_sq8

    rng = np.random.default_rng(6)
    V = rng.normal(size=(300, 8))
    q = rng.normal(size=8)
    V[17] = 50.0 * (q / np.linalg.norm(q))
    df = spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in enumerate(V)],
        "vec_id long, embedding array<float>",
    )
    bounds = train_sq8(df, "embedding", dim=8)
    enc = encode_sq8(df, "embedding", "vec_id", bounds)
    got = sq8_search(
        enc, df, bounds, [(0, [float(x) for x in q])], "embedding", "vec_id",
        metric="IP", k=5, shortlist=60,
    ).collect()
    assert sorted(got, key=lambda r: r.rank)[0].vec_id == 17
