"""GPU index family parity aliases (client/index/gpu.go;
indexparamcheck/cagra_checker_test.go + raft_*_checker_test.go).

No GPU exists in a Spark executor, so GPU_BRUTE_FORCE / GPU_IVF_FLAT /
GPU_IVF_PQ / GPU_CAGRA validate their build params under the reference's
GPU checker contract and then map onto the engine's equivalent CPU
layouts (the FMINDEX/FAISS alias pattern). The checker matrix rows below
are pinned one-for-one from the reference tests."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


def _client(spark, tmp_path):
    from milvus_spark.client import MilvusSparkClient

    return MilvusSparkClient(spark, root=str(tmp_path))


def _fresh(c, spark, sf_dir, nm, metric="L2"):
    e = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    c.create_collection(
        nm, pk_field="vec_id", vector_field="embedding", metric_type=metric
    )
    c.insert(nm, e.select("vec_id", "embedding"))
    return [
        list(map(float, r.embedding))
        for r in e.orderBy("vec_id").limit(2).collect()
    ]


# ---------------- CAGRA checker matrix (cagra_checker_test.go p1-p14) ---------


@pytest.mark.parametrize(
    "params,ok",
    [
        ({}, True),  # p1: L2, defaults
        ({"intermediate_graph_degree": 20}, True),  # p3
        ({"graph_degree": 20}, True),  # p4
        ({"intermediate_graph_degree": 60, "graph_degree": 20}, True),  # p5
        ({"intermediate_graph_degree": 20, "graph_degree": 60}, False),  # p6
        ({"intermediate_graph_degree": "error", "graph_degree": 20}, False),  # p8
        ({"intermediate_graph_degree": 20, "graph_degree": "error"}, False),  # p9
        ({"build_algo": "IVF_PQ"}, True),  # p11
        ({"build_algo": "NN_DESCENT"}, True),  # constraints.go:77
        ({"build_algo": "HNSW"}, False),  # p12
        ({"cache_dataset_on_device": "false"}, True),  # p13
        ({"cache_dataset_on_device": "False"}, False),  # p14: strict lowercase
    ],
)
def test_cagra_checker_matrix(spark, sf_dir, tmp_path, params, ok):
    c = _client(spark, tmp_path)
    _fresh(c, spark, sf_dir, "cg", metric="L2")
    p = dict(params)
    p.setdefault("graph_degree", p.get("graph_degree", 8))
    if not isinstance(p.get("graph_degree"), str):
        p["graph_degree"] = p.get("graph_degree", 8)
    if ok:
        ent = c.create_index("cg", "embedding", "GPU_CAGRA", p)
        assert ent["maps_to"] == ["HNSW"]
    else:
        with pytest.raises(ValueError):
            c.create_index("cg", "embedding", "GPU_CAGRA", p)


@pytest.mark.parametrize("metric,ok", [("L2", True), ("IP", True)])
def test_cagra_metrics_accepted(spark, sf_dir, tmp_path, metric, ok):
    c = _client(spark, tmp_path)
    _fresh(c, spark, sf_dir, "cm", metric=metric)
    ent = c.create_index("cm", "embedding", "GPU_CAGRA", {"graph_degree": 8})
    assert ent["maps_to"] == ["HNSW"]


@pytest.mark.parametrize(
    "itype", ["GPU_CAGRA", "GPU_BRUTE_FORCE", "GPU_IVF_FLAT", "GPU_IVF_PQ"]
)
@pytest.mark.parametrize(
    "metric", ["COSINE", "HAMMING", "JACCARD", "SUPERSTRUCTURE"]
)
def test_gpu_family_refuses_non_l2_ip(spark, sf_dir, tmp_path, itype, metric):
    # raft/cagra checkers: every GPU type accepts ONLY L2/IP (COSINE is
    # refused too — raft_ivf_flat_checker_test.go p3)
    c = _client(spark, tmp_path)
    _fresh(c, spark, sf_dir, "cr", metric="L2")
    with pytest.raises(ValueError, match="not supported"):
        c.create_index(
            "cr", "embedding", itype, {"metric_type": metric, "graph_degree": 8}
        )


@pytest.mark.parametrize("itype", ["GPU_IVF_FLAT", "GPU_IVF_PQ"])
def test_gpu_ivf_nlist_bounds(spark, sf_dir, tmp_path, itype):
    c = _client(spark, tmp_path)
    _fresh(c, spark, sf_dir, "cn", metric="L2")
    for bad in (0, 65537):
        with pytest.raises(ValueError, match="out of range"):
            c.create_index("cn", "embedding", itype, {"nlist": bad})
    with pytest.raises(ValueError, match="expects a number"):
        c.create_index("cn", "embedding", itype, {"nlist": "error"})


# ---------------- serving through the mapped layouts --------------------------


def test_gpu_brute_force_serves_flat_exact(spark, sf_dir, tmp_path):
    c = _client(spark, tmp_path)
    qs = _fresh(c, spark, sf_dir, "gb", metric="L2")
    ent = c.create_index("gb", "embedding", "GPU_BRUTE_FORCE")
    assert ent["maps_to"] == ["FLAT"] and ent["materialized"] is False
    got = c.search("gb", qs, limit=5)
    from milvus_spark.operators.knn import brute_force_search

    b = brute_force_search(
        c._read("gb"), [(i, q) for i, q in enumerate(qs)],
        "embedding", "vec_id", metric="L2", k=5,
    )
    assert [tuple(r) for r in got.collect()] == [tuple(r) for r in b.collect()]


@pytest.mark.parametrize(
    "itype,mapped,sp",
    [
        ("GPU_IVF_FLAT", "IVF_FLAT", {"nprobe": 10**6}),
        ("GPU_CAGRA", "HNSW", {"ef": 10**6}),
    ],
)
def test_gpu_exhaustive_serving_exact(spark, sf_dir, tmp_path, itype, mapped, sp):
    c = _client(spark, tmp_path)
    qs = _fresh(c, spark, sf_dir, "gs", metric="L2")
    ent = c.create_index(
        "gs", "embedding", itype, {"nlist": 8, "graph_degree": 8}
    )
    assert ent["maps_to"] == [mapped]
    assert f"embedding__{mapped}" in c.list_indexes("gs")
    got = c.search("gs", qs, limit=5, search_params=sp)
    from milvus_spark.operators.knn import brute_force_search

    b = brute_force_search(
        c._read("gs"), [(i, q) for i, q in enumerate(qs)],
        "embedding", "vec_id", metric="L2", k=5,
    )
    g = [(r.qid, r.vec_id, round(r.score, 4)) for r in got.collect()]
    e = [(r.qid, r.vec_id, round(r.score, 4)) for r in b.collect()]
    assert g == e
