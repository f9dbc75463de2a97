"""FAISS index-factory alias (r11 —
tests/python_client/testcases/indexes/idx_faiss.py): the factory string
maps onto the engine's equivalent layouts (FMINDEX's alias pattern),
faiss search-param spellings normalize onto the engine knobs, and numeric
search params refuse non-numbers with the reference's message."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


def _client(spark, tmp_path):
    from milvus_spark.client import MilvusSparkClient

    return MilvusSparkClient(spark, root=str(tmp_path))


def _fresh(c, spark, sf_dir, nm, metric="COSINE"):
    e = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    c.create_collection(
        nm, pk_field="vec_id", vector_field="embedding", metric_type=metric
    )
    c.insert(nm, e.select("vec_id", "embedding"))
    return [list(map(float, r.embedding)) for r in e.orderBy("vec_id").limit(2).collect()]


def _brute(c, nm, qs, metric="COSINE"):
    from milvus_spark.operators.knn import brute_force_search

    return brute_force_search(
        c._read(nm), [(i, q) for i, q in enumerate(qs)],
        "embedding", "vec_id", metric=metric, k=5,
    )


@pytest.mark.parametrize(
    "spec,maps_to,searchable,sp",
    [
        ("Flat", ["FLAT"], True, {}),
        ("IVF8,Flat", ["IVF_FLAT"], True, {"nprobe": "8"}),
        ("HNSW16,Flat", ["HNSW"], True, {"efSearch": 10**6}),
        ("OPQ16,IVF8,PQ16x4", ["IVF_PQ"], True, {"nprobe": 8}),
        ("IVF8,PQ16x4,RFlat", ["IVF_PQ"], True, {"nprobe": 8, "k_factor": 200}),
        ("PQ16x4", ["IVF_PQ"], False, {}),
    ],
)
def test_faiss_factory_shapes(spark, sf_dir, tmp_path, spec, maps_to, searchable, sp):
    c = _client(spark, tmp_path)
    nm = "fx"
    qs = _fresh(c, spark, sf_dir, nm)
    ent = c.create_index(nm, "embedding", "FAISS", {"faiss_index_name": spec})
    assert ent["maps_to"] == maps_to and ent["searchable"] is searchable
    got = c.search(nm, qs, limit=5, search_params=sp)
    g = [(r.qid, r.vec_id, round(r.score, 4)) for r in got.collect()]
    # exhaustive regimes (full nprobe / efSearch / k_factor-covered
    # shortlist) are exact; PQ-only is unsearchable and serves FLAT
    b = [(r.qid, r.vec_id, round(r.score, 4)) for r in _brute(c, nm, qs).collect()]
    assert g == b, spec
    # drop fans out to the mapped layouts
    c.drop_index(nm, "embedding", "FAISS")
    assert not c._meta(nm).get("indexes")
    c.drop_collection(nm)


def test_faiss_factory_refusals_and_param_coercion(spark, sf_dir, tmp_path):
    c = _client(spark, tmp_path)
    qs = _fresh(c, spark, sf_dir, "fr")
    with pytest.raises(ValueError, match="faiss_index_name"):
        c.create_index("fr", "embedding", "FAISS", {})
    with pytest.raises(ValueError, match="invalid faiss_index_name"):
        c.create_index("fr", "embedding", "FAISS", {"faiss_index_name": "LSH99,Flat"})
    c.create_index("fr", "embedding", "FAISS", {"faiss_index_name": "IVF8,Flat"})
    # numeric strings coerce; non-numbers refuse with the reference message
    assert c.search("fr", qs, limit=5, search_params={"nprobe": "8"}).count() == 10
    with pytest.raises(ValueError, match="expects a number"):
        c.search("fr", qs, limit=5, search_params={"nprobe": "invalid"})
    with pytest.raises(ValueError, match="expects a number"):
        c.search("fr", qs, limit=5, search_params={"efSearch": "invalid"})
    with pytest.raises(ValueError, match="expects a number"):
        c.search("fr", qs, limit=5, search_params={"k_factor": "invalid"})
    c.drop_collection("fr")


def test_faiss_bflat_binary(spark, sf_dir, tmp_path):
    """BFlat maps to BIN_FLAT — the exact packed-byte hamming scan."""
    c = _client(spark, tmp_path)
    rows = [[i, bytes([i % 256, (i * 7) % 256]).hex()] for i in range(64)]
    df = spark.createDataFrame(rows, "vec_id long, bv string").select(
        "vec_id", F.unhex("bv").alias("bv")
    )
    bv = df.select("vec_id", F.transform(F.split(F.hex("bv"), "(?<=\\G..)"),
        lambda x: F.conv(x, 16, 10).cast("double")).alias("bv"))
    c.create_collection("fb", pk_field="vec_id", vector_field="bv", metric_type="HAMMING")
    c.insert("fb", bv.filter(F.size("bv") == 2))
    ent = c.create_index("fb", "bv", "FAISS", {"faiss_index_name": "BFlat"})
    assert ent["maps_to"] == ["BIN_FLAT"] and ent["searchable"]
    c.drop_collection("fb")
