"""VARCHAR primary keys (the reference's second pk type — schema.proto
allows Int64 or VarChar primary fields; every client testcase file has a
string-pk variant). The exact-scan serve paths — search (plain, filtered,
range, grouping, hybrid), query, requery, insert/upsert/delete — carry
string pks untouched; materialized index builds refuse precisely (their
artifacts version-mask [pk, bound] pairs over INT64 ids)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


def _client(spark, tmp_path):
    from milvus_spark.client import MilvusSparkClient

    return MilvusSparkClient(spark, root=str(tmp_path))


def _fresh(c, spark, sf_dir, nm):
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    d = emb.select(
        F.concat(F.lit("doc_"), F.col("vec_id")).alias("pk"), "embedding", "label"
    )
    c.create_collection(nm, pk_field="pk", vector_field="embedding", metric_type="COSINE")
    c.insert(nm, d)
    return [
        list(map(float, r.embedding))
        for r in emb.orderBy("vec_id").limit(2).collect()
    ]


def test_varchar_pk_search_matches_long_pk_ranking(spark, sf_dir, tmp_path):
    """The string-pk search returns the same (vector, score) ranking as
    the long-pk collection, with pks mapped doc_<id>; requery joins the
    output fields on the string key."""
    c = _client(spark, tmp_path)
    qs = _fresh(c, spark, sf_dir, "vs")
    out = c.search("vs", qs, limit=5, output_fields=["label"]).collect()
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    c.create_collection("vl", pk_field="vec_id", vector_field="embedding", metric_type="COSINE")
    c.insert("vl", emb.select("vec_id", "embedding", "label"))
    ref = c.search("vl", qs, limit=5, output_fields=["label"]).collect()
    got = sorted((r.qid, r.pk, round(r.score, 4), r.label) for r in out)
    want = sorted((r.qid, f"doc_{r.vec_id}", round(r.score, 4), r.label) for r in ref)
    # ranking may differ ONLY at score ties (string vs numeric tie-break);
    # the (pk, score) hit sets must agree where scores are unique
    assert {(q, p, s) for q, p, s, _ in got} == {(q, p, s) for q, p, s, _ in want}
    assert {g[3] for g in got} == {w[3] for w in want}


def test_varchar_pk_dml_lifecycle(spark, sf_dir, tmp_path):
    c = _client(spark, tmp_path)
    _fresh(c, spark, sf_dir, "vd")
    n0 = c.query("vd", filter="true", output_fields=["pk"]).count()
    c.delete("vd", filter="pk == 'doc_3'")
    assert c.query("vd", filter="true", output_fields=["pk"]).count() == n0 - 1
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    up = (
        emb.filter(F.col("vec_id") == 5)
        .select(
            F.concat(F.lit("doc_"), F.col("vec_id")).alias("pk"),
            "embedding", F.lit(99).alias("label"),
        )
    )
    c.upsert("vd", up)
    assert c.query("vd", filter="pk == 'doc_5'", output_fields=["label"]).collect()[0].label == 99


def test_varchar_pk_grouping_and_hybrid(spark, sf_dir, tmp_path):
    c = _client(spark, tmp_path)
    qs = _fresh(c, spark, sf_dir, "vg")
    g = c.search("vg", qs, limit=3, group_by_field="label", group_size=2)
    rows = g.collect()
    assert rows and all(isinstance(r.pk, str) for r in rows)
    h = c.hybrid_search(
        "vg",
        [{"data": qs, "limit": 5}, {"data": qs, "limit": 5}],
        limit=5,
    )
    hr = h.collect()
    assert hr and all(isinstance(r.pk, str) for r in hr)


@pytest.mark.parametrize("itype", ["IVF_FLAT", "HNSW", "IVF_PQ", "MINHASH_LSH"])
def test_varchar_pk_index_build_refuses(spark, sf_dir, tmp_path, itype):
    c = _client(spark, tmp_path)
    _fresh(c, spark, sf_dir, "vr")
    with pytest.raises(ValueError, match="VARCHAR primary-key"):
        c.create_index("vr", "embedding", itype)
