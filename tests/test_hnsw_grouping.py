"""Grouping search through the HNSW graph (SearchGroupByOperator.cpp runs
GroupBy over the index's candidate iterator): exhaustive-ef exactness vs
the brute grouping kernel, production-beam recall, quota structure, and
the fallback matrix (stale index / range / metric mismatch → brute)."""

from __future__ import annotations

from pyspark.sql import functions as F


def _brute(client, name, qs, **kw):
    from milvus_spark.operators.knn import grouping_search

    return grouping_search(
        client._read(name),
        [(i, list(map(float, v))) for i, v in enumerate(qs)],
        vec_col="embedding",
        pk_col="vec_id",
        group_col="label",
        metric="COSINE",
        limit=3,
        group_size=2,
        **kw,
    )


def _rows(df):
    return sorted(
        (r.qid, r.label, r.vec_id, round(r.score, 4), r.grank) for r in df.collect()
    )


def test_hnsw_grouping_exhaustive_exact(spark, sf_dir, tmp_path):
    from milvus_spark.client import MilvusSparkClient

    client = MilvusSparkClient(spark, root=str(tmp_path))
    e = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    client.create_collection("hg", pk_field="vec_id", vector_field="embedding")
    client.insert("hg", e.select("vec_id", "embedding", "label"))
    client.create_index("hg", "embedding", "HNSW")
    qs = [list(map(float, r.embedding)) for r in e.orderBy("vec_id").limit(3).collect()]
    got = client.search(
        "hg", data=qs, limit=3, group_by_field="label", group_size=2,
        search_params={"ef": 10**6},
    )
    plan = got._jdf.queryExecution().executedPlan().toString()
    assert "FlatMapGroupsInPandas" in plan, "expected the graph-served grouping"
    assert _rows(got) == _rows(_brute(client, "hg", qs))

    # strict mode rides the same path with identical semantics
    got_s = client.search(
        "hg", data=qs, limit=3, group_by_field="label", group_size=2,
        strict_group_size=True, search_params={"ef": 10**6},
    )
    assert _rows(got_s) == _rows(_brute(client, "hg", qs, strict_group_size=True))
    client.drop_collection("hg")


def test_hnsw_grouping_production_beam_quota_and_recall(spark, sf_dir, tmp_path):
    from milvus_spark.client import MilvusSparkClient

    client = MilvusSparkClient(spark, root=str(tmp_path))
    e = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    client.create_collection("hp", pk_field="vec_id", vector_field="embedding")
    client.insert("hp", e.select("vec_id", "embedding", "label"))
    client.create_index("hp", "embedding", "HNSW")
    qs = [list(map(float, e.first().embedding))]
    got = client.search("hp", data=qs, limit=3, group_by_field="label", group_size=2)
    rows = got.collect()
    by_group = {}
    for r in rows:
        by_group.setdefault(r.label, []).append(r)
    assert len(by_group) == 3 and all(len(v) <= 2 for v in by_group.values())
    # the top group (grank 1) must agree with the exact kernel: the beam's
    # first candidates are the query's nearest neighbors
    exact = {(r.grank, r.label) for r in _brute(client, "hp", qs).collect()}
    assert (1, [r.label for r in rows if r.grank == 1][0]) in exact
    client.drop_collection("hp")


def test_hnsw_grouping_sealed_growing(spark, sf_dir, tmp_path):
    """An index stale ONLY by post-build writes serves grouping
    SEALED+GROWING: beam candidates union the exact-scored delta, a
    post-build delete masks at query time, and exhaustive ef keeps the
    whole composition exact vs the brute kernel."""
    from milvus_spark.client import MilvusSparkClient

    client = MilvusSparkClient(spark, root=str(tmp_path))
    e = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    client.create_collection("hf", pk_field="vec_id", vector_field="embedding")
    client.insert("hf", e.select("vec_id", "embedding", "label").filter(F.col("vec_id") % 2 == 0))
    client.create_index("hf", "embedding", "HNSW")
    qs = [list(map(float, e.first().embedding))]
    client.insert("hf", e.select("vec_id", "embedding", "label").filter(F.col("vec_id") % 2 == 1))
    got = client.search(
        "hf", data=qs, limit=3, group_by_field="label", group_size=2,
        search_params={"ef": 10**6},
    )
    plan = got._jdf.queryExecution().executedPlan().toString()
    assert "_ts" in plan, "expected the ts-pruned growing delta"
    assert _rows(got) == _rows(_brute(client, "hf", qs))
    # post-build delete masks at query time; still exact
    victim = got.collect()[0].vec_id
    client.delete("hf", ids=[int(victim)])
    got2 = client.search(
        "hf", data=qs, limit=3, group_by_field="label", group_size=2,
        search_params={"ef": 10**6},
    )
    assert _rows(got2) == _rows(_brute(client, "hf", qs))
    assert victim not in [r.vec_id for r in got2.collect()]
    client.drop_collection("hf")


def test_hnsw_grouping_filter_rides_graph(spark, sf_dir, tmp_path):
    from milvus_spark.client import MilvusSparkClient

    client = MilvusSparkClient(spark, root=str(tmp_path))
    e = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    client.create_collection("hw", pk_field="vec_id", vector_field="embedding")
    client.insert("hw", e.select("vec_id", "embedding", "label"))
    client.create_index("hw", "embedding", "HNSW")
    qs = [list(map(float, e.first().embedding))]
    got = client.search(
        "hw", data=qs, limit=3, group_by_field="label", group_size=2,
        filter="vec_id % 2 == 0", search_params={"ef": 10**6},
    )
    plan = got._jdf.queryExecution().executedPlan().toString()
    assert "FlatMapGroupsInPandas" in plan
    from milvus_spark.operators.knn import grouping_search

    want = grouping_search(
        client._read("hw").filter(F.col("vec_id") % 2 == 0),
        [(0, qs[0])], "embedding", "vec_id", "label",
        metric="COSINE", limit=3, group_size=2,
    )
    assert _rows(got) == _rows(want)
    assert all(r.vec_id % 2 == 0 for r in got.collect())
    client.drop_collection("hw")


def test_ivf_grouping_exhaustive_exact(spark, sf_dir, tmp_path):
    """The IVF family serves group_by too (cluster-pruned candidates into
    the shared grouping merge); probing every cluster with an exhaustive
    candidate pool is exact vs the brute kernel."""
    from milvus_spark.client import MilvusSparkClient

    client = MilvusSparkClient(spark, root=str(tmp_path))
    e = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    client.create_collection("ig", pk_field="vec_id", vector_field="embedding")
    client.insert("ig", e.select("vec_id", "embedding", "label"))
    client.create_index("ig", "embedding", "IVF_FLAT", {"nlist": 4})
    qs = [list(map(float, r.embedding)) for r in e.orderBy("vec_id").limit(2).collect()]
    got = client.search(
        "ig", data=qs, limit=3, group_by_field="label", group_size=2,
        search_params={"nprobe": 4, "ef": 10**6},
    )
    plan = got._jdf.queryExecution().executedPlan().toString()
    assert "FlatMapGroupsInPandas" in plan, "expected the index-served grouping"
    assert _rows(got) == _rows(_brute(client, "ig", qs))
    # production probes keep the quota structure
    got_p = client.search("ig", data=qs[:1], limit=3, group_by_field="label", group_size=2)
    by_group = {}
    for r in got_p.collect():
        by_group.setdefault(r.label, []).append(r)
    assert len(by_group) <= 3 and all(len(v) <= 2 for v in by_group.values())
    client.drop_collection("ig")
