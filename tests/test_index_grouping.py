"""Grouping search through the PQ / SQ8 / LSH families (r11 —
SearchGroupByOperator.cpp rides ANY index's candidate iterator):
full-shortlist / full-probe exactness vs the brute grouping kernel,
production-regime quota structure, and the fallback matrix."""

from __future__ import annotations

from pyspark.sql import functions as F


def _brute(client, name, qs, metric="COSINE", **kw):
    from milvus_spark.operators.knn import grouping_search

    return grouping_search(
        client._read(name),
        [(i, list(map(float, v))) for i, v in enumerate(qs)],
        vec_col="embedding",
        pk_col="vec_id",
        group_col="label",
        metric=metric,
        limit=3,
        group_size=2,
        **kw,
    )


def _rows(df):
    return sorted(
        (r.qid, r.label, r.vec_id, round(r.score, 4), r.grank) for r in df.collect()
    )


def _setup(spark, sf_dir, tmp_path, cname, itype, metric, params):
    from milvus_spark.client import MilvusSparkClient

    client = MilvusSparkClient(spark, root=str(tmp_path))
    e = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    client.create_collection(
        cname, pk_field="vec_id", vector_field="embedding", metric_type=metric
    )
    client.insert(cname, e.select("vec_id", "embedding", "label"))
    client.create_index(cname, "embedding", itype, params)
    qs = [list(map(float, r.embedding)) for r in e.orderBy("vec_id").limit(2).collect()]
    return client, qs


def test_pq_grouping_exhaustive_exact(spark, sf_dir, tmp_path):
    client, qs = _setup(spark, sf_dir, tmp_path, "pg", "IVF_PQ", "L2", {"m": 16})
    got = client.search(
        "pg", data=qs, limit=3, group_by_field="label", group_size=2,
        search_params={"ef": 10**6, "shortlist": 10**6},
    )
    plan = got._jdf.queryExecution().executedPlan().toString()
    assert "_shard" in plan, "expected the PQ code-table grouping path"
    assert _rows(got) == _rows(_brute(client, "pg", qs, metric="L2"))
    # production shortlist keeps the quota structure
    got_p = client.search("pg", data=qs[:1], limit=3, group_by_field="label", group_size=2)
    by_group = {}
    for r in got_p.collect():
        by_group.setdefault(r.label, []).append(r)
    assert len(by_group) <= 3 and all(len(v) <= 2 for v in by_group.values())
    client.drop_collection("pg")


def test_sq8_grouping_exhaustive_exact(spark, sf_dir, tmp_path):
    client, qs = _setup(spark, sf_dir, tmp_path, "sg", "IVF_SQ8", "L2", {})
    got = client.search(
        "sg", data=qs, limit=3, group_by_field="label", group_size=2,
        search_params={"ef": 10**6, "shortlist": 10**6},
    )
    plan = got._jdf.queryExecution().executedPlan().toString()
    assert "_shard" in plan, "expected the SQ8 code-table grouping path"
    assert _rows(got) == _rows(_brute(client, "sg", qs, metric="L2"))
    client.drop_collection("sg")


def test_lsh_grouping_full_probe_exact(spark, sf_dir, tmp_path):
    client, qs = _setup(spark, sf_dir, tmp_path, "lg", "LSH", "COSINE", {"nbits": 8})
    got = client.search(
        "lg", data=qs, limit=3, group_by_field="label", group_size=2,
        search_params={"ef": 10**6, "probe_radius": 8},
    )
    plan = got._jdf.queryExecution().executedPlan().toString()
    assert "bucket" in plan, "expected the LSH bucket grouping path"
    assert _rows(got) == _rows(_brute(client, "lg", qs))
    client.drop_collection("lg")


def test_grouping_fallback_matrix(spark, sf_dir, tmp_path):
    """Regimes the PQ/SQ8/LSH grouping paths must NOT serve fall back to
    the exact brute kernel: non-default rounding, partition scope, a
    stale index, and (LSH) the norm-blind IP metric."""
    from milvus_spark.client import MilvusSparkClient

    client = MilvusSparkClient(spark, root=str(tmp_path))
    e = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    client.create_collection(
        "fb", pk_field="vec_id", vector_field="embedding", metric_type="L2",
        partition_key_field="label",
    )
    client.insert("fb", e.select("vec_id", "embedding", "label"))
    client.create_index("fb", "embedding", "IVF_PQ", {"m": 16})
    qs = [list(map(float, e.orderBy("vec_id").first().embedding))]

    def plan_of(**kw):
        df = client.search(
            "fb", data=qs, limit=3, group_by_field="label", group_size=2, **kw
        )
        return df, df._jdf.queryExecution().executedPlan().toString()

    # served: default regime reads the code table
    _, p = plan_of(search_params={"ef": 10**6, "shortlist": 10**6})
    assert "_shard" in p
    # rounding override → brute (code paths score at 4 decimals)
    df, p = plan_of(round_decimal=6)
    assert "_shard" not in p
    assert df.count() > 0
    # partition scope → brute (code table is not partition-scoped)
    df, p = plan_of(partition_names=[e.first().label])
    assert "_shard" not in p
    # stale index (post-build write) → brute, still correct
    client.insert(
        "fb",
        spark.createDataFrame(
            [[10**6, [0.0] * 64, "zz"]], "vec_id long, embedding array<float>, label string"
        ),
    )
    df, p = plan_of(search_params={"ef": 10**6, "shortlist": 10**6})
    assert "_shard" not in p
    assert _rows(df) == _rows(_brute(client, "fb", qs, metric="L2"))
    client.drop_collection("fb")

def test_quantized_grouping_exhaustive_exact(spark, sf_dir, tmp_path):
    """Grouping through the quantized families (r11): exhaustive beams +
    FP32 refine feed the shared grouping merge — exact vs brute; and the
    RaBitQ cluster path serves grouping too."""
    for itype, params, sp in (
        ("HNSW_SQ", {"sq_type": "SQ8", "refine": True, "refine_type": "FP32"},
         {"ef": 10**6, "refine_k": 10**4}),
        # ef is the shared candidate-budget knob across families: the
        # exhaustive grouping regime needs the candidate pool to cover
        # the corpus, exactly like the IVF/PQ/LSH oracle regimes
        ("IVF_RABITQ", {"nlist": 4, "refine": True, "refine_type": "FP32"},
         {"nprobe": 4, "ef": 10**6, "refine_k": 10**4}),
    ):
        cname = ("qg_" + itype).lower()
        client, qs = _setup(spark, sf_dir, tmp_path, cname, itype, "L2", params)
        got = client.search(
            cname, data=qs, limit=3, group_by_field="label", group_size=2,
            search_params=sp,
        )
        assert _rows(got) == _rows(_brute(client, cname, qs, metric="L2")), itype
        client.drop_collection(cname)
