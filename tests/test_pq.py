"""Product quantization: ADC shortlist + exact refine must hit the brute-force
recall gate (the reference's ANN correctness contract), and the ADC scan must
touch only the code column (the compression win)."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from milvus_spark.operators.knn import brute_force_search
from milvus_spark.operators.pq import encode_pq, pq_search, train_codebooks


@pytest.fixture(scope="module")
def pq_index(spark, sf_dir):
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    books = train_codebooks(emb, "embedding", m=16, k=16, sample_n=2048, seed=42)
    encoded = encode_pq(emb, "embedding", "vec_id", books).cache()
    encoded.count()
    yield emb, books, encoded
    encoded.unpersist()


def test_pq_recall_with_refine(spark, pq_index):
    emb, books, encoded = pq_index
    qrows = emb.filter(F.col("vec_id") < 8).collect()
    queries = [(r.vec_id, list(r.embedding)) for r in qrows]

    exact = brute_force_search(emb, queries, "embedding", "vec_id", metric="L2", k=10)
    truth = {}
    for r in exact.collect():
        truth.setdefault(r.qid, set()).add(r.vec_id)

    approx = pq_search(
        encoded, emb, books, queries, "embedding", "vec_id",
        metric="L2", k=10, shortlist=200,
    )
    got = {}
    for r in approx.collect():
        got.setdefault(r.qid, set()).add(r.vec_id)

    recalls = [len(got.get(q, set()) & truth[q]) / len(truth[q]) for q in truth]
    assert np.mean(recalls) >= 0.9, f"recall {np.mean(recalls):.3f} ({recalls})"


def test_pq_code_size(pq_index):
    _, books, encoded = pq_index
    m, k, dsub = books.shape
    assert (m, k, dsub) == (16, 16, 4)
    row = encoded.first()
    assert len(row.code) == 16 and all(0 <= c < 16 for c in row.code)


def test_pq_ip_metric_finds_large_norm_top1(spark):
    """Regression: IP searches need dot-product ADC tables with a DESCENDING
    shortlist — the L2 tables cut the large-norm vector that holds the top
    inner product."""
    import numpy as np
    from pyspark.sql import functions as F

    from milvus_spark.operators.pq import encode_pq, pq_search, train_codebooks

    rng = np.random.default_rng(5)
    V = rng.normal(size=(300, 8))
    q = rng.normal(size=8)
    # plant a large-norm vector aligned with the query but L2-far from it
    V[42] = 50.0 * (q / np.linalg.norm(q))
    df = spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in enumerate(V)],
        "vec_id long, embedding array<float>",
    )
    books = train_codebooks(df, "embedding", m=4, k=16)
    enc = encode_pq(df, "embedding", "vec_id", books)
    got = pq_search(
        enc, df, books, [(0, [float(x) for x in q])], "embedding", "vec_id",
        metric="IP", k=5, shortlist=60,
    ).collect()
    assert sorted(got, key=lambda r: r.rank)[0].vec_id == 42


def test_incremental_refresh_pq(spark, sf_dir, tmp_path):
    """PQ refresh: the delta encodes with the KEPT codebooks and appends to
    the code table; the index serves again, recall holds over old+new
    rows, and a deleted pk joins the persisted bitset."""
    import numpy as np
    from pyspark.sql import functions as F

    from milvus_spark.client import MilvusSparkClient

    client = MilvusSparkClient(spark, root=str(tmp_path))
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    client.create_collection("pqr", pk_field="vec_id", vector_field="embedding")
    client.insert("pqr", emb.filter(F.col("vec_id") % 3 != 0))
    client.create_index("pqr", "embedding", "IVF_PQ", {"m": 16})
    client.insert("pqr", emb.filter(F.col("vec_id") % 3 == 0))
    client.refresh_index("pqr", "embedding", "IVF_PQ")
    q = [emb.filter(F.col("vec_id") == 1).first().embedding]
    got = {
        r.vec_id
        for r in client.search(
            "pqr", q, limit=10, search_params={"shortlist": 10**6}
        ).collect()
    }
    rows = emb.collect()
    qv = np.asarray(q[0]) / np.linalg.norm(q[0])
    cos = {
        r.vec_id: float(
            np.dot(np.asarray(r.embedding) / np.linalg.norm(r.embedding), qv)
        )
        for r in rows
    }
    truth = set(sorted(cos, key=lambda i: (-round(cos[i], 12), i))[:10])
    # full shortlist -> exact refine over everything = exact
    assert got == truth
    client.delete("pqr", ids=[1])
    entry = client.refresh_index("pqr", "embedding", "IVF_PQ")
    assert [p for p, _ in entry["masked_pks"]] == [1]  # [pk, bound] pairs (r7)
    post = client.search(
        "pqr", q, limit=10, search_params={"shortlist": 10**6}
    ).collect()
    assert all(r.vec_id != 1 for r in post)
    # upsert ACCEPTED (r7): old code row version-masks below the new
    # epoch; the re-encoded copy keeps serving
    client.upsert("pqr", emb.filter(F.col("vec_id") == 2))
    entry = client.refresh_index("pqr", "embedding", "IVF_PQ")
    assert sorted(p for p, _ in entry["masked_pks"]) == [1, 2]
    up = client.search(
        "pqr", q, limit=10, search_params={"shortlist": 10**6}
    ).collect()
    # identical vector re-encoded -> identical exact-refine result
    assert {r.vec_id for r in up} == {r.vec_id for r in post}
    client.drop_collection("pqr")


def test_pq_mask_fold_rewrites_only_affected_shards(spark, sf_dir, tmp_path):
    """r8: PQ code tables are pk-shard-partitioned, so past
    MAX_INDEX_EPOCHS the version-masked (shadowed) codes physically drop
    by rewriting ONLY the shards holding masked pks — unaffected shard
    dirs byte-identical, mask folded to empty, exactly one surviving code
    row per upserted pk, and the full-shortlist search stays exact."""
    import hashlib
    import os

    import numpy as np
    from pyspark.sql import functions as F

    from milvus_spark.client import MilvusSparkClient

    def _shard_state(apath):
        state = {}
        for d in sorted(os.listdir(apath)):
            if not d.startswith("_shard="):
                continue
            for fn in sorted(os.listdir(os.path.join(apath, d))):
                with open(os.path.join(apath, d, fn), "rb") as f:
                    state[(d, fn)] = hashlib.sha256(f.read()).hexdigest()
        return state

    client = MilvusSparkClient(spark, root=str(tmp_path))
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    client.create_collection("pqf", pk_field="vec_id", vector_field="embedding")
    client.insert("pqf", emb)
    client.create_index("pqf", "embedding", "IVF_PQ", {"m": 8})
    entry = client.describe_index("pqf", "embedding", "IVF_PQ")
    apath = os.path.join(entry["path"], "codes")
    before = _shard_state(apath)
    assert before, "codes must be shard-partitioned"
    up = emb.filter(F.col("vec_id").isin(3, 11))
    for _cycle in range(5):
        client.upsert("pqf", up)
        entry = client.refresh_index("pqf", "embedding", "IVF_PQ")
    assert entry["cur_epoch"] == 5
    assert not entry.get("masked_pks")  # folded to empty
    after = _shard_state(apath)
    # pks 3 and 11 home to shards 3 and 11; every other shard untouched
    touched = {"_shard=3", "_shard=11"}
    for k, h in before.items():
        if k[0] not in touched:
            assert after.get(k) == h, k
    c = spark.read.parquet(apath)
    counts = {
        r[0]: r[1]
        for r in c.filter(F.col("vec_id").isin(3, 11))
        .groupBy("vec_id").count().collect()
    }
    assert counts == {3: 1, 11: 1}
    # identical vectors re-upserted: full-shortlist search == corpus truth
    q = [emb.filter(F.col("vec_id") == 1).first().embedding]
    got = client.search(
        "pqf", q, limit=10, search_params={"shortlist": 10**6}
    ).collect()
    qv = np.asarray(q[0]) / np.linalg.norm(q[0])
    cos = {
        r.vec_id: float(
            np.dot(np.asarray(r.embedding) / np.linalg.norm(r.embedding), qv)
        )
        for r in emb.collect()
    }
    truth = set(sorted(cos, key=lambda i: (-round(cos[i], 12), i))[:10])
    assert {r.vec_id for r in got} == truth
    client.drop_collection("pqf")


@pytest.mark.parametrize("itype,params,sp", [
    ("IVF_PQ", {"m": 8}, {"shortlist": 10**6}),
    ("IVF_SQ8", {}, {"shortlist": 10**6}),
    ("LSH", {"nbits": 8}, {"probe_radius": 8}),
])
def test_sealed_growing_serving_shortlist_family(
    spark, sf_dir, tmp_path, itype, params, sp
):
    """r8: sealed+growing serving covers the WHOLE index zoo — a stale
    PQ/SQ8/LSH index serves its artifact as the sealed side while only
    the post-build delta exact-scans (PushedFilters on _ts), post-build
    deletes mask every artifact epoch, and with an exhaustive
    shortlist/probe the merged result is exact over the visible corpus
    with NO refresh."""
    from milvus_spark.client import MilvusSparkClient

    client = MilvusSparkClient(spark, root=str(tmp_path / itype))
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    client.create_collection("zg", pk_field="vec_id", vector_field="embedding")
    client.insert("zg", emb.filter(F.col("vec_id") % 3 != 0))
    client.create_index("zg", "embedding", itype, dict(params))
    client.insert("zg", emb.filter(F.col("vec_id") % 3 == 0))
    client.delete("zg", ids=[2, 3])
    q = [emb.filter(F.col("vec_id") == 1).first().embedding]
    hits = client.search("zg", q, limit=10, search_params=dict(sp))
    plan = hits._jdf.queryExecution().executedPlan().toString()
    assert "GreaterThan(_ts" in plan  # growing side scans ONLY the delta
    got = {r.vec_id for r in hits.collect()}
    qv = np.asarray(q[0]) / np.linalg.norm(q[0])
    cos = {
        r.vec_id: float(
            np.dot(np.asarray(r.embedding) / np.linalg.norm(r.embedding), qv)
        )
        for r in emb.collect()
        if r.vec_id not in (2, 3)
    }
    truth = set(sorted(cos, key=lambda i: (-round(cos[i], 12), i))[:10])
    assert got == truth
    client.drop_collection("zg")
