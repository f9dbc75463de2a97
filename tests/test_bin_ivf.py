"""BIN_IVF_FLAT — the binary member of the IVF family.

Reference contract (/root/reference/internal/util/indexparamcheck/
bin_ivf_flat_checker_test.go): the build accepts ONLY the binary metrics
HAMMING and JACCARD (every float metric and SUBSTRUCTURE/SUPERSTRUCTURE
are refused) and nlist must land in [MinNList, MaxNList] = [1, 65536]
(constraints.go:13-16). Serving contract: clustering runs in unpacked-bit
space (L2² over {0,1} = Hamming, so bit-space L2 cells ARE Hamming
cells), the layout stores packed bytes partitioned by cluster_id, a full
probe is EXACT vs brute force, and the family rides the shared
_epoch/refresh/delete-mask lifecycle."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

NQ = 4


def _client(spark, tmp_path):
    from milvus_spark.client import MilvusSparkClient

    return MilvusSparkClient(spark, root=str(tmp_path))


def _pack_expr(col: str):
    """Pack sign bits of a 64-dim float array into 8 uint8 bytes,
    MSB-first (the np.unpackbits convention the scoring kernel uses)."""
    v = F.col(col)
    bytes_ = []
    for j in range(8):
        b = F.lit(0)
        for i in range(8):
            b = b + F.when(
                F.element_at(v, 8 * j + i + 1) > 0, F.lit(1 << (7 - i))
            ).otherwise(F.lit(0))
        bytes_.append(b.cast("long"))
    return F.array(*bytes_)


def _binary_corpus(spark, sf_dir):
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    return emb.select(
        "vec_id", _pack_expr("embedding").alias("bv"), "label"
    )


def _fresh(c, spark, sf_dir, nm, metric="HAMMING", frac=None):
    bv = _binary_corpus(spark, sf_dir)
    if frac is not None:
        bv = bv.filter(frac)
    c.create_collection(nm, pk_field="vec_id", vector_field="bv", metric_type=metric)
    c.insert(nm, bv)
    qs = [
        list(map(int, r.bv))
        for r in _binary_corpus(spark, sf_dir)
        .filter(F.col("vec_id") < NQ)
        .orderBy("vec_id")
        .collect()
    ]
    return qs


def _brute(c, nm, qs, metric, k=10):
    from milvus_spark.operators.knn import brute_force_search

    return brute_force_search(
        c._read(nm), [(i, q) for i, q in enumerate(qs)],
        "bv", "vec_id", metric=metric, k=k,
    )


# ---------------- checker matrix (bin_ivf_flat_checker_test.go) ---------------


@pytest.mark.parametrize("metric", ["HAMMING", "JACCARD"])
def test_checker_accepts_binary_metrics(spark, sf_dir, tmp_path, metric):
    c = _client(spark, tmp_path)
    _fresh(c, spark, sf_dir, "bk", metric=metric)
    ent = c.create_index("bk", "bv", "BIN_IVF_FLAT", {"nlist": 4})
    assert ent["nlist"] == 4 and ent["metric"] == metric


@pytest.mark.parametrize(
    "metric", ["L2", "IP", "COSINE", "SUBSTRUCTURE", "SUPERSTRUCTURE"]
)
def test_checker_refuses_nonbinary_metrics(spark, sf_dir, tmp_path, metric):
    c = _client(spark, tmp_path)
    _fresh(c, spark, sf_dir, "bk", metric="HAMMING")
    with pytest.raises(ValueError, match="not supported"):
        c.create_index(
            "bk", "bv", "BIN_IVF_FLAT", {"nlist": 4, "metric_type": metric}
        )


@pytest.mark.parametrize("nlist", [0, 65537, -1])
def test_checker_refuses_nlist_out_of_range(spark, sf_dir, tmp_path, nlist):
    c = _client(spark, tmp_path)
    _fresh(c, spark, sf_dir, "bk")
    with pytest.raises(ValueError, match="out of range"):
        c.create_index("bk", "bv", "BIN_IVF_FLAT", {"nlist": nlist})


def test_checker_refuses_non_numeric_nlist(spark, sf_dir, tmp_path):
    c = _client(spark, tmp_path)
    _fresh(c, spark, sf_dir, "bk")
    with pytest.raises(ValueError, match="expects a number"):
        c.create_index("bk", "bv", "BIN_IVF_FLAT", {"nlist": "error"})


# ---------------- serving: exact at full probe, pruned below ------------------


@pytest.mark.parametrize("metric", ["HAMMING", "JACCARD"])
def test_full_probe_is_exact(spark, sf_dir, tmp_path, metric):
    c = _client(spark, tmp_path)
    qs = _fresh(c, spark, sf_dir, "bx", metric=metric)
    c.create_index("bx", "bv", "BIN_IVF_FLAT", {"nlist": 8})
    got = c.search("bx", qs, limit=10, search_params={"nprobe": 10**6})
    g = [(r.qid, r.vec_id, round(r.score, 4)) for r in got.collect()]
    b = [
        (r.qid, r.vec_id, round(r.score, 4))
        for r in _brute(c, "bx", qs, metric).collect()
    ]
    assert g == b


def test_partial_probe_prunes_and_recalls(spark, sf_dir, tmp_path):
    """nprobe < nlist reads only probed cluster directories (partition
    pruning at the parquet scan) and still recalls >= 0.9 of the exact
    top-10 — the probe geometry (bit-space L2 = Hamming) is doing its job,
    not surviving on a full scan."""
    import os

    c = _client(spark, tmp_path)
    qs = _fresh(c, spark, sf_dir, "bp")
    ent = c.create_index("bp", "bv", "BIN_IVF_FLAT", {"nlist": 8})
    layout = spark.read.parquet(os.path.join(ent["path"], "clustered"))
    plan = (
        layout.filter(F.col("cluster_id").isin([0, 1]))
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "PartitionFilters" in plan and "cluster_id" in plan
    # 64-bit Hamming over a small corpus is tie-dense (many docs share a
    # distance), so recall counts a returned hit as correct when its score
    # is within the TRUE k-th score — the standard tie-aware recall for
    # integer metrics; set-identity recall would penalize returning a
    # different member of the same tied shell.
    kth = {}
    for r in _brute(c, "bp", qs, "HAMMING").collect():
        kth[r.qid] = max(kth.get(r.qid, 0.0), r.score)
    # sign bits of near-isotropic embeddings carry little cluster
    # structure (the hard case for ANY binary IVF — recall tracks the
    # probe fraction on structureless codes); measured curve on this
    # fixture: nprobe 4→0.80, 5→0.88, 6→0.95, 7→1.0
    hits = {}
    for r in c.search("bp", qs, limit=10, search_params={"nprobe": 6}).collect():
        hits.setdefault(r.qid, []).append(r.score <= kth[r.qid])
    recalls = [sum(v) / 10.0 for v in hits.values()]
    assert np.mean(recalls) >= 0.9, recalls


def test_filtered_search_rides_the_index(spark, sf_dir, tmp_path):
    """FilterBits→VectorSearch on the binary layout: every hit satisfies
    the filter; full probe keeps the filtered result exact."""
    c = _client(spark, tmp_path)
    qs = _fresh(c, spark, sf_dir, "bf")
    c.create_index("bf", "bv", "BIN_IVF_FLAT", {"nlist": 8})
    got = c.search(
        "bf", qs, limit=10, filter="label % 3 == 0",
        search_params={"nprobe": 10**6},
    )
    from milvus_spark.operators.knn import brute_force_search

    exact = brute_force_search(
        c._read("bf").filter(F.col("label") % 3 == 0),
        [(i, q) for i, q in enumerate(qs)], "bv", "vec_id",
        metric="HAMMING", k=10,
    )
    g = [(r.qid, r.vec_id, round(r.score, 4)) for r in got.collect()]
    b = [(r.qid, r.vec_id, round(r.score, 4)) for r in exact.collect()]
    assert g == b


# ---------------- lifecycle: refresh + delete mask ----------------------------


def test_refresh_and_delete_lifecycle(spark, sf_dir, tmp_path):
    """Base build on half the corpus, insert the rest + refresh (epoch 1
    assigns to the TRAINED centroids), delete a slice + refresh (delete
    mask); full probe stays exact vs brute force over the visible corpus."""
    c = _client(spark, tmp_path)
    bv = _binary_corpus(spark, sf_dir)
    c.create_collection(
        "bl", pk_field="vec_id", vector_field="bv", metric_type="HAMMING"
    )
    c.insert("bl", bv.filter(F.col("vec_id") % 2 == 0))
    c.create_index("bl", "bv", "BIN_IVF_FLAT", {"nlist": 4})
    c.insert("bl", bv.filter(F.col("vec_id") % 2 == 1))
    ent = c.refresh_index("bl", "bv", "BIN_IVF_FLAT")
    assert ent["cur_epoch"] == 1
    c.delete("bl", filter=f"vec_id % 7 == 0 and vec_id >= {NQ}")
    ent = c.refresh_index("bl", "bv", "BIN_IVF_FLAT")
    qs = [
        list(map(int, r.bv))
        for r in bv.filter(F.col("vec_id") < NQ).orderBy("vec_id").collect()
    ]
    got = c.search("bl", qs, limit=10, search_params={"nprobe": 10**6})
    g = [(r.qid, r.vec_id, round(r.score, 4)) for r in got.collect()]
    b = [
        (r.qid, r.vec_id, round(r.score, 4))
        for r in _brute(c, "bl", qs, "HAMMING").collect()
    ]
    assert g == b


def test_sealed_growing_serving_bin_ivf(spark, sf_dir, tmp_path):
    """r11: a BIN_IVF_FLAT index stale ONLY by post-build writes serves
    sealed+growing — the clustered artifact as the sealed side, the
    _ts-pruned delta exact-scanned through the same HAMMING kernel, a
    post-build delete masked at query time — and the merged result is
    exact vs brute force over the visible corpus (full probe)."""
    from pyspark.sql import functions as F

    c = _client(spark, tmp_path)
    bv = _binary_corpus(spark, sf_dir)
    c.create_collection(
        "bg", pk_field="vec_id", vector_field="bv", metric_type="HAMMING"
    )
    c.insert("bg", bv.filter(F.col("vec_id") % 2 == 0))
    c.create_index("bg", "bv", "BIN_IVF_FLAT", {"nlist": 4})
    # post-build writes, NO refresh: delta insert + a delete
    c.insert("bg", bv.filter(F.col("vec_id") % 2 == 1))
    c.delete("bg", filter=f"vec_id % 9 == 0 and vec_id >= {NQ}")
    qs = [
        list(map(int, r.bv))
        for r in bv.filter(F.col("vec_id") < NQ).orderBy("vec_id").collect()
    ]
    out = c.search("bg", qs, limit=10, search_params={"nprobe": 10**6})
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "cluster_id" in plan, "expected the sealed clustered artifact"
    assert "_ts" in plan, "expected the ts-pruned growing delta"
    g = [(r.qid, r.vec_id, round(r.score, 4)) for r in out.collect()]
    b = [
        (r.qid, r.vec_id, round(r.score, 4))
        for r in _brute(c, "bg", qs, "HAMMING").collect()
    ]
    assert g == b
