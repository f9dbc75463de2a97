"""Quantized index families (r11 — reference test specs in
tests/python_client/testcases/indexes/idx_hnsw_{sq,pq,prq}.py and
idx_ivf_rabitq.py): build-param refusal matrices, exact-regime equality
vs brute force (exhaustive candidates + FP32 refine), production-regime
recall gates, and quantizer kernel round-trips."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from milvus_spark.operators.quantizers import (
    bf16_reconstruct_np,
    fp16_reconstruct_np,
    rabitq_encode_np,
    rabitq_estimate_np,
    rotation_matrix,
    sq_reconstruct_np,
)


def _client(spark, tmp_path):
    from milvus_spark.client import MilvusSparkClient

    return MilvusSparkClient(spark, root=str(tmp_path))


def _brute(client, cname, qs, metric, k=5):
    from milvus_spark.operators.knn import brute_force_search

    return brute_force_search(
        client._read(cname),
        [(i, q) for i, q in enumerate(qs)],
        "embedding",
        "vec_id",
        metric=metric,
        k=k,
    )


def _rows(df):
    return sorted((r.qid, r.vec_id, round(r.score, 4), r.rank) for r in df.collect())


def _setup(spark, sf_dir, tmp_path, cname, metric):
    c = _client(spark, tmp_path)
    e = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    c.create_collection(
        cname, pk_field="vec_id", vector_field="embedding", metric_type=metric
    )
    c.insert(cname, e.select("vec_id", "embedding"))
    qs = [list(map(float, r.embedding)) for r in e.orderBy("vec_id").limit(3).collect()]
    return c, qs


@pytest.mark.parametrize(
    "itype,metric,params",
    [
        ("HNSW_SQ", "COSINE", {"sq_type": "SQ8", "refine": True, "refine_type": "FP32"}),
        ("HNSW_SQ", "IP", {"sq_type": "FP16", "refine": True}),
        ("HNSW_PQ", "L2", {"m": 16, "refine": True, "refine_type": "FP32"}),
        ("HNSW_PRQ", "COSINE", {"m": 16, "nrq": 2, "refine": True}),
        ("IVF_RABITQ", "L2", {"nlist": 4, "refine": True, "refine_type": "FP32"}),
        ("IVF_RABITQ", "COSINE", {"nlist": 4, "refine": True}),
    ],
)
def test_exact_regime_matches_brute(spark, sf_dir, tmp_path, itype, metric, params):
    """Exhaustive candidates (ef / nprobe covering everything, corpus-sized
    refine_k) + FP32 refine = exact top-k, bit-equal to the brute kernel."""
    cname = f"{itype}_{metric}".lower()
    c, qs = _setup(spark, sf_dir, tmp_path, cname, metric)
    c.create_index(cname, "embedding", itype, params)
    got = c.search(
        cname, qs, limit=5,
        search_params={"ef": 10**6, "refine_k": 10**6, "nprobe": 4},
    )
    assert _rows(got) == _rows(_brute(c, cname, qs, metric))
    c.drop_collection(cname)


def test_production_regime_recall(spark, sf_dir, tmp_path):
    """Production beams + small refine_k: recall@5 >= 0.8 vs brute on the
    gate corpus for each family (the ANN contract, not exactness)."""
    for itype, params, sp in (
        ("HNSW_SQ", {"sq_type": "SQ8", "refine": True}, {"refine_k": 4}),
        ("HNSW_PQ", {"m": 16, "refine": True}, {"refine_k": 4}),
        # 1-bit codes on UNIFORM synthetic vectors are the adversarial
        # distance-concentration case (same note as PQ's 20xk shortlist):
        # refine_k ~16 holds recall; real clustered corpora rank far better
        ("IVF_RABITQ", {"nlist": 4, "refine": True}, {"refine_k": 16, "nprobe": 4}),
    ):
        cname = ("p_" + itype).lower()
        c, qs = _setup(spark, sf_dir, tmp_path, cname, "L2")
        c.create_index(cname, "embedding", itype, params)
        got = c.search(cname, qs, limit=5, search_params=sp)
        exp = _brute(c, cname, qs, "L2")
        hit = {(r.qid, r.vec_id) for r in got.collect()}
        want = {(r.qid, r.vec_id) for r in exp.collect()}
        recall = len(hit & want) / len(want)
        assert recall >= 0.8, (itype, recall)
        c.drop_collection(cname)


def test_build_param_refusal_matrix(spark, sf_dir, tmp_path):
    """The reference's param validation rows (idx_hnsw_sq.py /
    idx_hnsw_pq.py / idx_hnsw_prq.py / idx_ivf_rabitq.py)."""
    c, _ = _setup(spark, sf_dir, tmp_path, "rm", "L2")
    with pytest.raises(ValueError, match=r"'M' \(-1\) should be in range \[2, 2048\]"):
        c.create_index("rm", "embedding", "HNSW_SQ", {"M": -1})
    with pytest.raises(ValueError, match=r"'M' \(2049\) should be in range"):
        c.create_index("rm", "embedding", "HNSW_SQ", {"M": 2049})
    with pytest.raises(ValueError, match="invalid integer value"):
        c.create_index("rm", "embedding", "HNSW_SQ", {"M": True})
    with pytest.raises(ValueError, match="invalid integer value"):
        c.create_index("rm", "embedding", "HNSW_SQ", {"M": [16]})
    with pytest.raises(ValueError, match="wrong data type in json"):
        c.create_index("rm", "embedding", "HNSW_SQ", {"M": 16.5})
    with pytest.raises(ValueError, match="invalid scalar quantizer type"):
        c.create_index("rm", "embedding", "HNSW_SQ", {"sq_type": "FP32"})
    with pytest.raises(ValueError, match="invalid scalar quantizer type"):
        c.create_index("rm", "embedding", "HNSW_SQ", {"sq_type": 8})
    with pytest.raises(ValueError, match="should be a boolean"):
        c.create_index("rm", "embedding", "HNSW_SQ", {"refine": 1})
    with pytest.raises(ValueError, match="should be a boolean"):
        c.create_index("rm", "embedding", "HNSW_SQ", {"refine": "test"})
    # PQ: m must divide dim; nbits in [1, 24]
    with pytest.raises(ValueError, match="divided by m"):
        c.create_index("rm", "embedding", "HNSW_PQ", {"m": 7})
    with pytest.raises(ValueError, match=r"'nbits' \(25\) should be in range \[1, 24\]"):
        c.create_index("rm", "embedding", "HNSW_PQ", {"m": 16, "nbits": 25})
    with pytest.raises(ValueError, match=r"'nrq' \(17\) should be in range \[1, 16\]"):
        c.create_index("rm", "embedding", "HNSW_PRQ", {"m": 16, "nrq": 17})
    # RABITQ: nlist bounds; refine_type PQ invalid, case-insensitive valid
    with pytest.raises(ValueError, match=r"'nlist' \(65537\) should be in range"):
        c.create_index("rm", "embedding", "IVF_RABITQ", {"nlist": 65537})
    with pytest.raises(ValueError, match="invalid refine type"):
        c.create_index("rm", "embedding", "IVF_RABITQ", {"refine_type": "PQ"})
    with pytest.raises(ValueError, match="invalid refine type"):
        c.create_index("rm", "embedding", "IVF_RABITQ", {"refine": True, "refine_type": " SQ8 "})
    # numeric strings coerce; lowercase refine_type accepted; None = default
    c.create_index(
        "rm", "embedding", "IVF_RABITQ",
        {"nlist": "4", "refine": "true", "refine_type": "sq6", "M": None},
    )
    # search-param validation
    with pytest.raises(ValueError, match="refine_k"):
        c.search("rm", [[0.0] * 64], limit=5, search_params={"refine_k": 0})
    with pytest.raises(ValueError, match="rbq_bits_query"):
        c.search("rm", [[0.0] * 64], limit=5, search_params={"rbq_bits_query": 9})
    c.drop_collection("rm")


def test_quantizer_kernels_roundtrip():
    rng = np.random.default_rng(3)
    V = rng.standard_normal((50, 16))
    bounds = np.stack([V.min(axis=0), V.max(axis=0)])
    for levels, tol in ((63, 0.15), (255, 0.04)):
        R = sq_reconstruct_np(V, bounds, levels)
        err = np.abs(R - V).max()
        step = (bounds[1] - bounds[0]).max() / levels
        assert err <= step / 2 + 1e-9, (levels, err)
    assert np.abs(fp16_reconstruct_np(V) - V).max() < 1e-2
    assert np.abs(bf16_reconstruct_np(V) - V).max() < 1e-1
    # rabitq estimator: unbiased-ish — correlation with the true residual
    # IP must be strongly positive, and exact in the 1-D degenerate case
    d = 32
    R = rotation_matrix(d, 7)
    assert np.allclose(R @ R.T, np.eye(d), atol=1e-9)
    X = rng.standard_normal((200, d))
    cent = X.mean(axis=0)
    bits, norms = rabitq_encode_np(R, X, cent)
    q = rng.standard_normal(d)
    qr = (q - cent) @ R
    est = rabitq_estimate_np(bits, norms, qr, 0)
    true = (X - cent) @ (q - cent)
    corr = np.corrcoef(est, true)[0, 1]
    assert corr > 0.7, corr
    # query quantization (rbq_bits_query) degrades gracefully
    est4 = rabitq_estimate_np(bits, norms, qr, 4)
    assert np.corrcoef(est4, true)[0, 1] > 0.6


def test_quantized_sealed_growing_and_refresh(spark, sf_dir, tmp_path):
    """r11 lifecycle closure: a quantized index stale ONLY by post-build
    writes serves SEALED + GROWING (graph/code candidates + the exact-
    scanned delta, post-build deletes masked), and refresh_index folds the
    delta into a new epoch ENCODED WITH THE TRAINED QUANTIZER — exact
    regimes stay bit-equal to brute through the whole lifecycle."""
    from pyspark.sql import functions as F

    for itype, params, sp in (
        ("HNSW_SQ", {"sq_type": "SQ8", "refine": True, "refine_type": "FP32"},
         {"ef": 10**6, "refine_k": 10**6}),
        ("IVF_RABITQ", {"nlist": 4, "refine": True, "refine_type": "FP32"},
         {"nprobe": 4, "refine_k": 10**6}),
    ):
        cname = ("sg_" + itype).lower()
        c = _client(spark, tmp_path)
        e = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
        c.create_collection(
            cname, pk_field="vec_id", vector_field="embedding", metric_type="L2"
        )
        c.insert(cname, e.select("vec_id", "embedding").filter(F.col("vec_id") % 3 != 0))
        c.create_index(cname, "embedding", itype, params)
        qs = [list(map(float, r.embedding)) for r in e.orderBy("vec_id").limit(3).collect()]
        # growing: post-build insert serves without refresh, still exact
        c.insert(cname, e.select("vec_id", "embedding").filter(F.col("vec_id") % 3 == 0))
        got = c.search(cname, qs, limit=5, search_params=sp)
        assert _rows(got) == _rows(_brute(c, cname, qs, "L2")), (itype, "growing")
        # post-build delete masks at query time
        victim = sorted(got.collect(), key=lambda r: (r.qid, r.rank))[0].vec_id
        c.delete(cname, ids=[int(victim)])
        got = c.search(cname, qs, limit=5, search_params=sp)
        assert victim not in {r.vec_id for r in got.collect()}, (itype, "mask")
        assert _rows(got) == _rows(_brute(c, cname, qs, "L2")), (itype, "masked")
        # refresh folds the delta into epoch 1 under the trained quantizer
        ent = c.refresh_index(cname, "embedding", itype)
        assert ent["built_ts"] == c._current_ts(cname)
        got = c.search(cname, qs, limit=5, search_params=sp)
        assert _rows(got) == _rows(_brute(c, cname, qs, "L2")), (itype, "refreshed")
        c.drop_collection(cname)


def test_rabitq_exact_regime_skips_candidate_window(spark, sf_dir, tmp_path):
    """r11 optimization pin: when cand_k (= refine_k x limit) is at least
    the sealed codes row count, the crank candidate window is a provable
    pass-through (the estimator emits each probed pk at most once per
    query), so the serve plan must NOT pay its corpus-sized exchange+sort;
    a production-sized refine_k keeps the window. Both regimes stay exact
    here because nprobe covers every cluster and the kept window's cand_k
    still exceeds k."""
    cname = "rbq_winskip"
    c, qs = _setup(spark, sf_dir, tmp_path, cname, "L2")
    c.create_index(
        cname, "embedding", "IVF_RABITQ",
        {"nlist": 4, "refine": True, "refine_type": "FP32"},
    )
    n = c._read(cname).count()
    exact = c.search(
        cname, qs, limit=5, search_params={"refine_k": 10**6, "nprobe": 4}
    )
    plan = exact._sc._jvm.PythonSQLUtils.explainString(
        exact._jdf.queryExecution(), "formatted"
    )
    assert "crank" not in plan, "exact regime must skip the candidate window"
    # production regime: cand_k = ceil((n/2)/5)*5 < n keeps the window
    prod = c.search(
        cname, qs, limit=5, search_params={"refine_k": n // 10, "nprobe": 4}
    )
    pplan = prod._sc._jvm.PythonSQLUtils.explainString(
        prod._jdf.queryExecution(), "formatted"
    )
    assert "crank" in pplan, "bounded refine_k must keep the candidate window"
    assert _rows(exact) == _rows(_brute(c, cname, qs, "L2"))
    c.drop_collection(cname)
