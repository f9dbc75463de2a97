"""MINHASH_LSH (indexparamcheck/index_params_validation.go:247,
index_params_validation_test.go:199-215; minhash_function.go:51,72;
MinHashComputer.cpp — MHJACCARD distance = 1 − matches/num_hashes):
band-index build, banded dispatch with exact candidate verification, the
sealed+growing/refresh/delete lifecycle, and the refusal matrix."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from milvus_spark.operators.minhash_lsh import (
    build_minhash_bands,
    minhash_lsh_search,
    query_band_hashes,
)
from milvus_spark.operators.text import minhash_signature, shingles, tokens

_H, _B = 8, 4


def _sig_frame(spark, sf_dir, lo=0, hi=240):
    d = spark.read.parquet(f"{sf_dir}/documents.parquet").filter(
        (F.col("doc_id") >= lo) & (F.col("doc_id") < hi)
    )
    sh = F.array_distinct(shingles(tokens(F.col("text"))))
    return d.select(
        "doc_id",
        F.array(*minhash_signature(sh, _H)).cast("array<long>").alias("sig"),
    )


def _client(spark, tmp_path):
    from milvus_spark.client import MilvusSparkClient

    return MilvusSparkClient(spark, root=str(tmp_path))


def _expected(sig_rows, queries, k, exclude=()):
    """Brute banded reference: candidates share >= 1 band bucket; distance
    is exact 1 - matches/H; top-k by (distance, id)."""
    out = {}
    for qid, qsig in queries:
        qb = query_band_hashes(qsig, _B)
        hits = []
        for did, sig in sig_rows:
            if did in exclude:
                continue
            if any(a == b for a, b in zip(query_band_hashes(sig, _B), qb)):
                eq = sum(1 for a, b in zip(sig, qsig) if a == b)
                hits.append((round(1.0 - eq / _H, 4), did))
        out[qid] = sorted(hits, key=lambda t: (t[0], t[1]))[:k]
    return out


def test_band_hash_spark_python_twin(spark, sf_dir):
    """query_band_hashes must be bit-identical to band_hash_col — the
    driver-side query buckets and the executor-side corpus buckets have to
    land in the same md5 space or the join finds nothing."""
    sig = _sig_frame(spark, sf_dir, hi=40)
    bands = build_minhash_bands(sig, "sig", "doc_id", _H, _B)
    got = {
        (r.id, r.band): r.bh
        for r in bands.collect()
    }
    for r in sig.collect():
        for j, bh in enumerate(query_band_hashes(r.sig, _B)):
            assert got[(r.doc_id, j)] == bh


def test_minhash_lsh_kernel_matches_reference(spark, sf_dir):
    sig = _sig_frame(spark, sf_dir)
    rows = [(r.doc_id, list(r.sig)) for r in sig.collect()]
    queries = [(i, rows[i][1]) for i in range(4)]
    bands = build_minhash_bands(sig, "sig", "doc_id", _H, _B)
    got = minhash_lsh_search(bands, queries, _H, _B, 10)
    exp = _expected(rows, queries, 10)
    for qid, _ in queries:
        g = [
            (r.score, r.id)
            for r in sorted(got.filter(F.col("qid") == qid).collect(), key=lambda r: r.rank)
        ]
        assert g == exp[qid], qid


def test_minhash_lsh_client_lifecycle(spark, sf_dir, tmp_path):
    client = _client(spark, tmp_path)
    sig = _sig_frame(spark, sf_dir)
    rows = [(r.doc_id, list(r.sig)) for r in sig.collect()]
    client.create_collection(
        "mh", pk_field="doc_id", vector_field="sig", metric_type="MHJACCARD"
    )
    client.insert("mh", sig.filter(F.col("doc_id") % 3 != 0))
    ent = client.create_index("mh", "sig", "MINHASH_LSH", {"mh_lsh_band": _B})
    assert ent["num_hashes"] == _H and ent["bands"] == _B and ent["cur_epoch"] == 0
    queries = [(i, rows[i][1]) for i in range(3)]
    qs = [q for _, q in queries]

    def _got():
        df = client.search("mh", qs, limit=5)
        return df, {
            qid: [(round(r.score, 4), r.doc_id) for r in df.collect() if r.qid == qid]
            for qid, _ in queries
        }

    sealed_rows = [(d, s) for d, s in rows if d % 3 != 0]
    df, got = _got()
    assert "In(bh" in df._jdf.queryExecution().executedPlan().toString()
    assert got == _expected(sealed_rows, queries, 5)

    # sealed+growing: post-build insert serves without refresh
    client.insert("mh", sig.filter(F.col("doc_id") % 3 == 0))
    df, got = _got()
    assert "In(bh" in df._jdf.queryExecution().executedPlan().toString()
    assert got == _expected(rows, queries, 5)

    # post-build delete masks at query time
    victim = got[0][0][1]
    client.delete("mh", ids=[int(victim)])
    _, got = _got()
    assert got == _expected(rows, queries, 5, exclude={victim})

    # refresh folds the delta into epoch 1; still banded, still exact
    ent = client.refresh_index("mh", "sig", "MINHASH_LSH")
    assert ent["cur_epoch"] == 1
    df, got = _got()
    assert "In(bh" in df._jdf.queryExecution().executedPlan().toString()
    assert got == _expected(rows, queries, 5, exclude={victim})
    client.drop_collection("mh")


def test_minhash_lsh_filter_and_flat_fallback(spark, sf_dir, tmp_path):
    client = _client(spark, tmp_path)
    sig = _sig_frame(spark, sf_dir)
    rows = [(r.doc_id, list(r.sig)) for r in sig.collect()]
    client.create_collection(
        "mhf", pk_field="doc_id", vector_field="sig", metric_type="MHJACCARD"
    )
    client.insert("mhf", sig)
    client.create_index("mhf", "sig", "MINHASH_LSH", {"mh_lsh_band": _B})
    queries = [(0, rows[0][1])]
    # scalar filter rides the banded path as a pk semi-join
    got = client.search("mhf", [rows[0][1]], limit=5, filter="doc_id % 2 == 0")
    exp = _expected(
        [(d, s) for d, s in rows if d % 2 == 0], queries, 5
    )[0]
    assert [(round(r.score, 4), r.doc_id) for r in got.collect()] == exp
    # FLAT fallback (no index): exhaustive estimated-Jaccard scan — a
    # superset regime of the banded path, ranked by the same distance
    client.drop_index("mhf", "sig", "MINHASH_LSH")
    flat = client.search("mhf", [rows[0][1]], limit=5)
    eq = lambda s, q: sum(1 for a, b in zip(s, q) if a == b)
    exp_flat = sorted(
        ((round(1.0 - eq(s, rows[0][1]) / _H, 4), d) for d, s in rows),
        key=lambda t: (t[0], t[1]),
    )[:5]
    assert [(round(r.score, 4), r.doc_id) for r in flat.collect()] == exp_flat
    client.drop_collection("mhf")


def test_minhash_lsh_refusal_matrix(spark, sf_dir, tmp_path):
    client = _client(spark, tmp_path)
    sig = _sig_frame(spark, sf_dir, hi=40)
    client.create_collection(
        "mhr", pk_field="doc_id", vector_field="sig", metric_type="MHJACCARD"
    )
    client.insert("mhr", sig)
    # metric must be MHJACCARD (index_params_validation.go:247)
    with pytest.raises(ValueError, match="must be MHJACCARD"):
        client.create_index("mhr", "sig", "MINHASH_LSH", {"metric_type": "JACCARD"})
    # dim param mismatching the signature field is rejected
    # (index_params_validation_test.go:206-215)
    with pytest.raises(ValueError, match="dimension mismatch"):
        client.create_index("mhr", "sig", "MINHASH_LSH", {"dim": 1024})
    # band count must divide num_hashes
    with pytest.raises(ValueError, match="must divide"):
        client.create_index("mhr", "sig", "MINHASH_LSH", {"mh_lsh_band": 3})
    client.create_index("mhr", "sig", "MINHASH_LSH", {"mh_lsh_band": _B, "dim": _H})
    # query signature width must match the index
    with pytest.raises(ValueError, match="dimension mismatch"):
        client.search("mhr", [[1, 2, 3]], limit=5)
    # unverified band candidates are not served
    with pytest.raises(ValueError, match="mh_search_with_jaccard"):
        client.search(
            "mhr",
            [list(range(_H))],
            limit=5,
            search_params={"mh_search_with_jaccard": False},
        )
    with pytest.raises(ValueError, match="range search"):
        client.search("mhr", [list(range(_H))], limit=5, radius=0.5)
    client.drop_collection("mhr")


def test_minhash_function_ingest_and_text_search(spark, sf_dir, tmp_path):
    """MINHASH ingest FunctionSchema (r11 — minhash_function.go:29-39;
    test_milvus_client_minhash.py): the signature output computes from the
    input text at insert (JVM column expressions, no Python row path);
    searches pass query TEXT through the same function (precomputed
    signature arrays also accepted); param validation matches the
    reference's messages."""
    import pytest as _pt

    from milvus_spark.operators.text import minhash_signature_col

    client = _client(spark, tmp_path)
    d = spark.read.parquet(f"{sf_dir}/documents.parquet").select("doc_id", "text")
    client.create_collection("mfn", pk_field="doc_id", fields=["doc_id", "text"])
    client.add_function_field(
        "mfn",
        {
            "type": "MINHASH",
            "input_field": "text",
            "output_field": "sig",
            "params": {"num_hashes": _H, "shingle_size": 3},
        },
    )
    client.insert("mfn", d)
    # ingest computed the signature; it matches the declared kernel
    want = d.select(
        "doc_id", minhash_signature_col(F.col("text"), _H, 3).alias("sig")
    )
    got = client.query("mfn", output_fields=["doc_id", "sig"])
    assert got.exceptAll(want).count() == 0 and want.exceptAll(got).count() == 0
    client.create_index("mfn", "sig", "MINHASH_LSH", {"mh_lsh_band": _B})
    qtext = d.filter(F.col("doc_id") == 0).collect()[0].text
    hits = client.search("mfn", [qtext], limit=5, anns_field="sig")
    rows = sorted(hits.collect(), key=lambda r: r.rank)
    assert rows[0].doc_id == 0 and rows[0].score == 0.0
    # precomputed signature arrays take the same dispatch
    sig0 = client.query("mfn", filter="doc_id == 0", output_fields=["sig"]).collect()[0].sig
    arr_rows = sorted(
        client.search("mfn", [list(sig0)], limit=5, anns_field="sig").collect(),
        key=lambda r: r.rank,
    )
    assert [(r.doc_id, r.score) for r in arr_rows] == [
        (r.doc_id, r.score) for r in rows
    ]
    # char-level token_level and the refusal matrix
    with _pt.raises(ValueError, match="not a number"):
        client.add_function_field(
            "mfn", {"type": "MINHASH", "input_field": "text",
                    "output_field": "s2", "params": {"num_hashes": "x"}},
        )
    with _pt.raises(ValueError, match="must be positive"):
        client.add_function_field(
            "mfn", {"type": "MINHASH", "input_field": "text",
                    "output_field": "s2", "params": {"shingle_size": 0}},
        )
    with _pt.raises(ValueError, match="unknown token_level"):
        client.add_function_field(
            "mfn", {"type": "MINHASH", "input_field": "text",
                    "output_field": "s2", "params": {"token_level": "byte"}},
        )
    client.add_function_field(
        "mfn", {"type": "MINHASH", "input_field": "text", "output_field": "csig",
                "params": {"num_hashes": 4, "token_level": "char", "shingle_size": 4}},
    )
    client.insert("mfn", d.withColumn("doc_id", F.col("doc_id") + 10**6))
    crow = client.query(
        "mfn", filter="doc_id == 1000000", output_fields=["csig"]
    ).collect()[0]
    assert crow.csig is not None and len(crow.csig) == 4
    client.drop_collection("mfn")


def test_minhash_lsh_dedup_is_hash_aggregated(spark, sf_dir):
    """r11 optimization pin: the candidate dedup must compile to a hash
    aggregate over the scored double — NOT the old dropDuplicates shape
    whose first(sig)/first(qsig) array buffers forced two SortAggregates
    and dragged both signature arrays through the exchange. Scores are
    identical across a pair's duplicate band hits, so min(score) == score
    and results are pinned unchanged by the kernel reference test above."""
    sig = _sig_frame(spark, sf_dir, hi=60)
    bands = build_minhash_bands(sig, "sig", "doc_id", _H, _B)
    queries = [(0, list(sig.filter(F.col("doc_id") == 0).collect()[0].sig))]
    got = minhash_lsh_search(bands, queries, _H, _B, 5)
    plan = got._sc._jvm.PythonSQLUtils.explainString(
        got._jdf.queryExecution(), "formatted"
    )
    assert "SortAggregate" not in plan
    assert "first(sig" not in plan and "first(qsig" not in plan
    assert "HashAggregate" in plan and "min(score" in plan


def test_doc_signature_frame_memoized_per_session(spark, sf_dir):
    """r12 optimization pin: the corpus signature frame behind the
    cli_minhash_* serving rows is an analyzed-PLAN memo per
    (applicationId, sf) — fresh construction measured ~0.85 s/call of
    py4j expression building + Catalyst analysis vs ~0.08 s reusing the
    analyzed frame. The memo returns the SAME DataFrame object within a
    session (plan reuse; every action still executes from parquet) and
    its contents stay correct."""
    from milvus_spark.suites.addons_r11 import _doc_signatures, _H

    a = _doc_signatures(spark, sf_dir)
    b = _doc_signatures(spark, sf_dir)
    assert a is b  # plan-object reuse, keyed by (applicationId, sf)
    row = a.filter(F.col("doc_id") == 0).collect()[0]
    assert len(row.sig) == _H and all(isinstance(v, int) for v in row.sig)
