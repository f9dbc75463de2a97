"""SPARSE_WAND (common/Types.h:690-693 — knowhere's WAND search over the
sparse inverted layout; indexparamcheck sparse_float_vector_base_checker):
kernel exactness vs brute force, max-score early-termination engagement,
the distributed segment-partial merge, and the client index lifecycle
(build → dispatch → sealed+growing → refresh epoch → delete mask)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from milvus_spark.operators.rounding import round_half_up
from milvus_spark.operators.sparse_wand import (
    _segment_topk,
    wand_postings,
    wand_search,
)


def _brute(rows, qv, k):
    # canonical summation order (ascending dim per doc) — the engine's
    # convention since r12: at an exact half-decimal boundary the 4-decimal
    # rounding depends on the 1-ulp summation order, so "exact brute force"
    # is only well-defined with the order pinned (Hypothesis found the
    # 3.30015 knife edge; see test_summation_order_r12_falsifier_pinned)
    sc = {}
    for i, d, v in sorted(rows, key=lambda t: t[1]):
        if d in qv:
            sc[i] = sc.get(i, 0.0) + v * qv[d]
    return sorted(((round_half_up(s, 4), i) for i, s in sc.items()), key=lambda t: (-t[0], t[1]))[:k]


def test_wand_kernel_exact_fuzz():
    rng = np.random.default_rng(11)
    for trial in range(20):
        ndoc, ndim = int(rng.integers(20, 300)), int(rng.integers(5, 30))
        rows = []
        for i in range(ndoc):
            for d in rng.choice(ndim, int(rng.integers(1, min(ndim, 8) + 1)), replace=False):
                rows.append((i, int(d), float(rng.random())))
        pdf = pd.DataFrame(rows, columns=["id", "dim", "val"])
        qmap = {}
        for q in range(int(rng.integers(1, 4))):
            ds = rng.choice(ndim, int(rng.integers(1, min(ndim, 6) + 1)), replace=False)
            qmap[q] = {int(d): float(rng.random()) for d in ds}
        k = int(rng.integers(1, 12))
        got = _segment_topk(pdf, qmap, k, 4)
        for q, qv in qmap.items():
            exp = _brute(rows, qv, k)
            g = got[got.qid == q].sort_values(["score", "id"], ascending=[False, True])
            assert list(zip(g.score.round(4), g.id)) == exp, (trial, q)


def test_wand_early_termination_engages_and_stays_exact():
    """A skewed query over a dense segment must actually take the
    candidate-narrowing branch (the point of WAND) AND still return the
    exact brute-force top-k — pruned postings only ever belong to docs
    provably outside the rounded top-k."""
    rng = np.random.default_rng(5)
    rows = []
    for i in range(4000):
        for d in range(12):
            rows.append((i, d, float(rng.random())))
    pdf = pd.DataFrame(rows, columns=["id", "dim", "val"])
    qv = {d: float(2.0 ** -d) for d in range(12)}  # steeply skewed impacts
    stats: dict = {}
    got = _segment_topk(pdf, {0: qv}, 10, 4, stats=stats)
    assert stats.get("engaged", 0) >= 1, "early termination never engaged"
    assert stats.get("rows_skipped", 0) > 0, "no postings were skipped"
    exp = _brute(rows, qv, 10)
    g = got.sort_values(["score", "id"], ascending=[False, True])
    assert list(zip(g.score.round(4), g.id)) == exp


def test_wand_search_distributed_merge(spark):
    rng = np.random.default_rng(7)
    rows = [
        (int(i), int(d), float(rng.random()))
        for i in range(500)
        for d in rng.choice(40, 5, replace=False)
    ]
    df = spark.createDataFrame(rows, "id long, dim long, val double")
    post = df.withColumn(
        "sbucket", F.pmod(F.xxhash64("id"), F.lit(4)).cast("int")
    )
    queries = [(0, {1: 0.9, 5: 0.5, 17: 0.2}), (1, {3: 1.0, 4: 0.1})]
    got = wand_search(post, queries, k=7).orderBy("qid", "rank").collect()
    for qid, qv in queries:
        exp = _brute(rows, qv, 7)
        g = [(round(r.score, 4), r.id) for r in got if r.qid == qid]
        assert g == exp


def test_wand_postings_layout(spark, sf_dir):
    e = spark.read.parquet(f"{sf_dir}/embeddings.parquet").limit(50)
    v = F.col("embedding").cast("array<double>")
    sv = e.select(
        "vec_id",
        F.map_filter(
            F.map_from_arrays(F.sequence(F.lit(1), F.size(v)), v),
            lambda k, x: x > 0.15,
        ).alias("sv"),
    )
    post = wand_postings(sv, "sv", "vec_id", n_buckets=4)
    assert set(post.columns) == {"id", "dim", "val", "sbucket"}
    assert post.select("sbucket").distinct().count() <= 4
    # every (id, dim, val) matches the map content
    n_map = sv.select(F.sum(F.size("sv"))).first()[0]
    assert post.count() == n_map


def _sparse_frame(spark, sf_dir, n=300):
    e = spark.read.parquet(f"{sf_dir}/embeddings.parquet").filter(
        F.col("vec_id") < n
    )
    v = F.col("embedding").cast("array<double>")
    return e.select(
        "vec_id",
        F.map_filter(
            F.map_from_arrays(F.sequence(F.lit(1), F.size(v)), v),
            lambda k, x: x > 0.15,
        ).alias("sv"),
    )


def _expected(client, name, queries, k, exclude=()):
    rows = [
        (int(r["vec_id"]), {int(d): float(x) for d, x in (r["sv"] or {}).items()})
        for r in client._read(name).select("vec_id", "sv").collect()
        if r["vec_id"] not in exclude
    ]
    out = {}
    for qid, qv in queries:
        sc = [
            (round(sum(w * dv.get(d, 0.0) for d, w in qv.items()), 4), i)
            for i, dv in rows
            if any(d in dv for d in qv)
        ]
        out[qid] = sorted(sc, key=lambda t: (-t[0], t[1]))[:k]
    return out


def test_sparse_wand_client_lifecycle(spark, sf_dir, tmp_path):
    from milvus_spark.client import MilvusSparkClient

    client = MilvusSparkClient(spark, root=str(tmp_path))
    sv = _sparse_frame(spark, sf_dir)
    client.create_collection("sw", pk_field="vec_id")
    client.insert("sw", sv)
    client.create_index("sw", "sv", "SPARSE_WAND", {"n_buckets": 4})
    queries = [{1: 0.8, 3: 0.4, 7: 0.3}, {2: 1.0}]
    qlist = list(enumerate(queries))

    def _got():
        df = client.sparse_search("sw", queries, "sv", limit=5)
        return df, {
            qid: [(round(r.score, 4), r.vec_id) for r in df.collect() if r.qid == qid]
            for qid in (0, 1)
        }

    df, got = _got()
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "In(dim" in plan and "sbucket" in plan, "search did not read the WAND artifact"
    exp = _expected(client, "sw", qlist, 5)
    assert got == exp

    # sealed+growing: post-build insert serves without refresh
    delta = _sparse_frame(spark, sf_dir, n=340).filter(F.col("vec_id") >= 300)
    client.insert("sw", delta)
    df, got = _got()
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "In(dim" in plan and "sbucket" in plan, "growing delta dropped the index path"
    assert got == _expected(client, "sw", qlist, 5)

    # post-build delete masks at query time
    victim = got[0][0][1]
    client.delete("sw", ids=[int(victim)])
    df, got = _got()
    assert got == _expected(client, "sw", qlist, 5)
    assert victim not in [i for _, i in got[0]]

    # refresh folds the delta into a new epoch; still exact, still indexed
    client.refresh_index("sw", "sv", "SPARSE_WAND")
    ent = client.describe_index("sw", "sv", "SPARSE_WAND")
    assert ent["cur_epoch"] == 1 and ent["built_ts"] == client._current_ts("sw")
    df, got = _got()
    assert "sbucket" in df._jdf.queryExecution().executedPlan().toString()
    assert got == _expected(client, "sw", qlist, 5)
    client.drop_collection("sw")


def test_sparse_inverted_growing_merge(spark, sf_dir, tmp_path):
    from milvus_spark.client import MilvusSparkClient

    client = MilvusSparkClient(spark, root=str(tmp_path))
    sv = _sparse_frame(spark, sf_dir)
    client.create_collection("si", pk_field="vec_id")
    client.insert("si", sv)
    client.create_index("si", "sv", "SPARSE_INVERTED")
    queries = [{1: 0.8, 3: 0.4}]
    delta = _sparse_frame(spark, sf_dir, n=340).filter(F.col("vec_id") >= 300)
    client.insert("si", delta)
    df = client.sparse_search("si", queries, "sv", limit=5)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "In(dim" in plan, "growing delta dropped the index path"
    got = [(round(r.score, 4), r.vec_id) for r in df.collect()]
    assert got == _expected(client, "si", list(enumerate(queries)), 5)[0]
    client.drop_collection("si")


def test_sparse_wand_requires_map(spark, sf_dir, tmp_path):
    from milvus_spark.client import MilvusSparkClient

    client = MilvusSparkClient(spark, root=str(tmp_path))
    e = spark.read.parquet(f"{sf_dir}/embeddings.parquet").limit(10)
    client.create_collection("nm", pk_field="vec_id")
    client.insert("nm", e.select("vec_id", "embedding"))
    with pytest.raises(ValueError, match="map column"):
        client.create_index("nm", "embedding", "SPARSE_WAND")
    client.drop_collection("nm")


def test_sparse_algo_param_dispatch(spark, sf_dir, tmp_path):
    """inverted_index_algo (constraints.go:82): TAAT_NAIVE on a WAND
    layout keeps the dim-keyed posting join; DAAT_MAXSCORE on an INVERTED
    layout serves through the max-score kernel (synthetic segment
    sharding) — all four combinations exact, invalid algo refuses with
    the reference's message."""
    from milvus_spark.client import MilvusSparkClient

    client = MilvusSparkClient(spark, root=str(tmp_path))
    sv = _sparse_frame(spark, sf_dir, n=200)
    queries = [{1: 0.8, 3: 0.4}]
    exp = None
    for cname, itype, algo, kernel in [
        ("a1", "SPARSE_WAND", "TAAT_NAIVE", False),
        ("a2", "SPARSE_INVERTED", "DAAT_MAXSCORE", True),
        ("a3", "SPARSE_INVERTED", "BLOCK_MAX_WAND", True),
    ]:
        client.create_collection(cname, pk_field="vec_id")
        client.insert(cname, sv)
        client.create_index(cname, "sv", itype, {"inverted_index_algo": algo})
        df = client.sparse_search(cname, queries, "sv", limit=5)
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert ("FlatMapGroupsInPandas" in plan) == kernel, (cname, algo)
        got = [(round(r.score, 4), r.vec_id) for r in df.collect()]
        if exp is None:
            exp = _expected(client, cname, list(enumerate(queries)), 5)[0]
        assert got == exp, (cname, algo)
        client.drop_collection(cname)
    client.create_collection("bad", pk_field="vec_id")
    client.insert("bad", sv)
    with pytest.raises(ValueError, match="not found or not supported"):
        client.create_index("bad", "sv", "SPARSE_WAND", {"inverted_index_algo": "X"})
    client.drop_collection("bad")


def test_sparse_drop_ratio_build(spark, sf_dir, tmp_path):
    """drop_ratio_build (constraints.go:46): the smallest fraction of
    posting VALUES drops at build — the artifact slims by ~the ratio,
    serving returns exactly the top-k over the SLIMMED postings (the
    knowhere contract: approximation enters via the slimming, the scorer
    stays exact), and refresh epochs slim at the SAME threshold."""
    import os

    from milvus_spark.client import MilvusSparkClient

    client = MilvusSparkClient(spark, root=str(tmp_path))
    sv = _sparse_frame(spark, sf_dir, n=200)
    client.create_collection("dr", pk_field="vec_id")
    client.insert("dr", sv.filter(F.col("vec_id") % 2 == 0))
    ent = client.create_index("dr", "sv", "SPARSE_WAND", {"drop_ratio_build": 0.5})
    thr = ent["drop_threshold"]
    assert thr > 0.15  # above the map's own non-zero floor
    post = spark.read.parquet(os.path.join(ent["path"], "posting"))
    full = sv.filter(F.col("vec_id") % 2 == 0).select(F.sum(F.size("sv"))).first()[0]
    kept = post.count()
    assert 0.3 * full < kept < 0.7 * full, (kept, full)
    assert post.select(F.min("val")).first()[0] > thr
    # refresh epoch slims at the same threshold
    client.insert("dr", sv.filter(F.col("vec_id") % 2 == 1))
    client.refresh_index("dr", "sv", "SPARSE_WAND")
    post = spark.read.parquet(os.path.join(ent["path"], "posting"))
    assert post.select(F.min("val")).first()[0] > thr
    # serving = exact top-k over the slimmed postings
    queries = [{1: 0.8, 3: 0.4, 7: 0.3}]
    got = [
        (round(r.score, 4), r.vec_id)
        for r in client.sparse_search("dr", queries, "sv", limit=5).collect()
    ]
    rows = [
        (int(r["id"]), int(r["dim"]), float(r["val"]))
        for r in post.select("id", "dim", "val").collect()
    ]
    assert got == _brute(rows, queries[0], 5)
    with pytest.raises(ValueError, match="drop_ratio_build"):
        client.create_index("dr", "sv", "SPARSE_INVERTED", {"drop_ratio_build": 1.0})
    client.drop_collection("dr")


def test_sparse_grouping_search(spark, sf_dir, tmp_path):
    """group_by_field over sparse search: the dim-keyed join scores every
    matching doc, so the shared grouping merge is EXACT — verified against
    a from-scratch recompute; quota structure holds."""
    from milvus_spark.client import MilvusSparkClient

    client = MilvusSparkClient(spark, root=str(tmp_path))
    e = spark.read.parquet(f"{sf_dir}/embeddings.parquet").filter(F.col("vec_id") < 300)
    v = F.col("embedding").cast("array<double>")
    sv = e.select(
        "vec_id",
        "label",
        F.map_filter(
            F.map_from_arrays(F.sequence(F.lit(1), F.size(v)), v),
            lambda k, x: x > 0.15,
        ).alias("sv"),
    )
    client.create_collection("sg", pk_field="vec_id")
    client.insert("sg", sv)
    client.create_index("sg", "sv", "SPARSE_WAND")
    queries = [{1: 0.8, 3: 0.4, 7: 0.3}]
    got = client.sparse_search(
        "sg", queries, "sv", limit=3, group_by_field="label", group_size=2
    )
    rows = got.collect()
    labels = {r["vec_id"]: r["label"] for r in sv.select("vec_id", "label").collect()}
    exp = _expected(client, "sg", [(0, queries[0])], 10**9)[0]  # all scored docs
    by_group: dict = {}
    for s, i in exp:
        by_group.setdefault(labels[i], []).append((s, i))
    kept = {g: sorted(v, key=lambda t: (-t[0], t[1]))[:2] for g, v in by_group.items()}
    top_groups = sorted(kept, key=lambda g: (-kept[g][0][0], g))[:3]
    want = sorted(
        (0, g, i, s, gr + 1)
        for gr, g in enumerate(top_groups)
        for s, i in kept[g]
    )
    assert sorted((r.qid, r.label, r.vec_id, round(r.score, 4), r.grank) for r in rows) == want
    client.drop_collection("sg")


def test_sparse_range_search_and_drop_ratio(spark, sf_dir, tmp_path):
    """radius/range_filter on sparse search follow the dense range
    contract (IP descending: score > radius, score <= range_filter) and
    serve on the full-scoring path even when a WAND index exists — an
    inner range_filter excludes hits the kernel would prune.
    drop_ratio_search drops the smallest fraction of QUERY values before
    scoring (knowhere's knob; deliberately approximate)."""
    from milvus_spark.client import MilvusSparkClient

    client = MilvusSparkClient(spark, root=str(tmp_path))
    sv = _sparse_frame(spark, sf_dir)
    client.create_collection("sr", pk_field="vec_id")
    client.insert("sr", sv)
    client.create_index("sr", "sv", "SPARSE_WAND")
    queries = [{1: 0.8, 3: 0.4, 7: 0.3}]
    full = _expected(client, "sr", [(0, queries[0])], 10**9)[0]
    lo = full[min(5, len(full) - 1)][0]  # inner bound excludes the best hits
    got = [
        (round(r.score, 4), r.vec_id)
        for r in client.sparse_search(
            "sr", queries, "sv", limit=10, radius=0.1, range_filter=lo
        ).collect()
    ]
    want = [(s, i) for s, i in full if 0.1 < s <= lo][:10]
    assert got == want and got, (got[:3], want[:3])
    # drop_ratio_search: the two heaviest of three query dims survive
    got_d = [
        r.vec_id
        for r in client.sparse_search(
            "sr", queries, "sv", limit=5, drop_ratio_search=0.34
        ).collect()
    ]
    kept = {k: v for k, v in list(sorted(queries[0].items(), key=lambda t: (t[1], t[0])))[1:]}
    want_d = [i for _, i in _expected(client, "sr", [(0, kept)], 5)[0]]
    assert got_d == want_d
    import pytest as _pt

    with _pt.raises(ValueError, match="drop_ratio_search"):
        client.sparse_search("sr", queries, "sv", drop_ratio_search=1.0)
    client.drop_collection("sr")


# --- property-based exactness: the kernel IS brute force, always ------------
try:
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @st.composite
    def _sparse_case(draw):
        ndoc = draw(st.integers(5, 120))
        ndim = draw(st.integers(2, 24))
        rows = []
        for i in range(ndoc):
            nnz = draw(st.integers(1, min(ndim, 6)))
            dims = draw(
                st.lists(
                    st.integers(0, ndim - 1), min_size=nnz, max_size=nnz, unique=True
                )
            )
            for d in dims:
                # adversarial values: ties, zeros, tiny gaps near the
                # rounded-domain margin, and large magnitudes
                v = draw(
                    st.one_of(
                        st.floats(0.0001, 3.0, allow_nan=False),
                        st.sampled_from([0.5, 0.5, 0.25, 1.0, 0.0001, 0.00015]),
                    )
                )
                rows.append((i, int(d), float(v)))
        nq = draw(st.integers(1, 3))
        qmap = {}
        for q in range(nq):
            nnz = draw(st.integers(1, min(ndim, 5)))
            dims = draw(
                st.lists(
                    st.integers(0, ndim - 1), min_size=nnz, max_size=nnz, unique=True
                )
            )
            qmap[q] = {
                int(d): float(
                    draw(st.floats(0.001, 2.0, allow_nan=False))
                )
                for d in dims
            }
        k = draw(st.integers(1, 15))
        return rows, qmap, k

    @given(_sparse_case())
    @settings(max_examples=40, deadline=None)
    def test_wand_kernel_hypothesis_exact(case):
        rows, qmap, k = case
        pdf = pd.DataFrame(rows, columns=["id", "dim", "val"])
        got = _segment_topk(pdf, qmap, k, 4)
        for q, qv in qmap.items():
            exp = _brute(rows, qv, k)
            g = got[got.qid == q].sort_values(
                ["score", "id"], ascending=[False, True]
            )
            assert list(zip(g.score.round(4), g.id)) == exp

except ImportError:  # pragma: no cover - hypothesis is baked in
    pass


def test_summation_order_r12_falsifier_pinned():
    """The exact case Hypothesis found in round 12: doc {0: 0.5,
    1: 0.00015, 2: 1.5} against query {0: 1.65, 1: 1.0, 2: 1.65} scores
    exactly 3.30015 in decimal — a half-decimal tie whose 4-decimal
    rounding flips with the 1-ulp float summation order
    ((0.825+2.475)+0.00015 = 3.30015 rounds up to 3.3002, but
    (0.825+0.00015)+2.475 = 3.3001499999999995 rounds down to 3.3001).
    The kernel's max-score pass
    accumulates legs in DATA-dependent impact order, so reported scores
    must come from the canonical ascending-dim rescore of the surviving
    pool — pinned here deterministically."""
    rows = [
        (0, 0, 0.5), (0, 1, 0.00015), (0, 2, 1.5),   # the knife-edge doc
        (1, 0, 1.5),                                   # makes dim0 the top leg
        (2, 2, 0.5),
    ]
    qv = {0: 1.65, 1: 1.0, 2: 1.65}
    pdf = pd.DataFrame(rows, columns=["id", "dim", "val"])
    got = _segment_topk(pdf, {0: qv}, 3, 4)
    g = got[got.qid == 0].sort_values(["score", "id"], ascending=[False, True])
    assert list(zip(g.score.round(4), g.id)) == _brute(rows, qv, 3)
    # the canonical ascending-dim sum lands just BELOW the boundary here
    assert _brute(rows, qv, 3)[0] == (3.3001, 0)


def test_rounding_convention_r10_falsifier_pinned():
    """The exact case Hypothesis found in round 10: query weight 0.001 over
    a doc value 0.25 — the product 0.000250000000000000005… must round to
    0.0003 (the engine's half-away-from-zero convention, matching DuckDB
    ROUND / Spark F.round / Python round), NOT np.round's 0.0002. Pinned
    deterministically so the convention can never silently regress."""
    assert round_half_up(0.25 * 0.001, 4) == 0.0003
    assert float(np.round(0.25 * 0.001, 4)) == 0.0002  # why np.round is banned
    # two docs meet at the k boundary on exactly this midpoint: doc 1
    # scores 0.000250000000000000005… (rounds UP to 0.0003) and doc 0
    # scores 0.00026 (0.0003 under any convention). Under the pinned
    # convention they TIE at 0.0003 and doc 0 wins the id tie-break;
    # under np.round doc 1 would fall to 0.0002 and lose outright — the
    # ordering the falsified r10 test caught.
    rows = [(0, 7, 0.26), (1, 7, 0.25)]
    pdf = pd.DataFrame(rows, columns=["id", "dim", "val"])
    got = _segment_topk(pdf, {0: {7: 0.001}}, 2, 4)
    g = got.sort_values(["score", "id"], ascending=[False, True])
    assert list(zip(g.score, g.id)) == [(0.0003, 0), (0.0003, 1)]
    assert _brute(rows, {7: 0.001}, 2) == [(0.0003, 0), (0.0003, 1)]


def test_rounding_convention_matches_duckdb():
    """round_half_up must stay bit-identical to DuckDB ROUND(DOUBLE, 4) —
    the oracle the correctness gate hash-compares every score against.
    Fuzz includes an adversarial band of near-midpoint products (odd
    multiples of 0.5e-4 plus ±1e-12 jitter), the class np.round gets wrong."""
    import duckdb

    rng = np.random.default_rng(42)
    vals = np.concatenate(
        [
            rng.random(50_000),
            rng.random(50_000) * 1e-3,
            (rng.integers(0, 20_000, 100_000).astype(np.float64) * 2 + 1) / 2e4
            + rng.normal(0, 1e-12, 100_000),
            -rng.random(25_000),
        ]
    )
    hu = round_half_up(vals, 4)
    con = duckdb.connect()
    con.register("t", pd.DataFrame({"x": vals}))
    dk = con.sql("select round(x, 4) from t").fetchnumpy()["round(x, 4)"]
    assert int((hu != dk).sum()) == 0


def test_sparse_inverted_refresh_delete_lifecycle(spark, sf_dir, tmp_path):
    """r11 regression (ADVICE): SPARSE_INVERTED base postings must carry
    _epoch=0 like every sibling family — refresh appends _epoch-stamped
    files into the same dir, and a null base epoch makes the delete-mask
    condition (epoch_col < bound) evaluate NULL, resurrecting deleted docs
    in sparse_search after a refresh."""
    from milvus_spark.client import MilvusSparkClient

    client = MilvusSparkClient(spark, root=str(tmp_path))
    sv = _sparse_frame(spark, sf_dir)
    client.create_collection("sir", pk_field="vec_id")
    client.insert("sir", sv)
    client.create_index("sir", "sv", "SPARSE_INVERTED")
    ent = client.describe_index("sir", "sv", "SPARSE_INVERTED")
    assert ent.get("cur_epoch") == 0
    queries = [{1: 0.8, 3: 0.4, 7: 0.3}]
    qlist = list(enumerate(queries))

    def _got():
        df = client.sparse_search("sir", queries, "sv", limit=5)
        return [(round(r.score, 4), r.vec_id) for r in df.collect()]

    assert _got() == _expected(client, "sir", qlist, 5)[0]
    # fold a growing delta into a new epoch
    delta = _sparse_frame(spark, sf_dir, n=340).filter(F.col("vec_id") >= 300)
    client.insert("sir", delta)
    client.refresh_index("sir", "sv", "SPARSE_INVERTED")
    ent = client.describe_index("sir", "sv", "SPARSE_INVERTED")
    assert ent["cur_epoch"] == 1
    got = _got()
    assert got == _expected(client, "sir", qlist, 5)[0]
    # delete a top hit AFTER the refresh: the mask bound must beat the
    # base rows' epoch (0) — with a null base epoch the victim resurrects
    victim = got[0][1]
    client.delete("sir", ids=[int(victim)])
    got = _got()
    assert victim not in [i for _, i in got]
    assert got == _expected(client, "sir", qlist, 5, exclude={victim})[0]
    # second refresh keeps accounting consistent (epoch 2, still exact)
    delta2 = _sparse_frame(spark, sf_dir, n=380).filter(F.col("vec_id") >= 340)
    client.insert("sir", delta2)
    client.refresh_index("sir", "sv", "SPARSE_INVERTED")
    assert client.describe_index("sir", "sv", "SPARSE_INVERTED")["cur_epoch"] == 2
    got = _got()
    assert victim not in [i for _, i in got]
    assert got == _expected(client, "sir", qlist, 5, exclude={victim})[0]
    client.drop_collection("sir")


def test_sparse_wand_taat_sealed_growing(spark, sf_dir, tmp_path):
    """r11 regression (ADVICE): a SPARSE_WAND index served with
    inverted_index_algo=TAAT_NAIVE selects sbucket from the sealed
    artifact, so the growing delta must also carry sbucket or the
    unionByName crashes on the first post-build insert."""
    from milvus_spark.client import MilvusSparkClient

    client = MilvusSparkClient(spark, root=str(tmp_path))
    sv = _sparse_frame(spark, sf_dir, n=200)
    client.create_collection("swt", pk_field="vec_id")
    client.insert("swt", sv)
    client.create_index(
        "swt", "sv", "SPARSE_WAND", {"inverted_index_algo": "TAAT_NAIVE"}
    )
    queries = [{1: 0.8, 3: 0.4}]
    delta = _sparse_frame(spark, sf_dir, n=340).filter(F.col("vec_id") >= 200)
    client.insert("swt", delta)  # post-build insert -> sealed+growing union
    df = client.sparse_search("swt", queries, "sv", limit=5)
    got = [(round(r.score, 4), r.vec_id) for r in df.collect()]
    assert got == _expected(client, "swt", list(enumerate(queries)), 5)[0]
    client.drop_collection("swt")


def test_default_n_buckets_scales_with_input(spark, sf_dir):
    """r11: the SPARSE_WAND segment-bucket default derives from the input
    size estimate (~256 MB/segment, floor 8 so local artifacts stay
    byte-identical, cap 4096) instead of a constant tuned for local mode;
    an explicit n_buckets build param still wins (pinned elsewhere)."""
    from milvus_spark.operators.sparse_wand import default_n_buckets

    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    assert default_n_buckets(d) == 8  # tiny fixture estimates below one target
    assert default_n_buckets(est_bytes=0) == 8
    assert default_n_buckets(est_bytes=100 << 30) == (100 << 30) // (256 << 20) + 1
    assert default_n_buckets(est_bytes=1 << 50) == 4096
