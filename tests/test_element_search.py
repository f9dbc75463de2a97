"""Element-level / embedding-list search over struct-array vector fields,
checked against numpy ground truth and through the client facade.

Reference contracts (file:line into /root/reference):
  - element vs emb-list classification by placeholder shape:
    internal/proxy/struct_hybrid_search.go:181-200
  - element_scope.collapse strategies max/sum/avg/topk_sum/topk_avg:
    struct_hybrid_search.go:22-31,113-149
  - sum-family collapse restricted to positively-related metrics:
    struct_hybrid_search.go:166-177
  - element_filter restricting participating elements:
    query/PlanProto.cpp:644-690 (IterativeElementFilterNode)
"""

from __future__ import annotations

import numpy as np

from milvus_spark.operators.rounding import round_half_up
import pytest
from pyspark.sql import functions as F

from milvus_spark.operators.element_search import element_search, emb_list_search

DIM = 4
rng = np.random.default_rng(7)


def r4(x: float) -> float:
    """Round like Spark's F.round (HALF_UP), not Python's banker's round."""
    from decimal import ROUND_HALF_UP, Decimal

    return float(Decimal(repr(float(x))).quantize(Decimal("0.0001"), rounding=ROUND_HALF_UP))

# 6 docs, variable element counts; element tag = 10*doc + j
DOCS = {d: rng.normal(size=(n, DIM)).round(3) for d, n in zip(range(6), [3, 5, 1, 4, 2, 3])}
QS = rng.normal(size=(2, DIM)).round(3)


@pytest.fixture(scope="module")
def struct_df(spark):
    rows = [
        (
            d,
            d % 2,
            [(10 * d + j, [float(x) for x in v]) for j, v in enumerate(vs)],
        )
        for d, vs in DOCS.items()
    ]
    return spark.createDataFrame(
        rows, "doc_id long, grp long, items array<struct<tag:long, vec:array<float>>>"
    )


def np_score(v, q, metric):
    if metric == "IP":
        return float(v @ q)
    if metric == "COSINE":
        nv, nq = np.linalg.norm(v), np.linalg.norm(q)
        return float(v @ q / (nv * nq)) if nv > 0 and nq > 0 else 0.0
    return float(((v - q) ** 2).sum())  # L2 squared


def np_element_hits(metric, k, pred=lambda d, j: True):
    out = {}
    for qi, q in enumerate(QS):
        hits = [
            (r4(np_score(np.asarray(v, dtype=float), q, metric)), d, j)
            for d, vs in DOCS.items()
            for j, v in enumerate(vs)
            if pred(d, j)
        ]
        asc = metric == "L2"
        hits.sort(key=lambda h: (h[0] if asc else -h[0], h[1], h[2]))
        out[qi] = [(d, j, s) for s, d, j in hits[:k]]
    return out


@pytest.mark.parametrize("metric", ["IP", "COSINE", "L2"])
def test_element_hits_ground_truth(struct_df, metric):
    got = element_search(
        struct_df, [(0, QS[0]), (1, QS[1])], "items", "vec", "doc_id",
        metric=metric, k=5,
    ).collect()
    want = np_element_hits(metric, 5)
    by_q = {}
    for r in sorted(got, key=lambda r: (r.qid, r.rank)):
        by_q.setdefault(r.qid, []).append((r.doc_id, r.element_idx, round(r.score, 4)))
    assert by_q == want


def test_element_filter_preserves_original_idx(struct_df):
    # restrict to odd tags: surviving element_idx values must be the ORIGINAL
    # array offsets (1, 3, ...), not repacked 0..n
    got = element_search(
        struct_df, [(0, QS[0])], "items", "vec", "doc_id",
        metric="IP", k=20,
        element_pred=lambda e: e["tag"] % 2 == 1,
    ).collect()
    assert got, "expected hits"
    assert all(r.element_idx % 2 == 1 for r in got)
    want = np_element_hits("IP", 20, pred=lambda d, j: (10 * d + j) % 2 == 1)[0]
    assert [(r.doc_id, r.element_idx, round(r.score, 4)) for r in
            sorted(got, key=lambda r: r.rank)] == want


def np_collapse(metric, strategy, topk=0, pred=lambda d, j: True):
    out = {}
    asc = metric == "L2"
    for qi, q in enumerate(QS):
        docs = []
        for d, vs in DOCS.items():
            ss = [
                r4(np_score(np.asarray(v, dtype=float), q, metric))
                for j, v in enumerate(vs)
                if pred(d, j)
            ]
            if not ss:
                continue
            if strategy == "max":
                s = min(ss) if asc else max(ss)
            elif strategy == "sum":
                s = sum(ss)
            elif strategy == "avg":
                s = sum(ss) / len(ss)
            else:
                best = sorted(ss, reverse=not asc)[:topk]
                s = sum(best) if strategy == "topk_sum" else sum(best) / len(best)
            docs.append((r4(s), d))
        docs.sort(key=lambda h: (h[0] if asc else -h[0], h[1]))
        out[qi] = [(d, s) for s, d in docs]
    return out


@pytest.mark.parametrize(
    "metric,strategy,topk",
    [
        ("IP", "max", 0),
        ("L2", "max", 0),
        ("COSINE", "sum", 0),
        ("IP", "avg", 0),
        ("IP", "topk_sum", 2),
        ("COSINE", "topk_avg", 2),
    ],
)
def test_collapse_strategies(struct_df, metric, strategy, topk):
    collapse = {"strategy": strategy}
    if topk:
        collapse["topk"] = topk
    got = element_search(
        struct_df, [(0, QS[0]), (1, QS[1])], "items", "vec", "doc_id",
        metric=metric, k=10, collapse=collapse,
    ).collect()
    want = np_collapse(metric, strategy, topk)
    by_q = {}
    for r in sorted(got, key=lambda r: (r.qid, r.rank)):
        by_q.setdefault(r.qid, []).append((r.doc_id, round(r.score, 4)))
    assert by_q == want


def test_collapse_validation(struct_df):
    qs = [(0, QS[0])]
    with pytest.raises(ValueError, match="strategy"):
        element_search(struct_df, qs, "items", "vec", "doc_id",
                       collapse={"strategy": "median"})
    with pytest.raises(ValueError, match="topk is required"):
        element_search(struct_df, qs, "items", "vec", "doc_id",
                       collapse={"strategy": "topk_sum"})
    with pytest.raises(ValueError, match="only valid for topk"):
        element_search(struct_df, qs, "items", "vec", "doc_id",
                       collapse={"strategy": "max", "topk": 3})
    # sum-family needs a positively-related metric
    with pytest.raises(ValueError, match="positively related"):
        element_search(struct_df, qs, "items", "vec", "doc_id",
                       metric="L2", collapse={"strategy": "sum"})


def test_emb_list_maxsim(struct_df):
    qlists = [(0, [QS[0], QS[1]])]
    got = emb_list_search(
        struct_df, qlists, "items", "vec", "doc_id", metric="MAX_SIM_IP", k=6
    ).collect()
    want = []
    for d, vs in DOCS.items():
        V = np.asarray(vs, dtype=float)
        s = sum(r4(float((V @ q).max())) for q in QS)
        want.append((r4(s), d))
    want.sort(key=lambda h: (-h[0], h[1]))
    assert [(r.doc_id, round(r.score, 4)) for r in
            sorted(got, key=lambda r: r.rank)] == [(d, s) for s, d in want]


def test_emb_list_l2_negated(struct_df):
    qlists = [(0, [QS[0]])]
    got = emb_list_search(
        struct_df, qlists, "items", "vec", "doc_id", metric="MAX_SIM_L2", k=3
    ).collect()
    want = []
    for d, vs in DOCS.items():
        V = np.asarray(vs, dtype=float)
        dist = ((V - QS[0]) ** 2).sum(axis=1)
        want.append((r4(-float(round_half_up(dist, 4).min())), d))
    want.sort(key=lambda h: (-h[0], h[1]))
    assert [(r.doc_id, round(r.score, 4)) for r in
            sorted(got, key=lambda r: r.rank)] == [(d, s) for s, d in want[:3]]


# ---- client facade ------------------------------------------------------------
def test_client_struct_array_search(spark, struct_df, tmp_path):
    from milvus_spark.client import MilvusSparkClient

    c = MilvusSparkClient(spark, root=str(tmp_path))
    c.create_collection("sa", "doc_id", vector_field="items[vec]", metric_type="IP")
    c.insert("sa", struct_df)

    # element-level with element_filter + doc predicate + collapse
    hits = c.search(
        "sa",
        [list(map(float, QS[0]))],
        limit=5,
        anns_field="items[vec]",
        filter="grp == 0 && element_filter(items, $[tag] % 2 == 0)",
        search_params={"element_scope": {"collapse": {"strategy": "max"}}},
    ).collect()
    want = np_collapse("IP", "max", pred=lambda d, j: (10 * d + j) % 2 == 0)[0]
    want = [(d, s) for d, s in want if d % 2 == 0][:5]
    assert [(r.doc_id, round(r.score, 4)) for r in
            sorted(hits, key=lambda r: r.rank)] == want

    # element-level hits without collapse carry element_idx
    ehits = c.search(
        "sa", [list(map(float, QS[0]))], limit=4, anns_field="items[vec]"
    ).collect()
    assert {"qid", "doc_id", "element_idx", "score", "rank"} <= {
        f for r in ehits for f in r.asDict()
    }
    want_e = np_element_hits("IP", 4)[0]
    assert [(r.doc_id, r.element_idx, round(r.score, 4)) for r in
            sorted(ehits, key=lambda r: r.rank)] == want_e

    # emb-list: nested query → MAX_SIM path
    lhits = c.search(
        "sa", [[list(map(float, QS[0])), list(map(float, QS[1]))]],
        limit=3, anns_field="items[vec]",
    ).collect()
    assert len(lhits) == 3 and all(r.qid == 0 for r in lhits)

    # validation: element_scope rejected for emb-list queries
    with pytest.raises(ValueError, match="element-level"):
        c.search(
            "sa", [[list(map(float, QS[0]))]], anns_field="items[vec]",
            search_params={"element_scope": {"collapse": {"strategy": "max"}}},
        )
    # validation: element_filter must target the anns struct array
    c.create_collection("sa2", "doc_id", vector_field="items[vec]")
    with pytest.raises(ValueError, match="unsupported element_scope key"):
        c.search(
            "sa", [list(map(float, QS[0]))], anns_field="items[vec]",
            search_params={"element_scope": {"collapse": {"strategy": "max"}, "x": 1}},
        )


# ---- hybrid search over struct-array sub-fields -------------------------------
def np_rrf(rank_lists, K=60):
    """rank_lists: list of {key: rank}; returns [(key, fused_score)] ordered
    like rrf_fusion (score desc, packed string key asc)."""
    scores = {}
    for ranks in rank_lists:
        for key, rk in ranks.items():
            scores[key] = scores.get(key, 0.0) + 1.0 / (K + rk)
    items = [(k, r4(s)) for k, s in scores.items()]
    items.sort(key=lambda kv: (-kv[1], kv[0] if isinstance(kv[0], str) else kv[0]))
    return items


def test_hybrid_same_struct_element_level(spark, struct_df, tmp_path):
    """All-element-level same-struct hybrid fuses at ELEMENT identity
    (inferElementLevelHybrid + hybridElementKey,
    struct_hybrid_search.go:211-239): results carry (pk, element_idx)."""
    from milvus_spark.client import MilvusSparkClient

    c = MilvusSparkClient(spark, root=str(tmp_path))
    c.create_collection("sah", "doc_id", vector_field="items[vec]", metric_type="IP")
    c.insert("sah", struct_df)
    got = c.hybrid_search(
        "sah",
        [
            {"data": [list(map(float, QS[0]))], "anns_field": "items[vec]", "limit": 10},
            {"data": [list(map(float, QS[1]))], "anns_field": "items[vec]", "limit": 10},
        ],
        rerank="rrf",
        limit=5,
    ).collect()
    per_req = []
    for qi in range(2):
        hits = np_element_hits("IP", 10)[qi]
        per_req.append(
            {
                f"__milvus_element_key\x1f{d}\x1f{j}": rk + 1
                for rk, (d, j, _s) in enumerate(hits)
            }
        )
    want = np_rrf(per_req)[:5]
    got_keys = [
        (f"__milvus_element_key\x1f{r.doc_id}\x1f{r.element_idx}", round(r.score, 4))
        for r in sorted(got, key=lambda r: r.rank)
    ]
    assert got_keys == want
    # element_scope must be rejected in this mode
    with pytest.raises(ValueError, match="same-struct element-level"):
        c.hybrid_search(
            "sah",
            [
                {
                    "data": [list(map(float, QS[0]))],
                    "anns_field": "items[vec]",
                    "search_params": {"element_scope": {"collapse": {"strategy": "max"}}},
                },
                {"data": [list(map(float, QS[1]))], "anns_field": "items[vec]"},
            ],
        )


def test_hybrid_mixed_element_collapses_to_doc(spark, struct_df, tmp_path):
    """Mixed-kind hybrid: the element-level sub-search collapses per doc
    (default strategy max, defaultElementCollapseConfig) before doc-level
    fusion with the emb-list sub-search."""
    from milvus_spark.client import MilvusSparkClient

    c = MilvusSparkClient(spark, root=str(tmp_path))
    c.create_collection("sam", "doc_id", vector_field="items[vec]", metric_type="IP")
    c.insert("sam", struct_df)
    got = c.hybrid_search(
        "sam",
        [
            {"data": [list(map(float, QS[0]))], "anns_field": "items[vec]", "limit": 6},
            {
                "data": [[list(map(float, QS[0])), list(map(float, QS[1]))]],
                "anns_field": "items[vec]",
                "limit": 6,
            },
        ],
        rerank="rrf",
        limit=4,
    ).collect()
    # req 1: collapse-max doc ranks; req 2: emb-list MAX_SIM doc ranks
    col = np_collapse("IP", "max")[0][:6]
    r1 = {d: rk + 1 for rk, (d, _s) in enumerate(col)}
    ml = []
    for d, vs in DOCS.items():
        V = np.asarray(vs, dtype=float)
        ml.append((r4(sum(r4(float((V @ q).max())) for q in QS)), d))
    ml.sort(key=lambda h: (-h[0], h[1]))
    r2_ranks = {d: rk + 1 for rk, (_s, d) in enumerate(ml[:6])}
    want = np_rrf([r1, r2_ranks])[:4]
    assert [(r.doc_id, round(r.score, 4)) for r in sorted(got, key=lambda r: r.rank)] == want


def test_element_scope_rejected_on_normal_field(spark, tmp_path):
    from milvus_spark.client import MilvusSparkClient

    c = MilvusSparkClient(spark, root=str(tmp_path))
    c.create_collection("nrm", "id", vector_field="emb", metric_type="IP")
    df = spark.createDataFrame(
        [(i, [float(i), 1.0]) for i in range(4)], "id long, emb array<float>"
    )
    c.insert("nrm", df)
    with pytest.raises(ValueError, match="element-level"):
        c.search(
            "nrm", [[1.0, 0.0]],
            search_params={"element_scope": {"collapse": {"strategy": "max"}}},
        )
