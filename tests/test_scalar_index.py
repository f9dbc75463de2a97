"""Materialized scalar index tier (r9 — ScalarIndexSort.cpp /
BitmapIndex.cpp / InvertedIndexTantivy / StringIndexMarisa analogs):
kernel parity vs the column-scan path, pruned-read plan pins, the client
index lifecycle (build → dispatch → sealed+growing → refresh → delete
mask → upsert), and the refusal matrix."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from milvus_spark.operators.scalar_index import (
    build_bitmap,
    build_inverted,
    build_sorted,
    overlapping_sort_buckets,
    prefix_upper,
    py_vbucket,
    read_sorted_range,
    read_value_postings,
)


def _docs(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def _orders(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/orders.parquet")


def test_inverted_and_bitmap_postings_equal_scan(spark, sf_dir):
    d = _docs(spark, sf_dir)
    inv = build_inverted(d, "source", "doc_id")
    want = {r.doc_id for r in d.filter(F.col("source").isin("src3", "src7")).collect()}
    got = {r.id for r in read_value_postings(inv, ["src3", "src7"]).collect()}
    assert got == want and got
    bm = build_bitmap(d, "lang", "doc_id", cardinality_limit=10)
    want = {r.doc_id for r in d.filter(F.col("lang") == "fr").collect()}
    got = {
        i
        for r in read_value_postings(bm, ["fr"]).collect()
        for i in r.ids
    }
    assert got == want and got


def test_bitmap_cardinality_refusal(spark, sf_dir):
    d = _docs(spark, sf_dir)
    with pytest.raises(ValueError, match="cardinality"):
        build_bitmap(d, "doc_id", "doc_id", cardinality_limit=10)


def test_prefix_upper_lemma():
    assert prefix_upper("al") == "am"
    assert prefix_upper("a" + chr(0x10FFFF)) == "b"
    assert prefix_upper(chr(0x10FFFF)) is None
    # the trie-range lemma: p <= s < upper(p)  <=>  s.startswith(p)
    for s in ("al", "alpha", "am", "ak", "alz", "b", ""):
        inside = "al" <= s < prefix_upper("al")
        assert inside == s.startswith("al"), s


def test_sorted_range_equal_scan(spark, sf_dir):
    o = _orders(spark, sf_dir)
    art, bounds = build_sorted(o, "o_totalprice", "o_orderkey")
    art = art.cache()
    for lo, hi, li, hi_i in [(1000, 5000, True, True), (None, 2000, True, False), (90000, None, False, True)]:
        cond = F.lit(True)
        if lo is not None:
            cond = cond & (F.col("o_totalprice") >= lo if li else F.col("o_totalprice") > lo)
        if hi is not None:
            cond = cond & (F.col("o_totalprice") <= hi if hi_i else F.col("o_totalprice") < hi)
        want = {r.o_orderkey for r in o.filter(cond).collect()}
        got = {r.id for r in read_sorted_range(art, bounds, lo, hi, li, hi_i).collect()}
        assert got == want
    art.unpersist()


def test_overlapping_sort_buckets():
    bounds = [10, 20, 30]  # buckets: (-inf,10], (10,20], (20,30], (30,inf)
    assert overlapping_sort_buckets(bounds, 12, 18) == [1]
    assert overlapping_sort_buckets(bounds, 10, 10) == [0]
    assert overlapping_sort_buckets(bounds, 5, 25) == [0, 1, 2]
    assert overlapping_sort_buckets(bounds, 35, None) == [3]
    assert overlapping_sort_buckets(bounds, None, None) == [0, 1, 2, 3]


def test_value_posting_read_prunes_partitions(spark, sf_dir, tmp_path):
    """The 100 TB posture pin: equality/IN reads ONLY the matching values'
    posting lists — vbucket prunes directories at file listing, the value
    predicate reaches the row groups."""
    import re

    d = _docs(spark, sf_dir)
    path = str(tmp_path / "posting")
    build_inverted(d, "source", "doc_id").write.partitionBy("vbucket").parquet(path)
    stored = spark.read.parquet(path)
    q = read_value_postings(stored, ["src3", "src7"])
    plan = q._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "vbucket" in plan
    assert "value" in plan.split("PushedFilters")[1][:400]
    want = {py_vbucket("src3"), py_vbucket("src7")}
    m = re.search(r"vbucket#\d+ IN \(([\d,\s]*)\)", plan)
    got = {int(x) for x in m.group(1).split(",")}
    assert got == want


def test_sorted_read_prunes_buckets(spark, sf_dir, tmp_path):
    """Range pin: only the overlapping sorted-bucket directories list."""
    import re

    o = _orders(spark, sf_dir)
    art, bounds = build_sorted(o, "o_totalprice", "o_orderkey")
    path = str(tmp_path / "sorted")
    art.write.partitionBy("sbucket").parquet(path)
    stored = spark.read.parquet(path)
    lo, hi = float(bounds[1]), float(bounds[2])  # spans buckets 1..3
    q = read_sorted_range(stored, bounds, lo, hi)
    plan = q._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "sbucket" in plan
    m = re.search(r"sbucket#\d+ IN \(([\d,\s]*)\)", plan)
    got = {int(x) for x in m.group(1).split(",")}
    assert got == set(overlapping_sort_buckets(bounds, lo, hi))
    assert len(got) < len(bounds) + 1  # genuinely pruned
    # the value predicate reaches the (sorted) row groups
    assert "value" in plan.split("PushedFilters")[1][:400]


def test_client_scalar_inverted_lifecycle(spark, sf_dir, tmp_path):
    """create_index(INVERTED) → dispatch equals the scan path; post-build
    writes serve SEALED + GROWING (postings + delta-pruned scan); refresh
    appends an epoch; a delete folds into the version mask; an upsert
    serves the NEW value (old-epoch posting masked); duplicate inserts
    refuse; a folded compaction falls back to the scan."""
    from milvus_spark.client import MilvusSparkClient
    from milvus_spark.plans.expr import compile_expr

    client = MilvusSparkClient(spark, root=str(tmp_path))
    d = _docs(spark, sf_dir).select("doc_id", "source")
    client.create_collection("sc", pk_field="doc_id")
    client.insert("sc", d.filter(F.col("doc_id") < 400))
    client.create_index("sc", "source", "INVERTED")
    flt = 'source == "src3"'

    def ids():
        return {r.doc_id for r in client.query("sc", filter=flt).collect()}

    def scan_ids():
        base = client._read("sc")
        return {
            r.doc_id
            for r in base.filter(compile_expr(flt, base.schema)).select("doc_id").collect()
        }

    def plan():
        return client.query("sc", filter=flt)._jdf.queryExecution().executedPlan().toString()

    assert ids() == scan_ids() and ids()
    assert "vbucket" in plan()  # dispatch actually reads the posting index
    # sealed+growing: post-build insert, no refresh
    client.insert("sc", d.filter((F.col("doc_id") >= 400) & (F.col("doc_id") < 460)))
    p = plan()
    assert "vbucket" in p and "GreaterThan(_ts" in p
    assert ids() == scan_ids()
    # refresh appends epoch 1
    entry = client.refresh_index("sc", "source", "INVERTED")
    assert entry["cur_epoch"] == 1
    assert ids() == scan_ids()
    # delete an indexed matching doc → version mask at next refresh
    victim = int(sorted(ids())[0])
    client.delete("sc", ids=[victim])
    entry = client.refresh_index("sc", "source", "INVERTED")
    assert [victim, 2] in [list(map(int, x)) for x in entry["masked_pks"]]
    got = ids()
    assert victim not in got and got == scan_ids()
    # upsert OUT of the match: old posting masked, new value serves
    other = int(sorted(got)[0])
    client.delete("sc", ids=[other])
    client.insert(
        "sc",
        spark.createDataFrame([[other, "srcX"]], "doc_id long, source string"),
    )
    client.refresh_index("sc", "source", "INVERTED")
    got = ids()
    assert other not in got and got == scan_ids()
    # and back INTO the match
    client.delete("sc", ids=[other])
    client.insert(
        "sc",
        spark.createDataFrame([[other, "src3"]], "doc_id long, source string"),
    )
    client.refresh_index("sc", "source", "INVERTED")
    got = ids()
    assert other in got and got == scan_ids()
    # duplicate insert WITHOUT a delete refuses
    client.insert(
        "sc",
        spark.createDataFrame([[other, "src5"]], "doc_id long, source string"),
    )
    with pytest.raises(ValueError, match="live indexed"):
        client.refresh_index("sc", "source", "INVERTED")
    client.drop_collection("sc")


def test_client_scalar_sealed_growing_delete_and_fallback(spark, sf_dir, tmp_path):
    """Sealed+growing with a post-build DELETE (query-time mask over the
    postings) and the shared safety gate: compaction folds tombstones →
    scan fallback, results exact throughout."""
    from milvus_spark.client import MilvusSparkClient
    from milvus_spark.plans.expr import compile_expr

    client = MilvusSparkClient(spark, root=str(tmp_path))
    d = _docs(spark, sf_dir).select("doc_id", "source")
    client.create_collection("sg", pk_field="doc_id")
    client.insert("sg", d)
    client.create_index("sg", "source", "INVERTED")
    flt = 'source == "src3"'

    def ids():
        return {r.doc_id for r in client.query("sg", filter=flt).collect()}

    def scan_ids():
        base = client._read("sg")
        return {
            r.doc_id
            for r in base.filter(compile_expr(flt, base.schema)).select("doc_id").collect()
        }

    def plan():
        return client.query("sg", filter=flt)._jdf.queryExecution().executedPlan().toString()

    victim = int(sorted(ids())[0])
    client.delete("sg", ids=[victim])
    got = ids()
    assert victim not in got and got == scan_ids()
    assert "vbucket" in plan()  # still serving from the index
    client.compact("sg")
    assert "vbucket" not in plan()  # folded tombstones → fallback
    assert ids() == scan_ids()
    client.drop_collection("sg")


def test_client_bitmap_sort_trie_dispatch(spark, sf_dir, tmp_path):
    """BITMAP IN-dispatch, STL_SORT range dispatch, TRIE prefix dispatch —
    each equal to the scan path with the pruned plan pinned — plus the
    refusal matrix (bitmap cardinality, TRIE on non-varchar, numeric range
    on a varchar-sorted index falls through to the scan)."""
    from milvus_spark.client import MilvusSparkClient

    client = MilvusSparkClient(spark, root=str(tmp_path))
    o = _orders(spark, sf_dir)
    client.create_collection("ob", pk_field="o_orderkey")
    client.insert("ob", o)
    client.create_index("ob", "o_orderstatus", "BITMAP")
    q = client.query("ob", filter='o_orderstatus in ["F", "P"]', output_fields=["o_orderkey"])
    plan = q._jdf.queryExecution().executedPlan().toString()
    assert "vbucket" in plan
    assert q.count() == o.filter(F.col("o_orderstatus").isin("F", "P")).count()
    # eq through the same bitmap
    q = client.query("ob", filter='o_orderstatus == "O"')
    assert q.count() == o.filter(F.col("o_orderstatus") == "O").count()
    with pytest.raises(ValueError, match="cardinality"):
        client.create_index("ob", "o_orderkey", "BITMAP", {"bitmap_cardinality_limit": 100})
    # STL_SORT range
    client.create_index("ob", "o_totalprice", "STL_SORT")
    q = client.query("ob", filter="o_totalprice >= 1000 and o_totalprice <= 5000")
    plan = q._jdf.queryExecution().executedPlan().toString()
    assert "sbucket" in plan
    assert q.count() == o.filter(
        (F.col("o_totalprice") >= 1000) & (F.col("o_totalprice") <= 5000)
    ).count()
    # TRIE prefix
    p = spark.read.parquet(f"{sf_dir}/part.parquet")
    client.create_collection("pt", pk_field="p_partkey")
    client.insert("pt", p)
    client.create_index("pt", "p_name", "TRIE")
    q = client.query("pt", filter='p_name like "co%"')
    plan = q._jdf.queryExecution().executedPlan().toString()
    assert "sbucket" in plan
    assert q.count() == p.filter(F.col("p_name").startswith("co")).count()
    with pytest.raises(ValueError, match="varchar"):
        client.create_index("pt", "p_partkey", "TRIE")
    # a numeric range on a varchar-sorted index cannot dispatch: TRIE on
    # p_name exists, but the filter targets p_retailprice (no index) —
    # and a range over p_name itself would hit the str-bounds guard
    q = client.query("pt", filter="p_retailprice >= 100 and p_retailprice <= 200")
    assert "sbucket" not in q._jdf.queryExecution().executedPlan().toString()
    assert q.count() == p.filter(
        (F.col("p_retailprice") >= 100) & (F.col("p_retailprice") <= 200)
    ).count()
    client.drop_collection("ob")
    client.drop_collection("pt")


def test_hybrid_scalar_index_selection(spark, sf_dir, tmp_path):
    """HYBRID auto-selection (HybridScalarIndex.cpp,
    SelectIndexTypeByCardinality): a low-cardinality field selects the
    packed BITMAP layout, a high-cardinality one the per-value INVERTED
    postings; the selection persists across refresh and both dispatch
    identically to the scan path."""
    from milvus_spark.client import MilvusSparkClient
    from milvus_spark.plans.expr import compile_expr

    client = MilvusSparkClient(spark, root=str(tmp_path))
    d = _docs(spark, sf_dir).select("doc_id", "lang", "source")
    client.create_collection("hy", pk_field="doc_id")
    client.insert("hy", d.filter(F.col("doc_id") < 400))
    e1 = client.create_index("hy", "lang", "HYBRID")
    assert e1["selected"] == "BITMAP" and e1["cardinality"] <= 5
    e2 = client.create_index("hy", "source", "HYBRID", {"bitmap_cardinality_limit": 10})
    assert e2["selected"] == "INVERTED" and e2["cardinality"] == 20

    def check(flt):
        base = client._read("hy")
        want = {
            r.doc_id
            for r in base.filter(compile_expr(flt, base.schema)).select("doc_id").collect()
        }
        q = client.query("hy", filter=flt)
        assert "vbucket" in q._jdf.queryExecution().executedPlan().toString(), flt
        assert {r.doc_id for r in q.collect()} == want and want, flt

    check('lang in ["fr", "es"]')
    check('source == "src3"')
    # refresh keeps the selection; results track the scan
    client.insert("hy", d.filter((F.col("doc_id") >= 400) & (F.col("doc_id") < 460)))
    client.delete("hy", filter="doc_id % 31 == 4")
    for fld in ("lang", "source"):
        e = client.refresh_index("hy", fld, "HYBRID")
        assert e["cur_epoch"] == 1
    assert client.describe_index("hy", "lang", "HYBRID")["selected"] == "BITMAP"
    check('lang in ["fr", "es"]')
    check('source == "src3"')
    client.drop_collection("hy")


def test_array_inverted_contains_family(spark, sf_dir, tmp_path):
    """Multi-valued INVERTED index on an ARRAY field (the reference's
    inverted index with multi=true): array_contains reads one posting
    list, contains_any unions, contains_all intersects — each equal to the
    compile_expr scan path, with the pruned plan pinned, across the
    epoch-append + delete-mask + upsert lifecycle."""
    from milvus_spark.client import MilvusSparkClient
    from milvus_spark.operators.text import tokens
    from milvus_spark.plans.expr import compile_expr

    client = MilvusSparkClient(spark, root=str(tmp_path))
    d = (
        _docs(spark, sf_dir)
        .select("doc_id", tokens(F.col("text")).alias("toks"))
    )
    client.create_collection("av", pk_field="doc_id")
    client.insert("av", d.filter(F.col("doc_id") < 400))
    client.create_index("av", "toks", "INVERTED")

    def ids(flt):
        return {r.doc_id for r in client.query("av", filter=flt).collect()}

    def scan_ids(flt):
        base = client._read("av")
        return {
            r.doc_id
            for r in base.filter(compile_expr(flt, base.schema)).select("doc_id").collect()
        }

    def plan(flt):
        return client.query("av", filter=flt)._jdf.queryExecution().executedPlan().toString()

    f_c = 'array_contains(toks, "spark")'
    f_any = 'array_contains_any(toks, ["join", "merge"])'
    f_all = 'array_contains_all(toks, ["table", "query"])'
    for flt in (f_c, f_any, f_all):
        assert ids(flt) == scan_ids(flt) and ids(flt), flt
        assert "vbucket" in plan(flt), flt
    # sealed + growing
    client.insert("av", d.filter((F.col("doc_id") >= 400) & (F.col("doc_id") < 460)))
    p = plan(f_all)
    assert "vbucket" in p and "GreaterThan(_ts" in p
    for flt in (f_c, f_any, f_all):
        assert ids(flt) == scan_ids(flt), flt
    # refresh epoch + delete mask + upsert out of the match
    client.refresh_index("av", "toks", "INVERTED")
    victim = int(sorted(ids(f_c))[0])
    client.delete("av", ids=[victim])
    client.insert(
        "av",
        spark.createDataFrame(
            [[victim, ["nothing", "relevant"]]], "doc_id long, toks array<string>"
        ),
    )
    client.refresh_index("av", "toks", "INVERTED")
    got = ids(f_c)
    assert victim not in got and got == scan_ids(f_c)
    assert ids(f_all) == scan_ids(f_all)
    # an eq-shape filter must NOT dispatch through the array index (whole-
    # value vs element semantics) — compile_expr rejects it upstream, and
    # the dispatch's type guard keeps it away from the posting path
    client.drop_collection("av")


def test_ngram_index_full_lifecycle(spark, sf_dir, tmp_path):
    """NGRAM rides the shared lifecycle as of r9 (NgramInvertedIndex.cpp
    is a per-segment index like the rest): gram-bucket directory pruning
    at dispatch, sealed+growing on post-build writes (delta rows verify
    by a pruned contains scan, post-build deletes mask the postings),
    refresh epochs, delete masks, upserts — results equal the scan path
    at every step."""
    from milvus_spark.client import MilvusSparkClient
    from milvus_spark.plans.expr import compile_expr

    client = MilvusSparkClient(spark, root=str(tmp_path))
    d = _docs(spark, sf_dir).select("doc_id", "text")
    client.create_collection("ng", pk_field="doc_id")
    client.insert("ng", d.filter(F.col("doc_id") < 400))
    client.create_index("ng", "text", "NGRAM", {"n": 3})
    flt = 'text like "%hash join%"'

    def ids():
        return {r.doc_id for r in client.query("ng", filter=flt).collect()}

    def scan_ids():
        base = client._read("ng")
        return {
            r.doc_id
            for r in base.filter(compile_expr(flt, base.schema)).select("doc_id").collect()
        }

    def plan():
        return client.query("ng", filter=flt)._jdf.queryExecution().executedPlan().toString()

    assert ids() == scan_ids() and ids()
    assert "gbucket" in plan()  # pruned posting read
    # sealed + growing
    client.insert("ng", d.filter((F.col("doc_id") >= 400) & (F.col("doc_id") < 460)))
    p = plan()
    assert "gbucket" in p and "GreaterThan(_ts" in p
    assert ids() == scan_ids()
    # refresh appends epoch 1; delete folds into the mask
    entry = client.refresh_index("ng", "text", "NGRAM")
    assert entry["cur_epoch"] == 1
    assert ids() == scan_ids()
    victim = int(sorted(ids())[0])
    client.delete("ng", ids=[victim])
    entry = client.refresh_index("ng", "text", "NGRAM")
    assert [victim, 2] in [list(map(int, x)) for x in entry["masked_pks"]]
    got = ids()
    assert victim not in got and got == scan_ids()
    # upsert INTO the match: old grams masked, new text's grams serve
    other = int(victim)
    client.insert(
        "ng",
        spark.createDataFrame(
            [[other, "revisit the hash join plan"]], "doc_id long, text string"
        ),
    )
    client.refresh_index("ng", "text", "NGRAM")
    got = ids()
    assert other in got and got == scan_ids()
    # suffix match (%pat) rides the same gram candidates + endswith verify
    sfx = 'text like "%join plan"'
    qs = client.query("ng", filter=sfx)
    assert "gbucket" in qs._jdf.queryExecution().executedPlan().toString()
    base = client._read("ng")
    want = {
        r.doc_id
        for r in base.filter(compile_expr(sfx, base.schema)).select("doc_id").collect()
    }
    assert {r.doc_id for r in qs.collect()} == want and other in want
    client.drop_collection("ng")


def test_conjunctive_forindex_dispatch(spark, sf_dir, tmp_path):
    """Top-level AND of indexable legs intersects each leg's index
    candidates (the reference ANDs per-leg ForIndex bitsets): equality
    through the bitmap × half-range pair folded into one sorted-range
    leg — results equal the scan path, every leg's pruned access path in
    the plan. Partial index coverage, OR, and quoted literals containing
    ' and ' all fall back to the scan."""
    from milvus_spark.client import MilvusSparkClient
    from milvus_spark.plans.expr import compile_expr

    client = MilvusSparkClient(spark, root=str(tmp_path))
    o = _orders(spark, sf_dir).select("o_orderkey", "o_orderstatus", "o_totalprice")
    client.create_collection("cj", pk_field="o_orderkey")
    client.insert("cj", o)
    client.create_index("cj", "o_orderstatus", "BITMAP")
    client.create_index("cj", "o_totalprice", "STL_SORT")
    flt = 'o_orderstatus == "F" and o_totalprice >= 1000 and o_totalprice <= 9000'

    def scan_ids(f):
        base = client._read("cj")
        return {
            r.o_orderkey
            for r in base.filter(compile_expr(f, base.schema)).select("o_orderkey").collect()
        }

    q = client.query("cj", filter=flt)
    plan = q._jdf.queryExecution().executedPlan().toString()
    assert "vbucket" in plan and "sbucket" in plan, "both index legs expected"
    got = {r.o_orderkey for r in q.collect()}
    assert got == scan_ids(flt) and got
    # half-range on one side only
    flt2 = 'o_orderstatus == "P" and o_totalprice < 2000'
    q2 = client.query("cj", filter=flt2)
    assert "vbucket" in q2._jdf.queryExecution().executedPlan().toString()
    assert {r.o_orderkey for r in q2.collect()} == scan_ids(flt2)
    # partial coverage (r10): the indexed leg still dispatches ForIndex
    # and the unindexed leg verifies on the shortlist (the reference's
    # per-expression ForIndex/ForData split, UnaryExpr.h:1117-1121)
    flt3 = 'o_orderstatus == "F" and o_orderkey % 2 == 0'
    q3 = client.query("cj", filter=flt3)
    plan3 = q3._jdf.queryExecution().executedPlan().toString()
    assert "vbucket" in plan3, "indexed leg must keep its posting path"
    assert "% 2)" in plan3, "residual leg must verify in-plan"
    assert {r.o_orderkey for r in q3.collect()} == scan_ids(flt3)
    # disjunction: OR unions the legs' candidates (both access paths in
    # the plan); mixed legs with an unindexed field fall back
    flt_or = 'o_orderstatus == "P" or o_totalprice >= 95000'
    qo = client.query("cj", filter=flt_or)
    plan_o = qo._jdf.queryExecution().executedPlan().toString()
    assert "vbucket" in plan_o and "sbucket" in plan_o
    assert {r.o_orderkey for r in qo.collect()} == scan_ids(flt_or)
    flt_or2 = 'o_orderstatus == "P" or o_orderkey % 2 == 0'
    qo2 = client.query("cj", filter=flt_or2)
    assert "vbucket" not in qo2._jdf.queryExecution().executedPlan().toString()
    assert {r.o_orderkey for r in qo2.collect()} == scan_ids(flt_or2)
    # a stale leg (post-build write, no refresh) serves SEALED + GROWING
    # (r10): postings keep serving, the new row enters via the delta leg
    client.insert(
        "cj",
        spark.createDataFrame(
            [[9_000_001, "F", 1500.0]],
            "o_orderkey long, o_orderstatus string, o_totalprice double",
        ),
    )
    q4 = client.query("cj", filter=flt)
    plan4 = q4._jdf.queryExecution().executedPlan().toString()
    assert "vbucket" in plan4 and "sbucket" in plan4
    assert "_ts" in plan4, "expected the ts-pruned growing delta"
    got4 = {r.o_orderkey for r in q4.collect()}
    assert got4 == scan_ids(flt) and 9_000_001 in got4
    client.drop_collection("cj")


def test_is_null_through_null_sidecar(spark, sf_dir, tmp_path):
    """`field is null` answered from the scalar index's NULL sidecar (the
    reference's scalar-index null bitmap): dispatch equals the scan path
    across build → epoch append → delete mask → null<->value upserts;
    the is-null plan is a LeftSemi against the sidecar ids, never a
    column scan."""
    from milvus_spark.client import MilvusSparkClient
    from milvus_spark.plans.expr import compile_expr

    client = MilvusSparkClient(spark, root=str(tmp_path))
    d = _docs(spark, sf_dir).select(
        "doc_id",
        F.when(F.col("doc_id") % 7 == 0, F.lit(None)).otherwise(
            F.col("source")
        ).alias("src"),
    )
    client.create_collection("nl", pk_field="doc_id")
    client.insert("nl", d.filter(F.col("doc_id") < 400))
    client.create_index("nl", "src", "INVERTED")
    flt = "src is null"

    def ids():
        return {r.doc_id for r in client.query("nl", filter=flt).collect()}

    def scan_ids():
        base = client._read("nl")
        return {
            r.doc_id
            for r in base.filter(compile_expr(flt, base.schema)).select("doc_id").collect()
        }

    def plan():
        return client.query("nl", filter=flt)._jdf.queryExecution().executedPlan().toString()

    assert ids() == scan_ids() and ids()
    assert "LeftSemi" in plan()
    # epoch append brings new null rows
    client.insert("nl", d.filter((F.col("doc_id") >= 400) & (F.col("doc_id") < 460)))
    client.refresh_index("nl", "src", "INVERTED")
    assert ids() == scan_ids()
    # delete a null doc -> mask covers the sidecar
    victim = int(sorted(ids())[0])
    client.delete("nl", ids=[victim])
    client.refresh_index("nl", "src", "INVERTED")
    got = ids()
    assert victim not in got and got == scan_ids()
    # upsert null -> value: sidecar row masks, value row serves eq
    flip = int(sorted(got)[0])
    client.delete("nl", ids=[flip])
    client.insert(
        "nl", spark.createDataFrame([[flip, "src3"]], "doc_id long, src string")
    )
    client.refresh_index("nl", "src", "INVERTED")
    got = ids()
    assert flip not in got and got == scan_ids()
    assert flip in {
        r.doc_id for r in client.query("nl", filter='src == "src3"').collect()
    }
    # upsert value -> null: main row masks, sidecar serves
    back = int(
        sorted(
            {r.doc_id for r in client.query("nl", filter='src == "src3"').collect()}
        )[0]
    )
    client.delete("nl", ids=[back])
    client.insert(
        "nl", spark.createDataFrame([[back, None]], "doc_id long, src string")
    )
    client.refresh_index("nl", "src", "INVERTED")
    got = ids()
    assert back in got and got == scan_ids()
    assert back not in {
        r.doc_id for r in client.query("nl", filter='src == "src3"').collect()
    }
    client.drop_collection("nl")


def test_auto_rebuild_after_compaction(spark, sf_dir, tmp_path):
    """Auto-rebuild policy (the compaction half of the reference's index
    automation — compacted segments are re-indexed without operator
    action): an index with auto_rebuild=True rebuilds inside compact()
    when the compaction leaves it unservable, so dispatch returns to the
    index path; without the flag the same compaction falls back to the
    scan (the existing stale contract)."""
    from milvus_spark.client import MilvusSparkClient
    from milvus_spark.plans.expr import compile_expr

    client = MilvusSparkClient(spark, root=str(tmp_path))
    d = _docs(spark, sf_dir).select("doc_id", "source")
    client.create_collection("arb", pk_field="doc_id")
    client.insert("arb", d)
    client.create_index("arb", "source", "INVERTED", {"auto_rebuild": True})
    flt = 'source == "src3"'
    victim = int(
        sorted(
            r.doc_id for r in client.query("arb", filter=flt).collect()
        )[0]
    )
    client.delete("arb", ids=[victim])
    client.compact("arb")  # folds the tombstone -> artifact unservable
    entry = client.describe_index("arb", "source", "INVERTED")
    assert entry["built_ts"] == client._current_ts("arb"), "rebuild did not fire"
    assert not entry.get("masked_pks")
    q = client.query("arb", filter=flt)
    assert "vbucket" in q._jdf.queryExecution().executedPlan().toString()
    base = client._read("arb")
    want = {
        r.doc_id
        for r in base.filter(compile_expr(flt, base.schema)).select("doc_id").collect()
    }
    assert {r.doc_id for r in q.collect()} == want and victim not in want
    client.drop_collection("arb")


def test_bool_index_eq_dispatch(spark, sf_dir, tmp_path):
    """Bool scalar index (BoolIndex.h — a two-value bitmap in the
    reference): `flag == true` dispatches through the posting index; a
    VARCHAR field holding the text 'true' does NOT serve a bool-literal
    filter (literal-kind vs column-type guard)."""
    from milvus_spark.client import MilvusSparkClient

    client = MilvusSparkClient(spark, root=str(tmp_path))
    o = _orders(spark, sf_dir).select(
        "o_orderkey", (F.col("o_totalprice") > 3000).alias("big")
    )
    client.create_collection("bl", pk_field="o_orderkey")
    client.insert("bl", o)
    client.create_index("bl", "big", "BITMAP")
    q = client.query("bl", filter="big == true")
    assert "vbucket" in q._jdf.queryExecution().executedPlan().toString()
    assert q.count() == o.filter(F.col("big")).count() > 0
    q2 = client.query("bl", filter="big == false")
    assert q2.count() == o.filter(~F.col("big")).count() > 0
    # a varchar column holding "true" must not dispatch for a bool literal
    s = _docs(spark, sf_dir).select(
        "doc_id", F.lit("true").alias("flagtxt")
    )
    client.create_collection("bl2", pk_field="doc_id")
    client.insert("bl2", s)
    client.create_index("bl2", "flagtxt", "INVERTED")
    qt = client.query("bl2", filter='flagtxt == "true"')
    assert "vbucket" in qt._jdf.queryExecution().executedPlan().toString()
    assert qt.count() == s.count()
    client.drop_collection("bl")
    client.drop_collection("bl2")


def test_scalar_index_auto_refresh_and_type_refusals(spark, sf_dir, tmp_path):
    """The auto-refresh seal policy is index-type-agnostic: an INVERTED
    index with auto_refresh_rows fires inside insert(). Type refusals:
    INVERTED/BITMAP on double, SORT on a non-orderable field."""
    from milvus_spark.client import MilvusSparkClient

    client = MilvusSparkClient(spark, root=str(tmp_path))
    d = _docs(spark, sf_dir).select("doc_id", "source", "n_chars")
    client.create_collection("ar", pk_field="doc_id")
    client.insert("ar", d.filter(F.col("doc_id") < 300))
    client.create_index("ar", "source", "INVERTED", {"auto_refresh_rows": 50})
    client.insert("ar", d.filter((F.col("doc_id") >= 300) & (F.col("doc_id") < 400)))
    entry = client.describe_index("ar", "source", "INVERTED")
    assert entry["built_ts"] == client._current_ts("ar"), "policy did not fire"
    assert entry["pending_rows"] == 0
    o = _orders(spark, sf_dir)
    client.create_collection("tr", pk_field="o_orderkey")
    client.insert("tr", o)
    with pytest.raises(ValueError, match="varchar, integral or bool"):
        client.create_index("tr", "o_totalprice", "INVERTED")
    client.drop_collection("ar")
    client.drop_collection("tr")


def test_partial_conjunction_growing_and_residual_exactness(spark, sf_dir, tmp_path):
    """r10 dispatch-breadth matrix: (a) partial coverage composes with a
    GROWING delta on the indexed leg; (b) a duplicate range bound demotes
    to residual instead of poisoning the dispatch; (c) disjunction with
    stale legs serves sealed+growing; (d) a quoted literal containing
    ' and ' still falls back (split unsafe)."""
    from milvus_spark.client import MilvusSparkClient
    from milvus_spark.plans.expr import compile_expr

    client = MilvusSparkClient(spark, root=str(tmp_path))
    o = _orders(spark, sf_dir).select("o_orderkey", "o_orderstatus", "o_totalprice")
    client.create_collection("pg", pk_field="o_orderkey")
    client.insert("pg", o.filter(F.col("o_orderkey") % 5 != 0))
    client.create_index("pg", "o_orderstatus", "BITMAP")
    client.create_index("pg", "o_totalprice", "STL_SORT")
    client.insert("pg", o.filter(F.col("o_orderkey") % 5 == 0))  # growing
    client.delete("pg", filter="o_orderkey % 97 == 3")  # post-build mask

    def scan_ids(f):
        base = client._read("pg")
        return {
            r.o_orderkey
            for r in base.filter(compile_expr(f, base.schema)).select("o_orderkey").collect()
        }

    # (a) indexed-stale leg + residual leg together
    flt = 'o_orderstatus == "F" and o_orderkey % 2 == 0'
    q = client.query("pg", filter=flt)
    plan = q._jdf.queryExecution().executedPlan().toString()
    assert "vbucket" in plan and "_ts" in plan
    assert {r.o_orderkey for r in q.collect()} == scan_ids(flt)
    # (b) duplicate bound: one half folds, the duplicate verifies
    flt2 = "o_totalprice >= 1000 and o_totalprice >= 2000 and o_totalprice <= 9000"
    q2 = client.query("pg", filter=flt2)
    assert "sbucket" in q2._jdf.queryExecution().executedPlan().toString()
    assert {r.o_orderkey for r in q2.collect()} == scan_ids(flt2)
    # (c) disjunction over stale legs
    flt3 = 'o_orderstatus == "P" or o_totalprice >= 95000'
    q3 = client.query("pg", filter=flt3)
    plan3 = q3._jdf.queryExecution().executedPlan().toString()
    assert "vbucket" in plan3 and "sbucket" in plan3 and "_ts" in plan3
    assert {r.o_orderkey for r in q3.collect()} == scan_ids(flt3)
    # (d) quoted ' and ' never mis-splits
    flt4 = 'o_orderstatus == "F and P" and o_totalprice >= 1000'
    q4 = client.query("pg", filter=flt4)
    assert "vbucket" not in q4._jdf.queryExecution().executedPlan().toString()
    assert q4.count() == 0
    client.drop_collection("pg")


def test_text_match_inside_compound_filter(spark, sf_dir, tmp_path):
    """text_match / phrase_match legs dispatch through the TEXT_MATCH
    posting index inside conjunctions and disjunctions (r10): results
    equal the compiled-scan path, tbucket pruning in the plan; a
    single-term phrase_match leg stays non-indexable (residual)."""
    from milvus_spark.client import MilvusSparkClient
    from milvus_spark.plans.expr import compile_expr

    client = MilvusSparkClient(spark, root=str(tmp_path))
    d = _docs(spark, sf_dir).select("doc_id", "text", "source", "n_chars")
    client.create_collection("tc", pk_field="doc_id")
    client.insert("tc", d)
    client.create_index("tc", "text", "TEXT_MATCH")
    client.create_index("tc", "source", "BITMAP")

    def scan_ids(f):
        base = client._read("tc")
        return {
            r.doc_id
            for r in base.filter(compile_expr(f, base.schema)).select("doc_id").collect()
        }

    # text leg + residual scalar leg
    flt = 'text_match(text, "spark merge", 2) and n_chars >= 200'
    q = client.query("tc", filter=flt)
    plan = q._jdf.queryExecution().executedPlan().toString()
    assert "tbucket" in plan, "text leg must read pruned postings"
    assert {r.doc_id for r in q.collect()} == scan_ids(flt)
    # text leg + indexed scalar leg: both ForIndex paths
    flt2 = 'text_match(text, "vector") and source == "src3"'
    q2 = client.query("tc", filter=flt2)
    plan2 = q2._jdf.queryExecution().executedPlan().toString()
    assert "tbucket" in plan2 and "vbucket" in plan2
    assert {r.doc_id for r in q2.collect()} == scan_ids(flt2)
    # phrase leg inside a conjunction
    flt3 = 'phrase_match(text, "merge batch", 1) and n_chars >= 100'
    q3 = client.query("tc", filter=flt3)
    assert "tbucket" in q3._jdf.queryExecution().executedPlan().toString()
    assert {r.doc_id for r in q3.collect()} == scan_ids(flt3)
    # disjunction with a text leg
    flt4 = 'text_match(text, "vector") or source == "src9"'
    q4 = client.query("tc", filter=flt4)
    plan4 = q4._jdf.queryExecution().executedPlan().toString()
    assert "tbucket" in plan4 and "vbucket" in plan4
    assert {r.doc_id for r in q4.collect()} == scan_ids(flt4)
    # a single-term phrase has no posting-only answer: residual → the
    # indexed sibling still prunes, results exact
    flt5 = 'phrase_match(text, "vector") and source == "src3"'
    q5 = client.query("tc", filter=flt5)
    plan5 = q5._jdf.queryExecution().executedPlan().toString()
    assert "vbucket" in plan5 and "tbucket" not in plan5
    assert {r.doc_id for r in q5.collect()} == scan_ids(flt5)
    client.drop_collection("tc")


def test_fmindex_alias_lifecycle(spark, sf_dir, tmp_path):
    """FMINDEX (r10 — index_type.go:37, FMIndex.cpp:203-205): builds the
    TRIE + NGRAM layouts, serves all three FMIndex OpTypes (prefix /
    inner / postfix LIKE) through them, refresh fans out, drop removes
    the mapped layouts, and a non-varchar field refuses."""
    import pytest as _pytest

    from milvus_spark.client import MilvusSparkClient

    client = MilvusSparkClient(spark, root=str(tmp_path))
    d = _docs(spark, sf_dir).select("doc_id", "text", "n_chars")
    client.create_collection("fm", pk_field="doc_id")
    client.insert("fm", d.filter(F.col("doc_id") % 3 != 0))
    entry = client.create_index("fm", "text", "FMINDEX")
    assert entry["maps_to"] == ["TRIE", "NGRAM"]
    assert "text__TRIE" in client.list_indexes("fm")
    assert "text__NGRAM" in client.list_indexes("fm")

    def ids(flt):
        return {r.doc_id for r in client.query("fm", filter=flt).collect()}

    base = client._read("fm")
    for flt, col in [
        ('text like "merge group%"', F.col("text").startswith("merge group")),
        ('text like "%hash join%"', F.col("text").contains("hash join")),
        ('text like "%sort"', F.col("text").endswith("sort")),
    ]:
        q = client.query("fm", filter=flt)
        plan = q._jdf.queryExecution().executedPlan().toString()
        assert ("sbucket" in plan) or ("gbucket" in plan), flt
        assert ids(flt) == {r.doc_id for r in base.filter(col).collect()}
    # refresh fans out to both layouts after a write
    client.insert("fm", d.filter(F.col("doc_id") % 3 == 0))
    ent = client.refresh_index("fm", "text", "FMINDEX")
    assert ent["built_ts"] == client._current_ts("fm")
    assert (
        client.describe_index("fm", "text", "TRIE")["built_ts"]
        == client.describe_index("fm", "text", "NGRAM")["built_ts"]
        == ent["built_ts"]
    )
    base = client._read("fm")
    assert ids('text like "%hash join%"') == {
        r.doc_id for r in base.filter(F.col("text").contains("hash join")).collect()
    }
    # drop removes the alias AND the mapped layouts
    client.drop_index("fm", "text", "FMINDEX")
    assert client.list_indexes("fm") == []
    # refusal: non-varchar field
    client.create_collection("fm2", pk_field="o_orderkey")
    client.insert("fm2", _orders(spark, sf_dir).select("o_orderkey", "o_totalprice"))
    with _pytest.raises(ValueError, match="varchar"):
        client.create_index("fm2", "o_totalprice", "FMINDEX")
    client.drop_collection("fm")
    client.drop_collection("fm2")


def test_legacy_scalar_index_alias_spellings(spark, sf_dir, tmp_path):
    """The reference's checker registry routes legacy alias spellings —
    including its own 'Asceneding' typo — to the same checkers
    (conf_adapter_mgr.go:52-59): 'Asceneding' builds STL_SORT,
    'marisa-trie' and 'Trie' build TRIE."""
    from milvus_spark.client import MilvusSparkClient

    c = MilvusSparkClient(spark, root=str(tmp_path))
    cust = spark.read.parquet(f"{sf_dir}/customer.parquet")
    c.create_collection("als", pk_field="c_custkey")
    c.insert("als", cust.select("c_custkey", "c_acctbal", "c_name"))
    e1 = c.create_index("als", "c_acctbal", "Asceneding")
    assert e1["index_type"] == "STL_SORT"
    e2 = c.create_index("als", "c_name", "marisa-trie")
    assert e2["index_type"] == "TRIE"
    e3 = c.create_index("als", "c_name", "Trie")
    assert e3["index_type"] == "TRIE"
