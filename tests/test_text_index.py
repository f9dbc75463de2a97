"""Persisted token posting-list index (r9 — TextMatchIndex.cpp analog):
kernel parity vs the corpus-scan expressions, the client index lifecycle
(build → dispatch → stale → refresh → delete mask → upsert), and the
posting-pruned plan pins."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from milvus_spark.operators.text import tokens
from milvus_spark.operators.text_index import (
    bm25_topk_postings,
    build_text_postings,
    phrase_match_postings,
    py_tbucket,
    read_term_postings,
    text_match_postings,
)


def _docs(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def _scan_text_match(d, terms, msm):
    t = d.withColumn("toks", tokens(F.col("text")))
    n = F.size(
        F.array_intersect(F.array_distinct("toks"), F.array(*[F.lit(x) for x in terms]))
    )
    return {
        (r.doc_id, r.n)
        for r in t.select("doc_id", n.cast("long").alias("n"))
        .filter(F.col("n") >= msm)
        .collect()
    }


def test_text_match_postings_equal_corpus_scan(spark, sf_dir):
    d = _docs(spark, sf_dir)
    postings, _ = build_text_postings(d, "text", "doc_id")
    for terms, msm in ([["spark", "merge", "vector"], 2], [["stream"], 1]):
        got = {
            (r.id, r.n_matched)
            for r in text_match_postings(postings, terms, msm).collect()
        }
        assert got == _scan_text_match(d, terms, msm)


def test_phrase_match_postings_equal_corpus_scan(spark, sf_dir):
    d = _docs(spark, sf_dir)
    postings, _ = build_text_postings(d, "text", "doc_id")
    t = d.withColumn("toks", tokens(F.col("text")))
    # 2-term slop 1 (the fts_phrase_match shape)
    idx = F.sequence(F.lit(1), F.size("toks"))
    pa = F.filter(idx, lambda i: F.element_at(F.col("toks"), i) == "merge")
    pb = F.filter(idx, lambda i: F.element_at(F.col("toks"), i) == "batch")
    t2 = t.withColumn("pa", pa).withColumn("pb", pb)
    starts = F.filter(
        F.col("pa"),
        lambda i: F.size(F.filter(F.col("pb"), lambda j: (j - i >= 1) & (j - i <= 2)))
        > 0,
    )
    want = {
        (r.doc_id, r.n)
        for r in t2.select("doc_id", F.size(starts).cast("long").alias("n"))
        .filter(F.col("n") > 0)
        .collect()
    }
    got = {
        (r.id, r.n_starts)
        for r in phrase_match_postings(postings, ["merge", "batch"], slop=1).collect()
    }
    assert got == want
    # 3-term slop 0: increasing positions, span <= 2 == consecutive check
    idx3 = F.when(
        F.size("toks") >= 3, F.sequence(F.lit(1), F.size("toks") - 2)
    ).otherwise(F.array().cast("array<int>"))
    starts3 = F.filter(
        idx3,
        lambda i: (F.element_at(F.col("toks"), i) == "stream")
        & (F.element_at(F.col("toks"), i + 1) == "table")
        & (F.element_at(F.col("toks"), i + 2) == "hash"),
    )
    want3 = {
        (r.doc_id, r.n)
        for r in t.select("doc_id", F.size(starts3).cast("long").alias("n"))
        .filter(F.col("n") > 0)
        .collect()
    }
    got3 = {
        (r.id, r.n_starts)
        for r in phrase_match_postings(
            postings, ["stream", "table", "hash"], slop=0
        ).collect()
    }
    assert got3 == want3


def test_bm25_postings_equal_corpus_scan(spark, sf_dir):
    from milvus_spark.suites.fulltext import QUERY_TERMS, _bm25_topk

    d = _docs(spark, sf_dir)
    postings, doclens = build_text_postings(d, "text", "doc_id")
    got = [
        (r.id, r.score, r.rank)
        for r in bm25_topk_postings(postings, doclens, QUERY_TERMS, k=15)
        .orderBy("rank")
        .collect()
    ]
    t = d.withColumn("toks", tokens(F.col("text")))
    want = [
        (r.doc_id, r.score, r.rank)
        for r in _bm25_topk(t, k=15).orderBy("rank").collect()
    ]
    assert got == want


def test_posting_read_prunes_partitions(spark, sf_dir, tmp_path):
    """The 100 TB posture pin: a lexical query reads ONLY its terms'
    posting lists — the tbucket filter prunes partition DIRECTORIES at
    file listing and the term filter reaches the row groups."""
    d = _docs(spark, sf_dir)
    postings, _ = build_text_postings(d, "text", "doc_id")
    path = str(tmp_path / "posting")
    postings.write.partitionBy("tbucket").parquet(path)
    stored = spark.read.parquet(path)
    q = text_match_postings(stored, ["spark", "merge"], 1)
    plan = q._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "tbucket" in plan
    # the term pushdown reaches the scan (In or EqualTo on term)
    assert "term" in plan.split("PushedFilters")[1][:400]
    # and the partition filter names exactly the two terms' buckets
    # (inputFiles() reports the pre-pruning relation, so the pin reads the
    # PartitionFilters clause of the executed plan instead)
    import re

    want_bkts = {py_tbucket("spark"), py_tbucket("merge")}
    m = re.search(r"tbucket#\d+ IN \(([\d,\s]*)\)", plan)
    got_bkts = {int(x) for x in m.group(1).split(",")}
    assert got_bkts == want_bkts


def test_client_text_match_index_lifecycle(spark, sf_dir, tmp_path):
    """create_index(TEXT_MATCH) → dispatch equals the scan path; DML makes
    it stale (scan fallback, still exact); refresh appends a posting epoch;
    a delete folds into the version mask; an upsert serves the NEW text
    (old-epoch postings masked). The exactness oracle at every step is the
    compile_expr corpus-scan path on the same visible frame."""
    from milvus_spark.client import MilvusSparkClient

    client = MilvusSparkClient(spark, root=str(tmp_path))
    d = _docs(spark, sf_dir).select("doc_id", "text")
    client.create_collection("tm", pk_field="doc_id")
    client.insert("tm", d.filter(F.col("doc_id") < 400))
    client.create_index("tm", "text", "TEXT_MATCH")
    flt = 'text_match(text, "spark merge vector", minimum_should_match=2)'

    def ids(**kw):
        return {r.doc_id for r in client.query("tm", filter=flt, **kw).collect()}

    def scan_ids():
        from milvus_spark.plans.expr import compile_expr

        base = client._read("tm")
        return {
            r.doc_id
            for r in base.filter(compile_expr(flt, base.schema)).select("doc_id").collect()
        }

    assert ids() == scan_ids()
    # the dispatch actually used the posting index (plan pin: the term
    # pushdown + bucket partition filter only exist on the posting scan)
    plan = client.query("tm", filter=flt)._jdf.queryExecution().executedPlan().toString()
    assert "tbucket" in plan and "In(term" in plan
    # stale by post-build writes: SEALED + GROWING serving (r9) — the
    # postings keep serving as sealed segments while ONLY the delta rows
    # tokenize as the growing segment (delta-pruned scan), exactly the
    # vector zoo's composition
    client.insert("tm", d.filter((F.col("doc_id") >= 400) & (F.col("doc_id") < 450)))
    stale_plan = (
        client.query("tm", filter=flt)._jdf.queryExecution().executedPlan().toString()
    )
    assert "tbucket" in stale_plan, "stale index should serve sealed+growing"
    assert "GreaterThan(_ts" in stale_plan, "growing scan should be delta-pruned"
    assert ids() == scan_ids()
    # refresh appends the new rows as a posting epoch; dispatch returns
    entry = client.refresh_index("tm", "text", "TEXT_MATCH")
    assert entry["cur_epoch"] == 1
    assert ids() == scan_ids()
    plan = client.query("tm", filter=flt)._jdf.queryExecution().executedPlan().toString()
    assert "tbucket" in plan
    # delete an indexed matching doc: mask entry, result tracks the scan
    victim = sorted(ids())[0]
    client.delete("tm", ids=[int(victim)])
    entry = client.refresh_index("tm", "text", "TEXT_MATCH")
    assert [victim, 2] in [list(map(int, p)) for p in entry["masked_pks"]]
    got = ids()
    assert victim not in got and got == scan_ids()
    # upsert: re-insert the victim with text that no longer matches; the
    # old epoch's postings are masked, the new text's postings serve
    client.insert(
        "tm",
        spark.createDataFrame([[int(victim), "nothing relevant here"]], "doc_id long, text string"),
    )
    entry = client.refresh_index("tm", "text", "TEXT_MATCH")
    got = ids()
    assert victim not in got and got == scan_ids()
    # and a doc upserted INTO matching: delete + reinsert with match terms
    other = int(sorted(got)[0])
    client.delete("tm", ids=[other])
    client.insert(
        "tm",
        spark.createDataFrame(
            [[other, "spark merge vector all present"]], "doc_id long, text string"
        ),
    )
    client.refresh_index("tm", "text", "TEXT_MATCH")
    got = ids()
    assert other in got and got == scan_ids()
    # duplicate insert WITHOUT a delete refuses (live-copy collision)
    client.insert(
        "tm",
        spark.createDataFrame([[other, "spark merge vector again"]], "doc_id long, text string"),
    )
    with pytest.raises(ValueError, match="live indexed"):
        client.refresh_index("tm", "text", "TEXT_MATCH")
    client.drop_collection("tm")


def test_client_text_index_requires_varchar(spark, tmp_path):
    from milvus_spark.client import MilvusSparkClient

    client = MilvusSparkClient(spark, root=str(tmp_path))
    client.create_collection("tv", pk_field="id")
    client.insert("tv", spark.createDataFrame([[1, 2]], "id long, v long"))
    with pytest.raises(ValueError, match="varchar"):
        client.create_index("tv", "v", "TEXT_MATCH")
    client.drop_collection("tv")


def test_client_text_search_stored_tf(spark, sf_dir, tmp_path):
    """text_search through the posting index (stored tf/dl — the
    bm25_function.go ingest shape): identical scores/ranks to the
    corpus-scan BM25, and the plan reads postings (term pushdown) instead
    of tokenizing text. Declared analyzers keep the scan path."""
    from milvus_spark.client import MilvusSparkClient

    client = MilvusSparkClient(spark, root=str(tmp_path))
    d = _docs(spark, sf_dir).select("doc_id", "text")
    client.create_collection("ts1", pk_field="doc_id")
    client.insert("ts1", d)
    client.create_collection("ts2", pk_field="doc_id")
    client.insert("ts2", d)
    client.create_index("ts1", "text", "TEXT_MATCH")
    q = "spark merge vector"
    via_index = client.text_search("ts1", "text", q, limit=10)
    plan = via_index._jdf.queryExecution().executedPlan().toString()
    assert "tbucket" in plan and "In(term" in plan
    want = [
        (r.doc_id, r.score, r.rank)
        for r in client.text_search("ts2", "text", q, limit=10).orderBy("rank").collect()
    ]
    got = [(r.doc_id, r.score, r.rank) for r in via_index.orderBy("rank").collect()]
    assert got == want
    # post-build DML leaves the index stale -> SEALED+GROWING serving
    # (r10): the masked postings keep serving, the delete masks at query
    # time — results still identical to the scan-path twin
    client.delete("ts1", ids=[int(want[0][0])])
    client.delete("ts2", ids=[int(want[0][0])])
    stale = client.text_search("ts1", "text", q, limit=10)
    assert "tbucket" in stale._jdf.queryExecution().executedPlan().toString()
    want2 = [
        (r.doc_id, r.score, r.rank)
        for r in client.text_search("ts2", "text", q, limit=10).orderBy("rank").collect()
    ]
    got2 = [(r.doc_id, r.score, r.rank) for r in stale.orderBy("rank").collect()]
    assert got2 == want2
    # refresh folds the delete into the mask; the index path returns and
    # the masked doc's tf/dl drop out of scoring AND stats
    client.refresh_index("ts1", "text", "TEXT_MATCH")
    fresh = client.text_search("ts1", "text", q, limit=10)
    assert "tbucket" in fresh._jdf.queryExecution().executedPlan().toString()
    got3 = [(r.doc_id, r.score, r.rank) for r in fresh.orderBy("rank").collect()]
    assert got3 == want2
    client.drop_collection("ts1")
    client.drop_collection("ts2")


def test_text_index_sealed_growing_serving(spark, sf_dir, tmp_path):
    """SEALED + GROWING for the lexical tier (r9): with NO refresh after
    post-build writes, text_match keeps serving from the posting lists
    (sealed) plus a delta-pruned tokenize of only the new rows (growing);
    post-build deletes mask the postings at query time, and an upserted
    doc serves its NEW text (old postings masked, new text in the delta).
    Exact vs the corpus-scan path at every step; unsafe compositions
    (here: a compaction folding tombstones) fall back to the scan."""
    from milvus_spark.client import MilvusSparkClient
    from milvus_spark.plans.expr import compile_expr

    client = MilvusSparkClient(spark, root=str(tmp_path))
    d = _docs(spark, sf_dir).select("doc_id", "text")
    client.create_collection("sgt", pk_field="doc_id")
    client.insert("sgt", d.filter(F.col("doc_id") < 400))
    client.create_index("sgt", "text", "TEXT_MATCH")
    flt = 'text_match(text, "spark merge vector", minimum_should_match=2)'

    def ids():
        return {r.doc_id for r in client.query("sgt", filter=flt).collect()}

    def scan_ids():
        base = client._read("sgt")
        return {
            r.doc_id
            for r in base.filter(compile_expr(flt, base.schema)).select("doc_id").collect()
        }

    def plan():
        return client.query("sgt", filter=flt)._jdf.queryExecution().executedPlan().toString()

    # growing inserts only — serving stays on postings + delta
    client.insert("sgt", d.filter((F.col("doc_id") >= 400) & (F.col("doc_id") < 460)))
    assert "tbucket" in plan() and "GreaterThan(_ts" in plan()
    assert ids() == scan_ids()
    # post-build delete of an INDEXED matching doc: query-time mask
    victim = int(sorted(ids() & {r.doc_id for r in d.filter("doc_id < 400").collect()})[0])
    client.delete("sgt", ids=[victim])
    got = ids()
    assert victim not in got and got == scan_ids()
    assert "tbucket" in plan()  # still serving sealed+growing
    # upsert an indexed doc into matching text: old postings masked, the
    # delta carries the new text
    other = int(sorted({r.doc_id for r in d.filter("doc_id < 400").collect()} - got)[0])
    client.delete("sgt", ids=[other])
    client.insert(
        "sgt",
        spark.createDataFrame(
            [[other, "spark merge vector now present"]], "doc_id long, text string"
        ),
    )
    got = ids()
    assert other in got and got == scan_ids()
    # unsafe composition: compaction folds the tombstones -> scan fallback
    client.compact("sgt")
    assert "tbucket" not in plan()
    assert ids() == scan_ids()
    client.drop_collection("sgt")


def test_bm25_wand_equals_groupby_plan(spark, sf_dir):
    """bm25_topk_wand (the max-score kernel path the client serves) must
    be row-identical to bm25_topk_postings (the groupBy plan) — WAND is
    exact; only the shuffle topology differs."""
    from milvus_spark.operators.text_index import (
        bm25_topk_postings,
        bm25_topk_wand,
        build_text_postings,
    )

    d = spark.read.parquet(f"{sf_dir}/documents.parquet").select("doc_id", "text")
    postings, doclens = build_text_postings(d, "text", "doc_id")
    for terms in (["spark", "merge", "vector"], ["group"], ["spark", "zzz_absent"]):
        a = [
            (r.id, r.score, r.rank)
            for r in bm25_topk_postings(postings, doclens, terms, k=12)
            .orderBy("rank")
            .collect()
        ]
        b = [
            (r.id, r.score, r.rank)
            for r in bm25_topk_wand(postings, doclens, terms, k=12)
            .orderBy("rank")
            .collect()
        ]
        assert a == b and a, terms


def test_text_search_sealed_growing(spark, sf_dir, tmp_path):
    """BM25 text_search with an index stale only by post-build writes
    serves SEALED + GROWING (masked stored-tf postings + the ts-pruned
    delta tokenized inline) instead of dropping to the corpus scan; a
    post-build delete masks at query time."""
    from milvus_spark.client import MilvusSparkClient

    client = MilvusSparkClient(spark, root=str(tmp_path))
    d = spark.read.parquet(f"{sf_dir}/documents.parquet").select("doc_id", "text")
    client.create_collection("tsg", pk_field="doc_id")
    client.insert("tsg", d.filter(F.col("doc_id") % 3 != 0))
    client.create_index("tsg", "text", "TEXT_MATCH")
    client.insert("tsg", d.filter(F.col("doc_id") % 3 == 0))
    df = client.text_search("tsg", "text", "spark merge vector", limit=10)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "FlatMapGroupsInPandas" in plan, "growing delta dropped the kernel path"
    assert "_ts" in plan, "expected the ts-pruned growing delta"
    got = [(r.doc_id, r.score, r.rank) for r in df.orderBy("rank").collect()]
    # scan-path recompute over the full visible corpus is the truth
    from milvus_spark.operators.text_index import bm25_topk_postings, build_text_postings

    p, dl = build_text_postings(client._read("tsg"), "text", "doc_id")
    want = [
        (r.id, r.score, r.rank)
        for r in bm25_topk_postings(p, dl, ["spark", "merge", "vector"], k=10)
        .orderBy("rank")
        .collect()
    ]
    assert got == want and got
    # post-build delete of the top hit masks at query time
    victim = got[0][0]
    client.delete("tsg", ids=[int(victim)])
    got2 = [
        r.doc_id
        for r in client.text_search("tsg", "text", "spark merge vector", limit=10).collect()
    ]
    assert victim not in got2 and got2
    client.drop_collection("tsg")
