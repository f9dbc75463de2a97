"""N-gram inverted index (NgramInvertedIndex.cpp analog): index path must be
result-identical to the direct contains() scan; coverage is necessary but not
sufficient, so verification must drop false candidates."""

from __future__ import annotations

from pyspark.sql import functions as F

from milvus_spark.operators.ngram import build_ngram_index, char_ngrams, inner_match
from milvus_spark.session import load_table


def _ids(df):
    return sorted(r["doc_id"] for r in df.select("doc_id").collect())


def test_index_path_equals_scan(spark, sf_dir):
    d = load_table(spark, sf_dir, "documents")
    idx = build_ngram_index(d, "text", "doc_id")
    for pat in ("hash join", "customer", "zz-not-present"):
        got = _ids(inner_match(d, idx, "text", "doc_id", pat))
        want = _ids(d.filter(F.col("text").contains(pat)))
        assert got == want, pat


def test_short_pattern_falls_back_to_scan(spark, sf_dir):
    d = load_table(spark, sf_dir, "documents")
    idx = build_ngram_index(d, "text", "doc_id")
    got = _ids(inner_match(d, idx, "text", "doc_id", "ab"))
    want = _ids(d.filter(F.col("text").contains("ab")))
    assert got == want


def test_candidates_verified_not_trusted(spark):
    """'ab', 'bc' grams both present but not contiguous → candidate survives
    the intersection yet must be dropped by verification."""
    d = spark.createDataFrame(
        [(1, "abc"), (2, "abXbc"), (3, "zzz")], "doc_id long, text string"
    )
    idx = build_ngram_index(d, "text", "doc_id", n=2)
    assert _ids(inner_match(d, idx, "text", "doc_id", "abc", n=2)) == [1]


def test_char_ngrams_jvm_side(spark):
    row = spark.range(1).select(char_ngrams("'abcd'", 3).alias("g")).collect()[0]
    assert row["g"] == ["abc", "bcd"]
