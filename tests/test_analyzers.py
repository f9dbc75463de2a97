"""Analyzer unit tests: cjk_bigram semantics on real CJK text.

Reference behavior: internal/util/analyzer/ (jieba/lindera/CJK paths,
canalyzer/c_analyzer_test.go:71-225). Without segmentation dictionaries the
bigram fallback must (a) emit overlapping character bigrams per CJK run,
(b) keep Latin runs on the standard analyzer, (c) not merge across
run-breaking punctuation/whitespace, (d) keep 1-char runs as unigrams."""

from __future__ import annotations

from pyspark.sql import functions as F

from milvus_spark.operators.text import cjk_bigram_tokens


def _analyze(spark, text: str) -> list[str]:
    df = spark.createDataFrame([(text,)], ["t"]).select(
        cjk_bigram_tokens(F.col("t")).alias("toks")
    )
    return df.collect()[0].toks


def test_cjk_run_bigrams(spark):
    assert _analyze(spark, "向量搜索") == ["向量", "量搜", "搜索"]


def test_mixed_latin_cjk(spark):
    got = _analyze(spark, "Spark 向量搜索 engine")
    assert set(got) == {"spark", "engine", "向量", "量搜", "搜索"}


def test_runs_do_not_merge_across_breaks(spark):
    # punctuation splits the run: no bigram spans 索,引
    got = _analyze(spark, "索引。构建")
    assert "索引" in got and "构建" in got
    assert "引构" not in got


def test_single_char_run_is_unigram(spark):
    got = _analyze(spark, "a 中 b")
    assert set(got) == {"a", "b", "中"}


def test_japanese_korean_ranges(spark):
    got = _analyze(spark, "スパーク 검색엔진")
    assert "スパ" in got and "パー" in got
    assert "검색" in got and "색엔" in got and "엔진" in got
