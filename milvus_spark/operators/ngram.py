"""N-gram inverted index: the scale path for ``%substring%`` (InnerMatch)
filters, which otherwise full-scan every row's text.

Reference parity (file:line into /root/reference):
  - NGRAM scalar index: internal/core/src/index/NgramInvertedIndex.cpp —
    Milvus builds a char-n-gram inverted index over VARCHAR/JSON fields and
    answers InnerMatch (`a like "%pat%"`, pattern_match.go:89,137) by
    intersecting posting lists for the pattern's n-grams, then verifying the
    surviving candidates against the raw text (the n-gram test is necessary,
    not sufficient).
  - Index selection: internal/util/indexparamcheck/index_type.go:30-40 lists
    NGRAM among the scalar index zoo; exec dispatch picks index-vs-data per
    predicate (exec/expression/UnaryExpr.h:1117-1121).

Spark-first design: the "index" is a derived posting table
(gram: string, id: long), distinct — exactly the reference's index-build
lifecycle re-expressed as a DataFrame job. At 100 TB the posting table is
written once per compaction, partitioned/bucketed by ``gram`` so a query's
`gram IN (...)` lands on partition pruning + parquet pushdown and reads only
the pattern's posting lists, never the corpus. Candidate verification joins
the (small) candidate id set back to the corpus — broadcast when it fits,
shuffle-hash otherwise. Shuffle volume is O(candidate ids), not O(rows).
"""

from __future__ import annotations

import hashlib

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from milvus_spark.operators.text import token_hash

N_GRAM_BUCKETS = 32


def py_gbucket(gram: str) -> int:
    """Driver-side twin of the gbucket partition column (md5-prefix hash,
    the repo's portable hash convention — same as text_index.py)."""
    return int(hashlib.md5(gram.encode()).hexdigest()[:8], 16) % N_GRAM_BUCKETS


def char_ngrams(col, n: int = 3):
    """Distinct character n-grams of a string column (JVM-side, no UDF).

    Strings shorter than n yield an EMPTY array: sequence(1, 0) in Spark
    DESCENDS ([1, 0]) rather than being empty, which would emit spurious
    sub-n grams (junk posting rows for every short document)."""
    return F.expr(
        f"CASE WHEN length({col}) >= {n} THEN "
        f"array_distinct(transform(sequence(1, length({col}) - {n - 1}),"
        f" i -> substring({col}, i, {n}))) "
        f"ELSE array() END"
    )


def build_ngram_index(corpus: DataFrame, text_col: str, id_col: str, n: int = 3) -> DataFrame:
    """Posting table (gbucket, gram, id) — hive-partition by ``gbucket``
    (gram-hash bucket) so a pattern's grams prune whole directories at
    file listing, the same layout as the TEXT_MATCH term postings;
    callers cache for repeated probes within a session."""
    flat = (
        corpus.select(
            F.col(id_col).alias("id"),
            F.explode(char_ngrams(text_col, n)).alias("gram"),
        )
        .distinct()
    )
    return flat.select(
        F.pmod(token_hash(F.col("gram")), F.lit(N_GRAM_BUCKETS))
        .cast("int")
        .alias("gbucket"),
        "gram",
        "id",
    )


def inner_match(
    corpus: DataFrame,
    index: DataFrame,
    text_col: str,
    id_col: str,
    pattern: str,
    n: int = 3,
) -> DataFrame:
    """Rows whose text contains ``pattern``, via posting-list intersection +
    exact verification. Falls back to a plain scan for short patterns."""
    if len(pattern) < n:
        return corpus.filter(F.col(text_col).contains(pattern))
    grams = sorted({pattern[i : i + n] for i in range(len(pattern) - n + 1)})
    # docs whose posting lists cover ALL pattern grams (necessary condition);
    # the gbucket filter prunes posting DIRECTORIES at file listing when the
    # index carries the partition column (legacy flat artifacts lack it)
    pruned = index
    if "gbucket" in index.columns:
        pruned = pruned.filter(
            F.col("gbucket").isin(sorted({py_gbucket(g) for g in grams}))
        )
    cands = (
        pruned.filter(F.col("gram").isin(grams))
        .groupBy("id")
        .agg(F.count_distinct("gram").alias("_hits"))
        .filter(F.col("_hits") == len(grams))
        .select("id")
    )
    # verify: n-gram coverage does not imply contiguity
    return corpus.join(
        cands, corpus[id_col] == cands["id"], "left_semi"  # no forced
        # broadcast: a low-selectivity pattern (one common gram) can match a
        # large corpus fraction — AQE broadcasts when the set is small and
        # falls back to a shuffle join when it is not
    ).filter(F.col(text_col).contains(pattern))
