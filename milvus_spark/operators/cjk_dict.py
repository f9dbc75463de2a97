"""Dictionary-based CJK segmentation: maximum-forward-matching analyzer.

The reference ships dictionary segmenters for CJK corpora (jieba for
Chinese, lindera for Japanese — internal/util/analyzer/,
canalyzer/c_analyzer_test.go:71-225). This container has none of those
dictionaries, so the ``cjk_dict`` analyzer embeds a small deterministic
dictionary and applies the classic maximum-forward-matching (MFM) scan:
at each position take the LONGEST dictionary word starting there, else
emit a single character — the greedy algorithm jieba's DAG route
approximates and lindera's Viterbi refines.

The tokenizer itself is an Arrow-batched pandas UDF (``mapInPandas``-class
slot): dictionary lookup is exactly the kind of per-string library work a
real jieba/lindera integration performs, and it is map-side only — no
shuffle, embarrassingly parallel over partitions, so the same plan runs
at any corpus size. ``cjk_bigram`` (operators/text.py) remains the
dictionary-free fallback.

The embedded dictionary derives from the corpus vocabulary via the same
md5-based char mapping the CJK test fixtures use, so an external SQL
oracle can rebuild the identical dictionary and replay MFM exactly
(recursive-CTE greedy scan — suites/fulltext.py).
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F

# corpus vocabulary (sorted; the synthetic documents table draws from
# exactly these tokens) — stand-in for an embedded frequency dictionary
VOCAB = sorted(
    [
        "a", "agg", "batch", "big", "column", "customer", "data", "dup",
        "fast", "filter", "group", "hash", "join", "key", "line", "merge",
        "order", "part", "query", "row", "scan", "slow", "small", "sort",
        "spark", "stream", "table", "the", "value", "vector", "window",
    ]
)
# triples come from this prefix of the vocabulary (bounds dictionary size)
TRI_VOCAB = VOCAB[:12]


def cjk_char_of(token: str) -> str:
    """Deterministic token → CJK codepoint (shared with the CJK fixtures:
    int of first 8 md5 hex chars, mod 512, offset U+4E00)."""
    return chr(0x4E00 + int(hashlib.md5(token.encode()).hexdigest()[:8], 16) % 512)


def build_dictionary() -> tuple[frozenset[str], frozenset[str]]:
    """(2-char words, 3-char words): mapped-char sequences of all vocab
    pairs and of all triples over the TRI_VOCAB prefix — a few thousand
    entries, the scale a real embedded dictionary core starts at."""
    c = {w: cjk_char_of(w) for w in VOCAB}
    # distinct-word pairs only: immediate repeats ("table table") stay
    # unsegmented, so the MFM scan exercises all three branch lengths
    d2 = frozenset(c[a] + c[b] for a in VOCAB for b in VOCAB if a != b)
    d3 = frozenset(
        c[a] + c[b] + c[x] for a in TRI_VOCAB for b in TRI_VOCAB for x in TRI_VOCAB
    )
    return d2, d3


def mfm_segment(run: str, d2: frozenset[str], d3: frozenset[str]) -> list[str]:
    """Greedy maximum-forward-matching over one CJK run."""
    out, pos, n = [], 0, len(run)
    while pos < n:
        if run[pos : pos + 3] in d3:
            out.append(run[pos : pos + 3])
            pos += 3
        elif run[pos : pos + 2] in d2:
            out.append(run[pos : pos + 2])
            pos += 2
        else:
            out.append(run[pos])
            pos += 1
    return out


def cjk_dict_tokens(col: Column) -> Column:
    """``cjk_dict`` analyzer column: CJK string → MFM word tokens."""
    d2, d3 = build_dictionary()

    @F.pandas_udf("array<string>")
    def seg(batches: Iterator[pd.Series]) -> Iterator[pd.Series]:
        for s in batches:
            yield s.map(lambda r: mfm_segment(r or "", d2, d3))

    return seg(col)
