"""Declarative analyzer configs → Column pipelines.

Reference parity: Milvus analyzers are declared as JSON ``analyzer_params``
({"tokenizer": ..., "filter": [...]}) attached to a varchar field or passed
to run_analyzer (internal/util/analyzer/; canalyzer/c_analyzer_test.go:71-225;
test_milvus_client_analyzer.py, test_milvus_client_pinyin_filter.py).
``build_analyzer`` interprets the same shape into a pure-JVM Column
pipeline: tokenizer ∈ {standard, whitespace, cjk_bigram, cjk_dict, jieba}, filters
∈ {lowercase, length, stop, stemmer, pinyin}.

All filters compose left-to-right like the reference's tantivy chain. The
result is a function Column(str) → Column(array<str>) usable anywhere the
suite analyzers are (BM25 term vectors, text_match, dedup shingles).
"""

from __future__ import annotations

from typing import Callable, Optional, Sequence

from pyspark.sql import Column
from pyspark.sql import functions as F

from milvus_spark.operators.text import cjk_bigram_tokens, tokens


def _whitespace_tokens(col: Column) -> Column:
    return F.filter(F.split(col, r"\s+"), lambda x: x != "")


def _stemmer(toks: Column) -> Column:
    # suffix stemmer with min-stem-3 guard (matches suites/fulltext.py chain)
    return F.transform(
        toks,
        lambda x: F.when(
            F.length(F.regexp_replace(x, "(ing|ed|es|s)$", "")) >= 3,
            F.regexp_replace(x, "(ing|ed|es|s)$", ""),
        ).otherwise(x),
    )


def build_analyzer(
    params: Optional[dict] = None,
    resource_words: Optional[Callable[[str], Sequence[str]]] = None,
) -> Callable[[Column], Column]:
    """Compile ``analyzer_params`` into a Column pipeline.

    ``resource_words`` resolves a ``stopwords_resource`` name to its word
    list (the file-resource hook, client._resource_words)."""
    params = params or {}
    tok = params.get("tokenizer", "standard")
    filters = list(params.get("filter", []))

    tokenize = None
    if isinstance(tok, dict):
        # structured tokenizer spec ({"type": "lindera", "dict_kind":
        # "ipadic"} — the reference's JSON form,
        # canalyzer/c_analyzer_test.go:144-156)
        spec = dict(tok)
        ttype = spec.pop("type", None)
        if ttype == "lindera":
            from milvus_spark.operators.cjk_dict import (
                _LINDERA_KINDS,
                lindera_tokens,
            )

            kind = spec.get("dict_kind", "ipadic")
            if kind not in _LINDERA_KINDS:
                raise ValueError(
                    f"unknown lindera dict_kind {kind!r}; have {_LINDERA_KINDS}"
                )
            tokenize = lambda c, kind=kind: lindera_tokens(c, kind)  # noqa: E731
        elif ttype == "jieba" and ("dict_file" in spec or "dict_resource" in spec):
            # jieba with a REAL dictionary attached ({"type": "jieba",
            # "dict_file": <path>} or {"dict_resource": <file-resource
            # name>} — jieba dict.txt format, public MIT data). The
            # embedded core stays the fallback; supplying the full dict
            # reaches tantivy-jieba parity (the DAG+DP route is already
            # the published algorithm).
            from milvus_spark.operators.cjk_dict import (
                jieba_tokens,
                load_dict_file,
                parse_dict_lines,
            )

            if "dict_file" in spec:
                extra = load_dict_file(spec["dict_file"])
            else:
                if resource_words is None:
                    raise ValueError(
                        "dict_resource requires a client file-resource context"
                    )
                extra = parse_dict_lines(resource_words(spec["dict_resource"]))
            tokenize = lambda c, extra=extra: jieba_tokens(c, extra_dict=extra)  # noqa: E731
        elif ttype in ("jieba", "standard", "whitespace", "cjk_bigram", "cjk_dict"):
            tok = ttype  # plain named tokenizer in structured form
        else:
            raise ValueError(f"unknown tokenizer {tok!r}")
    if tokenize is not None:
        pass  # structured form above already bound it
    elif tok == "standard":
        tokenize = tokens
    elif tok == "whitespace":
        tokenize = _whitespace_tokens
    elif tok == "cjk_bigram":
        tokenize = cjk_bigram_tokens
    elif tok == "cjk_dict":
        from milvus_spark.operators.cjk_dict import cjk_dict_tokens

        tokenize = cjk_dict_tokens
    elif tok == "jieba":
        # DAG-route Chinese segmentation (the reference's jieba binding,
        # canalyzer/c_analyzer_test.go:86-98)
        from milvus_spark.operators.cjk_dict import jieba_tokens

        tokenize = jieba_tokens
    else:
        raise ValueError(f"unknown tokenizer {tok!r}")

    steps: list[Callable[[Column], Column]] = []
    for f in filters:
        spec = {"type": f} if isinstance(f, str) else dict(f)
        ftype = spec.pop("type", None)
        if ftype is None:
            raise ValueError(f"filter spec {spec!r} is missing its 'type'")
        if ftype == "lowercase":
            steps.append(lambda c: F.transform(c, F.lower))
        elif ftype == "length":
            lo = int(spec.get("min", 1))
            hi = int(spec.get("max", 255))
            steps.append(
                lambda c, lo=lo, hi=hi: F.filter(
                    c, lambda x: (F.length(x) >= lo) & (F.length(x) <= hi)
                )
            )
        elif ftype == "stop":
            words = list(spec.get("stop_words", []))
            res = spec.get("stopwords_resource")
            if res is not None:
                if resource_words is None:
                    raise ValueError("stopwords_resource needs a client context")
                words = list(resource_words(res))
            arr = F.array(*[F.lit(w) for w in sorted(set(words))])
            steps.append(
                lambda c, arr=arr: F.filter(c, lambda x: ~F.array_contains(arr, x))
            )
        elif ftype == "stemmer":
            steps.append(_stemmer)
        elif ftype == "pinyin":
            from milvus_spark.operators.pinyin import pinyin_filter

            kw = {
                k: bool(spec[k])
                for k in (
                    "keep_original",
                    "keep_full_pinyin",
                    "keep_joined_full_pinyin",
                    "keep_separate_first_letter",
                )
                if k in spec
            }
            steps.append(lambda c, kw=kw: pinyin_filter(c, **kw))
        else:
            raise ValueError(f"unknown analyzer filter {ftype!r}")

    def analyze(col: Column) -> Column:
        c = tokenize(col)
        for step in steps:
            c = step(c)
        return c

    return analyze
