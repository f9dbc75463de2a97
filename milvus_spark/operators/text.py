"""Text primitives shared by the analyzer / full-text / dedup operator suites.

Reference parity (file:line into /root/reference):
  - Analyzer (standard tokenizer + lowercase filter): internal/util/analyzer/
    and internal/core/src/segcore/canalyzer/ — our "standard" analyzer is
    lowercase + split on non-alphanumeric, the same default pipeline.
  - MinHash signatures: internal/util/function/minhash_function.go:51,72 and
    internal/core/src/minhash/MinHashComputer.cpp (k hash funcs, min over
    shingle hashes).
  - BM25 term stats: internal/util/function/bm25_function.go:103-204 (ingest
    term-freq), internal/querynodev2/delegator/idf_oracle.go:81 (global IDF).

Every helper is a pure ``pyspark.sql.functions`` Column expression (JVM-side,
whole-stage-codegen friendly — no Python UDFs), and each has an exact DuckDB
SQL twin used by the oracle strings (``*_SQL`` helpers below), so Spark and
the oracle compute bit-identical values.

Hash convention (both engines): ``h(s) = int(md5(s)[:8 hex], 16)`` — an
unsigned 32-bit value carried as BIGINT. Seeded variants prefix ``"{seed}:"``.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

TOKEN_SPLIT_RE = "[^a-z0-9]+"


# ---------------------------------------------------------------- Spark side
def tokens(col: Column) -> Column:
    """Standard analyzer: lowercase, split on non-alphanumeric, drop empties."""
    return F.filter(F.split(F.lower(col), TOKEN_SPLIT_RE), lambda x: x != "")


def token_hash(col: Column) -> Column:
    """Unsigned 32-bit md5-prefix hash as BIGINT (portable to DuckDB)."""
    return F.conv(F.substring(F.md5(col), 1, 8), 16, 10).cast("long")


def seeded_hash(col: Column, seed: int) -> Column:
    return token_hash(F.concat(F.lit(f"{seed}:"), col))


def shingles(toks: Column, n: int = 3) -> Column:
    """n-gram shingles (space-joined token windows); empty if < n tokens."""
    idx = F.sequence(F.lit(1), F.size(toks) - F.lit(n - 1))
    win = F.transform(idx, lambda i: F.concat_ws(" ", *[F.element_at(toks, i + j) for j in range(n)]))
    return F.when(F.size(toks) >= n, win).otherwise(F.array().cast("array<string>"))


def minhash_signature(sh: Column, num_hashes: int) -> list[Column]:
    """MinHash signature: one min-of-seeded-hash per seed, over the shingle set."""
    return [F.array_min(F.transform(sh, lambda s: seeded_hash(s, i))) for i in range(num_hashes)]


def simhash16(items: Column) -> Column:
    """16-bit SimHash over a distinct item set (sign of per-bit vote sums).

    Pass tokens for coarse fingerprints or shingles for near-dup detection
    (shingles are far more discriminative on small vocabularies).
    """
    dt = F.array_distinct(items)
    hs = F.transform(dt, token_hash)

    def vote_fn(b: int):
        def f(acc, h):
            return acc + F.when(F.shiftright(h, b).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1)

        return f

    bits = []
    for b in range(16):
        vote = F.aggregate(hs, F.lit(0).cast("long"), vote_fn(b))
        bits.append(F.when(vote > 0, F.lit(1 << b).cast("long")).otherwise(F.lit(0).cast("long")))
    out = bits[0]
    for c in bits[1:]:
        out = out + c
    return out


# CJK character class: CJK Unified Ideographs + Hiragana/Katakana + Hangul
# syllables — the ranges the reference's jieba/lindera analyzers cover
# (internal/util/analyzer/, canalyzer/c_analyzer_test.go:71-225).
CJK_CLASS = "[一-鿿぀-ヿ가-힯]"


def cjk_bigram_tokens(col: Column) -> Column:
    """``cjk_bigram`` analyzer: CJK runs → overlapping character bigrams
    (Lucene CJKAnalyzer semantics — the package-free fallback for corpora
    the jieba/lindera dictionaries would segment); non-CJK runs → the
    standard analyzer. Pure JVM expressions, no Python row path.

    A single-character run emits itself as a unigram so no text is lost."""
    latin = tokens(F.regexp_replace(col, CJK_CLASS + "+", " "))
    runs = F.regexp_extract_all(col, F.lit("(" + CJK_CLASS + "+)"), 1)
    big = F.flatten(
        F.transform(
            runs,
            lambda r: F.when(F.length(r) == 1, F.array(r)).otherwise(
                F.transform(
                    F.sequence(F.lit(1), F.length(r) - 1),
                    lambda i: r.substr(i, F.lit(2)),
                )
            ),
        )
    )
    return F.concat(latin, big)


# --------------------------------------------------------------- DuckDB side
TOKENS_SQL = "list_filter(regexp_split_to_array(lower({col}), '[^a-z0-9]+'), x -> x <> '')"

_CJK_BIGRAMS_SQL = (
    "flatten(list_transform(regexp_extract_all({col}, '(" + CJK_CLASS + "+)', 1), "
    "r -> CASE WHEN length(r) = 1 THEN [r] "
    "ELSE list_transform(range(1, length(r)), i -> substr(r, i, 2)) END))"
)

CJK_TOKENS_SQL = (
    "list_concat("
    + TOKENS_SQL.format(col="regexp_replace({col}, '" + CJK_CLASS + "+', ' ', 'g')")
    + ", "
    + _CJK_BIGRAMS_SQL
    + ")"
)
HASH_SQL = "(('0x' || substr(md5({s}), 1, 8))::BIGINT)"
# NB: the twin is fixed at n=3 — shingles_sql(t, n) generalizes it; every
# suite oracle uses the default n, which shingles() asserts below
SHINGLES_SQL = (
    "list_transform(range(1, len({t}) - 1), i -> {t}[i] || ' ' || {t}[i+1] || ' ' || {t}[i+2])"
)


def shingles_sql(t: str, n: int = 3) -> str:
    """DuckDB twin of ``shingles(col, n)`` for any n (the module contract:
    every Spark helper has a bit-identical SQL twin)."""
    joined = " || ' ' || ".join(f"{t}[i+{j}]" if j else f"{t}[i]" for j in range(n))
    return f"list_transform(range(1, len({t}) - {n - 2}), i -> {joined})"


def seeded_hash_sql(s: str, seed: int) -> str:
    return HASH_SQL.format(s=f"'{seed}:' || {s}")


TOKEN_HASHES_SQL = "list_transform(list_distinct({toks}), t -> " + HASH_SQL.format(s="t") + ")"


def simhash_bits_sql(h: str) -> str:
    """SimHash from a column ``h`` holding the distinct-token hash list."""
    bits = []
    for b in range(16):
        vote = (
            f"list_sum(list_transform({h}, x -> CASE WHEN (x >> {b}) & 1 = 1 THEN 1 ELSE -1 END))"
        )
        bits.append(f"(CASE WHEN {vote} > 0 THEN {1 << b} ELSE 0 END)")
    return "(" + " + ".join(bits) + ")::BIGINT"


def minhash_signature_col(
    col: Column, num_hashes: int, shingle_size: int = 3, token_level: str = "word",
    seed: int = 1234,
) -> Column:
    """MinHash signature of a text column as array<long> — the MINHASH
    ingest FunctionSchema's kernel (minhash_function.go:29-39: num_hashes
    permutations over word shingles or char n-grams; the reference's
    universal-hash family is an implementation detail of the signature
    values — this engine pins the seeded md5-prefix family its dedup suite
    and DuckDB oracles share, so signatures are replicable in SQL).
    ``seed`` offsets the per-permutation seeds, matching the reference's
    seeded permutation init (go:153-155,495)."""
    if token_level == "word":
        sh = F.array_distinct(shingles(tokens(col), shingle_size))
    else:  # "char"
        low = F.lower(col)
        idx = F.sequence(F.lit(1), F.length(low) - F.lit(shingle_size - 1))
        grams = F.when(
            F.length(low) >= shingle_size,
            F.transform(idx, lambda i: low.substr(i, F.lit(shingle_size))),
        ).otherwise(F.array().cast("array<string>"))
        sh = F.array_distinct(grams)
    sig = [
        F.array_min(F.transform(sh, lambda s: seeded_hash(s, seed + i)))
        for i in range(num_hashes)
    ]
    return F.array(*sig).cast("array<long>")
