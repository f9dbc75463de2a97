"""Text-analysis + deduplication suite over the ``documents`` table.

These are the LLM-training-pipeline operators (plus the Milvus minhash/dedup
surface — internal/util/function/minhash_function.go:51,72,
internal/core/src/minhash/MinHashComputer.cpp, metric MHJACCARD
pkg/util/metric/metric_type.go). Every query is pure built-in-function
DataFrame code (no Python UDFs) with a bit-identical DuckDB oracle.

Scale notes (100 TB posture):
  - Token/shingle/minhash/simhash computation is per-row map-side work inside
    whole-stage codegen — embarrassingly parallel, no shuffle.
  - Near-dup pipelines run in two levels: (1) CONTENT COLLAPSE — identical
    shingle sets group under a set hash and only one representative per
    unique set enters any self-join (jaccard / minhash signatures / LSH
    bands are functions of the set), so a duplication-heavy corpus — the
    dedup workload by definition — does its quadratic work on unique
    content only; (2) candidate generation over representatives is the
    lossless PPJoin prefix filter (ngram) or the banded equi-join
    (minhash/simhash). Rep-level pairs expand to member pairs through
    output-bounded equi-joins. Measured: 10× replication (~×1000 true
    pairs) leaves ngram/minhash wall-clock FLAT.
  - Exact dedup is a hash groupBy (map-side partial agg).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from milvus_spark.operators.text import (
    HASH_SQL,
    SHINGLES_SQL,
    TOKEN_HASHES_SQL,
    TOKENS_SQL,
    minhash_signature,
    seeded_hash,
    seeded_hash_sql,
    shingles,
    simhash16,
    simhash_bits_sql,
    token_hash,
    tokens,
)
from milvus_spark.registry import register
from milvus_spark.session import load_table

_TOKS = TOKENS_SQL.format(col="text")

STOPWORDS = ["the", "a", "of", "and", "to", "in", "is"]
_STOP_SQL = "[" + ", ".join(f"'{w}'" for w in STOPWORDS) + "]"


def _docs_tokens(spark: SparkSession, sf: str) -> DataFrame:
    d = load_table(spark, sf, "documents")
    return d.withColumn("toks", tokens(F.col("text")))


# --- token counting (whitespace/regex tokenizer) ------------------------------
@register(
    "txt_token_count",
    oracle=f"""
    WITH t AS (SELECT doc_id, {_TOKS} AS toks FROM documents)
    SELECT doc_id,
           CAST(len(toks) AS BIGINT) AS n_tokens,
           CAST(len(list_distinct(toks)) AS BIGINT) AS n_unique,
           round(list_sum(list_transform(toks, x -> len(x))) * 1.0 / len(toks), 4) AS mean_tok_len
    FROM t
    """,
)
def txt_token_count(spark: SparkSession, sf: str) -> DataFrame:
    t = _docs_tokens(spark, sf)
    return t.select(
        "doc_id",
        F.size("toks").cast("long").alias("n_tokens"),
        F.size(F.array_distinct("toks")).cast("long").alias("n_unique"),
        F.round(
            F.aggregate("toks", F.lit(0).cast("long"), lambda a, x: a + F.length(x))
            / F.size("toks"),
            4,
        ).alias("mean_tok_len"),
    )


# --- language-ID heuristic (stopword-hit ratio) -------------------------------
@register(
    "txt_lang_id",
    oracle=f"""
    WITH t AS (SELECT doc_id, {_TOKS} AS toks FROM documents)
    SELECT doc_id,
           CAST(len(list_filter(toks, x -> list_contains({_STOP_SQL}, x))) AS BIGINT) AS stop_hits,
           CASE WHEN len(list_filter(toks, x -> list_contains({_STOP_SQL}, x))) * 1.0
                     / len(toks) >= 0.02
                THEN 'en' ELSE 'other' END AS pred_lang
    FROM t
    """,
)
def txt_lang_id(spark: SparkSession, sf: str) -> DataFrame:
    t = _docs_tokens(spark, sf)
    hits = F.size(F.filter("toks", lambda x: x.isin(STOPWORDS)))
    return t.select(
        "doc_id",
        hits.cast("long").alias("stop_hits"),
        F.when(hits / F.size("toks") >= 0.02, "en").otherwise("other").alias("pred_lang"),
    )


# --- quality scoring (length / stopword / uniqueness ratios) ------------------
@register(
    "txt_quality",
    oracle=f"""
    WITH t AS (SELECT doc_id, n_chars, {_TOKS} AS toks FROM documents)
    SELECT doc_id,
           round(least(1.0, len(toks) / 100.0), 4) AS len_score,
           round(len(list_filter(toks, x -> list_contains({_STOP_SQL}, x))) * 1.0 / len(toks), 4)
             AS stop_ratio,
           round(len(list_distinct(toks)) * 1.0 / len(toks), 4) AS uniq_ratio,
           round(0.4 * least(1.0, len(toks) / 100.0)
                 + 0.3 * (len(list_filter(toks, x -> list_contains({_STOP_SQL}, x))) * 1.0 / len(toks))
                 + 0.3 * (len(list_distinct(toks)) * 1.0 / len(toks)), 4) AS quality
    FROM t
    """,
)
def txt_quality(spark: SparkSession, sf: str) -> DataFrame:
    t = _docs_tokens(spark, sf)
    n = F.size("toks")
    len_score = F.least(F.lit(1.0), n / F.lit(100.0))
    stop_ratio = F.size(F.filter("toks", lambda x: x.isin(STOPWORDS))) / n
    uniq_ratio = F.size(F.array_distinct("toks")) / n
    return t.select(
        "doc_id",
        F.round(len_score, 4).alias("len_score"),
        F.round(stop_ratio, 4).alias("stop_ratio"),
        F.round(uniq_ratio, 4).alias("uniq_ratio"),
        F.round(0.4 * len_score + 0.3 * stop_ratio + 0.3 * uniq_ratio, 4).alias("quality"),
    )


# --- document fingerprint: min shingle hash + simhash -------------------------
@register(
    "txt_fingerprint",
    oracle=f"""
    WITH t AS (SELECT doc_id, {_TOKS} AS toks FROM documents),
    s AS (SELECT doc_id, list_distinct({SHINGLES_SQL.format(t='toks')}) AS sh FROM t),
    hh AS (SELECT doc_id, list_min(list_transform(sh, g -> {HASH_SQL.format(s='g')})) AS min_shingle_hash,
                  list_transform(sh, g -> {HASH_SQL.format(s='g')}) AS th
           FROM s)
    SELECT doc_id, min_shingle_hash, {simhash_bits_sql('th')} AS simhash
    FROM hh
    """,
)
def txt_fingerprint(spark: SparkSession, sf: str) -> DataFrame:
    """Rolling-window fingerprints: min shingle hash + 16-bit shingle SimHash."""
    t = _docs_tokens(spark, sf).withColumn("sh", F.array_distinct(shingles(F.col("toks"))))
    return t.select(
        "doc_id",
        F.array_min(F.transform("sh", token_hash)).alias("min_shingle_hash"),
        simhash16(F.col("sh")).alias("simhash"),
    )


# --- exact dedup: normalized-text hash groupBy --------------------------------
@register(
    "dedup_exact",
    oracle=f"""
    WITH t AS (SELECT doc_id, md5(array_to_string({_TOKS}, ' ')) AS text_hash FROM documents)
    SELECT text_hash,
           CAST(min(doc_id) AS BIGINT) AS canonical_id,
           CAST(count(*) AS BIGINT) AS n_copies
    FROM t GROUP BY text_hash
    """,
)
def dedup_exact(spark: SparkSession, sf: str) -> DataFrame:
    t = _docs_tokens(spark, sf)
    return (
        t.select("doc_id", F.md5(F.concat_ws(" ", F.col("toks"))).alias("text_hash"))
        .groupBy("text_hash")
        .agg(
            F.min("doc_id").cast("long").alias("canonical_id"),
            F.count(F.lit(1)).alias("n_copies"),
        )
    )


# --- n-gram Jaccard near-dup (inverted shingle index self-join) ---------------
_JACCARD_CTES = f"""
    t AS (SELECT doc_id, {_TOKS} AS toks FROM documents),
    s AS (SELECT doc_id, list_distinct({SHINGLES_SQL.format(t='toks')}) AS sh FROM t),
    e AS (SELECT doc_id, unnest(sh) AS g FROM s),
    pairs AS (
      SELECT e1.doc_id AS a, e2.doc_id AS b, count(*) AS inter
      FROM e e1 JOIN e e2 ON e1.g = e2.g AND e1.doc_id < e2.doc_id
      GROUP BY 1, 2
    ),
    sized AS (SELECT doc_id, len(sh) AS cnt FROM s),
    jac AS (
      SELECT a, b, round(inter * 1.0 / (sa.cnt + sb.cnt - inter), 4) AS jaccard
      FROM pairs JOIN sized sa ON a = sa.doc_id JOIN sized sb ON b = sb.doc_id
    )
"""


# Jaccard similarity threshold shared by the candidate filter and the
# exact verification below.
NGRAM_JACCARD_THETA = 0.5


# one materialized collapse per (session, sf): the kernel backs five dedup
# queries (ngram, minhash, components, calibration, incremental) and its two
# eager counts were being re-paid per query per bench pass. Spark's plan
# cache already dedupes the InMemoryRelation; the memo additionally skips
# the re-count jobs (a measured ~0.3s/pass of pure scheduling overhead).
# Keyed by applicationId so a restarted session never sees stale frames;
# the underlying parquet is read-only testdata, so reuse is always sound.
_COLLAPSE_MEMO: dict = {}


def _shingle_sets_collapsed(spark: SparkSession, sf: str):
    """(members, rs): content-hash collapse of identical shingle SETS.

    ``members`` = (doc_id, h); ``rs`` = one representative (doc_id, sh, h)
    per unique set, cached eagerly. Every set-derived similarity (jaccard,
    minhash signature, LSH band) is identical across a group, so the
    quadratic candidate machinery only ever needs to run on ``rs`` —
    duplication-heavy corpora (the dedup workload by definition) collapse
    to their unique content BEFORE any self-join, and group expansion
    afterwards is pure output-bound equi-join work. The hash is
    sha2-256 over the order-normalized set (array_sort), so two docs whose
    texts produce the same set in different first-occurrence order still
    collapse; a hash collision would need 2⁻¹²⁸-scale luck."""
    key = (spark.sparkContext.applicationId, sf)
    hit = _COLLAPSE_MEMO.get(key)
    if hit is not None:
        return hit
    t = _docs_tokens(spark, sf)
    s = t.select("doc_id", F.array_distinct(shingles(F.col("toks"))).alias("sh"))
    # empty sets (docs under 3 tokens) can never reach jaccard ≥ θ — and
    # must NOT group with each other (0/0 is NULL in the oracle, not 1.0)
    #
    # cache(), not localCheckpoint(): the frame is WIDE (the sh arrays) and
    # every consumer prunes columns — InMemoryRelation keeps the columnar
    # layout so `members` reads only (doc_id, h), while a localCheckpoint
    # is an RDD row barrier that re-materializes full rows per consumer
    # (measured here: 10× slower). The localCheckpoint lesson applies to
    # small ITERATIVE state (dedup_components), not to wide reused frames.
    s = (
        s.filter(F.size("sh") > 0)
        .withColumn("h", F.sha2(F.concat_ws("\x1f", F.array_sort("sh")), 256))
        .cache()
    )
    s.count()
    members = s.select("doc_id", "h")
    reps = (
        s.groupBy("h")
        .agg(F.min("doc_id").alias("rid"))
        .select(F.col("h").alias("rh"), "rid")
    )
    rs = (
        s.join(reps, (F.col("h") == F.col("rh")) & (F.col("doc_id") == F.col("rid")))
        .select("doc_id", "sh", "h")
        .cache()
    )
    rs.count()
    _COLLAPSE_MEMO[key] = (members, rs)
    return members, rs


def _within_group_pairs(members):
    """All (a < b) doc pairs inside each identical-set group — fully
    renamed projections on both sides so the self-join is unambiguous."""
    wa = members.select(F.col("h").alias("wha"), F.col("doc_id").alias("a"))
    wb = members.select(F.col("h").alias("whb"), F.col("doc_id").alias("b"))
    return wa.join(
        wb, (F.col("wha") == F.col("whb")) & (F.col("a") < F.col("b"))
    ).select("a", "b")


def _expand_group_pairs(members, rep_pairs, extra_cols: list[str]):
    """Rep-level pairs → member-level pairs, plus all within-group pairs.

    ``rep_pairs`` carries (ha, hb, *extra_cols) for DISTINCT set hashes.
    Pure equi-joins on the group hash — work proportional to the OUTPUT,
    never to corpus². Within-group (identical-set) pairs are emitted by
    the caller, which knows the identical-set value of each metric."""
    ma = members.select(F.col("h").alias("ha"), F.col("doc_id").alias("da"))
    mb = members.select(F.col("h").alias("hb"), F.col("doc_id").alias("db"))
    cross = (
        rep_pairs.join(ma, "ha")
        .join(mb, "hb")
        .select(
            F.least("da", "db").alias("a"),
            F.greatest("da", "db").alias("b"),
            *extra_cols,
        )
    )
    return cross


def _ngram_rep_pairs(spark: SparkSession, sf: str):
    """(members, rep_pairs): the collapse + prefix/position-filtered +
    exactly-verified rep-level jaccard pairs shared by dedup_ngram_jaccard
    (which expands them to member pairs) and dedup_components (which
    propagates labels over the GROUP graph instead)."""
    theta = NGRAM_JACCARD_THETA
    from pyspark.sql import Window as W

    members, rs = _shingle_sets_collapsed(spark, sf)
    # set size rides the explode (it's just size(sh)) — no join back later
    e = rs.select("doc_id", F.size("sh").alias("cnt"), F.explode("sh").alias("g"))
    # global canonical order: one aggregate on the same key the join
    # shuffles on; df is the sort key so rare shingles lead every prefix
    dfreq = e.groupBy("g").agg(F.count(F.lit(1)).alias("gdf"))
    ranked = e.join(dfreq, "g").withColumn(
        "rn",
        F.row_number().over(W.partitionBy("doc_id").orderBy("gdf", "g")),
    )
    # prefix length |sh| − ⌈θ|sh|⌉ + 1 (per-doc windows are bounded by doc
    # length, so the window shuffle is linear and skew-free).
    # NOT memoized/cached like the collapse kernel: measured at sf0.1, a
    # reused InMemoryRelation here flips AQE's strategy for the prefix
    # self-join and runs 3× SLOWER than recomputing the postings per pass
    # (Spark's plan cache already dedupes the underlying collapse).
    prefix = ranked.filter(
        F.col("rn") <= F.col("cnt") - F.ceil(theta * F.col("cnt")) + 1
    ).select("doc_id", "g", "cnt", "rn")
    p2 = prefix.select(
        F.col("doc_id").alias("b_id"), F.col("g").alias("g2"),
        F.col("cnt").alias("cb"), F.col("rn").alias("rn2"),
    )
    # pair-level overlap requirement: jaccard ≥ θ ⟺ |A∩B| ≥ θ/(1+θ)·(|A|+|B|)
    t_pair = F.ceil(theta / (1 + theta) * (prefix.cnt + p2.cb))
    # PPJoin POSITION filter (lossless): for a qualifying pair, its FIRST
    # shared shingle in the global order sits at rank i in A and j in B
    # with every shared element at rank ≥ i (resp. ≥ j), so the overlap is
    # at most min(|A|−i, |B|−j)+1 — that occurrence must clear t_pair, so
    # filtering every occurrence against its own bound keeps the pair
    pos_ok = F.least(prefix.cnt - prefix.rn, p2.cb - p2.rn2) + 1 >= t_pair
    # prefix self-join: equi-join on the shingle, with the PPJoin length
    # filter (jaccard ≥ θ forces θ ≤ |A|/|B| ≤ 1/θ) and the position
    # filter applied in-join, BEFORE the distinct shuffle
    cand = (
        prefix.join(
            p2,
            (prefix.g == p2.g2)
            & (prefix.doc_id < p2.b_id)
            & (prefix.cnt >= theta * p2.cb)
            & (p2.cb >= theta * prefix.cnt)
            & pos_ok,
        )
        .select(F.col("doc_id").alias("a"), F.col("b_id").alias("b"))
        .distinct()
    )
    # exact verification over full shingle sets (survivors are few → broadcast)
    sa = rs.select(F.col("doc_id").alias("a"), F.col("sh").alias("sha"), F.col("h").alias("ha"))
    sb = rs.select(F.col("doc_id").alias("b"), F.col("sh").alias("shb"), F.col("h").alias("hb"))
    inter = F.size(F.array_intersect("sha", "shb"))
    rep_pairs = (
        sa.join(F.broadcast(cand), "a")
        .join(sb.hint("shuffle_hash"), "b")
        .select(
            "ha",
            "hb",
            F.round(inter / (F.size("sha") + F.size("shb") - inter), 4).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= theta)
    )
    return members, rep_pairs


@register(
    "dedup_ngram_jaccard",
    oracle=f"""
    WITH {_JACCARD_CTES}
    SELECT a, b, jaccard FROM jac WHERE jaccard >= 0.5
    """,
)
def dedup_ngram_jaccard(spark: SparkSession, sf: str) -> DataFrame:
    """Exact near-dup via set collapse + a PREFIX-FILTERED inverted index.

    Two-level scale design:
      1. CONTENT COLLAPSE: identical shingle sets share every pairwise
         jaccard, so docs group by a set hash and the candidate machinery
         runs on one representative per unique set
         (``_shingle_sets_collapsed``). A corpus that is 90% copies — the
         normal dedup input — does its quadratic work on the 10%.
      2. PREFIX FILTER over representatives (AllPairs/PPJoin, Bayardo
         WWW'07; Xiao WWW'08): order each set's shingles by a global
         (df, value) canonical order and emit only the first
         ``|sh| − ⌈θ·|sh|⌉ + 1`` postings into the self-join. Any pair
         with jaccard ≥ θ shares ≥ ⌈θ·max(|A|,|B|)⌉ shingles, so by
         pigeonhole one lands in BOTH prefixes — candidate generation is
         provably LOSSLESS at any cluster size (the r4 df-cap gap). A
         length filter (θ ≤ |A|/|B| ≤ 1/θ) prunes in-join; exact Jaccard
         over full sets verifies survivors.
    Rep-level pairs then expand to member pairs, and within-group pairs
    emit directly at jaccard 1.0 — both pure output-bound equi-joins on
    the group hash. Result is bit-identical to the all-pairs oracle.
    Measured: 10× replicated corpus (output pairs ×~1000) runs the
    self-join on the SAME unique-set count as 1× — wall stays seconds
    where the uncollapsed plan took minutes."""
    members, rep_pairs = _ngram_rep_pairs(spark, sf)
    cross = _expand_group_pairs(members, rep_pairs, ["jaccard"])
    within = _within_group_pairs(members).withColumn("jaccard", F.lit(1.0))
    return within.unionByName(cross.select("a", "b", "jaccard"))


# --- MinHash + LSH near-dup (band join candidates, verified) ------------------
_H = 8  # hash functions
_BANDS = 4  # 4 bands × 2 rows

# memoized band index per (session, sf) — same contract as _COLLAPSE_MEMO
_BANDS_MEMO: dict = {}


def clear_memos() -> None:
    """Drop the memoized dedup index frames (collapse kernel + band index).
    For measurement harnesses that want per-query isolation: a memo hit
    returns frames whose .cache() may have been evicted/cleared, in which
    case the next action silently pays re-materialization inside its
    timing window — clearing the memo makes the rebuild explicit in the
    warm pass instead."""
    _COLLAPSE_MEMO.clear()
    _BANDS_MEMO.clear()


def _minhash_sig_sql() -> str:
    sigs = ", ".join(
        f"list_min(list_transform(sh, g -> {seeded_hash_sql('g', i)})) AS s{i}" for i in range(_H)
    )
    return f"SELECT doc_id, sh, {sigs} FROM s"


def _band_sql(j: int) -> str:
    return f"md5(s{2 * j} || '_' || s{2 * j + 1})"


@register(
    "dedup_minhash_lsh",
    oracle=f"""
    WITH t AS (SELECT doc_id, {_TOKS} AS toks FROM documents),
    s AS (SELECT doc_id, list_distinct({SHINGLES_SQL.format(t='toks')}) AS sh FROM t),
    sig AS ({_minhash_sig_sql()}),
    bands AS (
      {" UNION ALL ".join(f"SELECT doc_id, {j} AS band, {_band_sql(j)} AS bh FROM sig" for j in range(_BANDS))}
    ),
    cand AS (
      SELECT DISTINCT b1.doc_id AS a, b2.doc_id AS b
      FROM bands b1 JOIN bands b2 ON b1.band = b2.band AND b1.bh = b2.bh AND b1.doc_id < b2.doc_id
    ),
    verified AS (
      SELECT c.a, c.b,
             round(len(list_intersect(sa.sh, sb.sh)) * 1.0 /
                   (len(sa.sh) + len(sb.sh) - len(list_intersect(sa.sh, sb.sh))), 4) AS jaccard
      FROM cand c JOIN s sa ON c.a = sa.doc_id JOIN s sb ON c.b = sb.doc_id
    )
    SELECT a, b, jaccard FROM verified WHERE jaccard >= 0.5
    """,
)
def dedup_minhash_lsh(spark: SparkSession, sf: str) -> DataFrame:
    """MinHash(8) + LSH(4 bands × 2 rows) candidate pairs, verified with the
    true shingle Jaccard ≥ 0.5. The band self-join bounds candidate fan-out —
    this is the web-scale dedup shape (shuffle keyed on band hash, skew
    bounded by banding).

    Like dedup_ngram_jaccard, the whole pipeline runs on ONE representative
    per unique shingle set (signatures and bands are functions of the set,
    so rep-level collisions are exactly member-level collisions), and
    rep pairs expand to member pairs afterwards; identical-set groups are
    permanent band collisions that verify at jaccard 1.0, so they emit
    directly. Duplication — the dedup workload's defining property — thus
    multiplies only the output-writing joins, never the band join.
    Measured at 10× replication (~×1000 output pairs): the uncollapsed
    band join took 32s, the collapsed one single-digit seconds."""
    members, rs = _shingle_sets_collapsed(spark, sf)
    key = (spark.sparkContext.applicationId, sf)
    bands = _BANDS_MEMO.get(key)
    if bands is None:
        sig = rs.select(
            "doc_id", "h",
            *[c.alias(f"s{i}") for i, c in enumerate(minhash_signature(F.col("sh"), _H))],
        )
        band_arr = F.array(
            *[
                F.md5(F.concat_ws("_", F.col(f"s{2 * j}"), F.col(f"s{2 * j + 1}")))
                for j in range(_BANDS)
            ]
        )
        bands = sig.select("doc_id", F.posexplode(band_arr).alias("band", "bh")).cache()
        # eager materialization (the "index build"): the expensive md5
        # signature trees run exactly once here, and every downstream join
        # plans against a cached relation with known stats — otherwise AQE's
        # strategy choice for the self-join is made blind and is unstable
        # run-to-run. Memoized like the collapse kernel so repeated queries
        # (and bench passes) skip the re-count job entirely.
        bands.count()
        _BANDS_MEMO[key] = bands
    b2 = bands.select(F.col("doc_id").alias("b_id"), F.col("band").alias("band2"), F.col("bh").alias("bh2"))
    # band self-join over unique sets: shuffle hash on (band, bh) — the
    # scale shape; banding bounds bucket sizes so no sort is needed
    cand = (
        bands.hint("shuffle_hash")
        .join(b2, (bands.band == b2.band2) & (bands.bh == b2.bh2) & (bands.doc_id < b2.b_id))
        .select(F.col("doc_id").alias("a"), F.col("b_id").alias("b"))
        .distinct()
    )
    sa = rs.select(F.col("doc_id").alias("a"), F.col("sh").alias("sha"), F.col("h").alias("ha"))
    sb = rs.select(F.col("doc_id").alias("b"), F.col("sh").alias("shb"), F.col("h").alias("hb"))
    inter = F.size(F.array_intersect("sha", "shb"))
    # LSH's whole point is that the surviving candidate set is small — so
    # both verify probes broadcast and the (huge at scale) shingle table is
    # probed in place TWICE with zero shuffles: first cand picks up side-a
    # sets, then that candidate-sized frame (pairs × one shingle array)
    # broadcasts to pick up side-b sets. If candidate volume ever outgrew
    # broadcast range the LSH banding itself would be mis-tuned — more bands
    # / narrower rows is the knob, not a corpus-sized shuffle here.
    half = sa.join(F.broadcast(cand), "a")
    rep_pairs = (
        sb.join(F.broadcast(half), "b")
        .select(
            "ha",
            "hb",
            F.round(inter / (F.size("sha") + F.size("shb") - inter), 4).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= 0.5)
    )
    cross = _expand_group_pairs(members, rep_pairs, ["jaccard"])
    within = _within_group_pairs(members).withColumn("jaccard", F.lit(1.0))
    return within.unionByName(cross.select("a", "b", "jaccard"))


# --- SimHash near-dup: hamming distance over 16-bit fingerprints --------------
@register(
    "dedup_simhash",
    oracle=f"""
    WITH t AS (SELECT doc_id, {_TOKS} AS toks FROM documents),
    s AS (SELECT doc_id, list_distinct({SHINGLES_SQL.format(t='toks')}) AS sh FROM t),
    hh AS (SELECT doc_id, list_transform(sh, g -> {HASH_SQL.format(s='g')}) AS th FROM s),
    fp AS (SELECT doc_id, {simhash_bits_sql('th')} AS simhash FROM hh)
    SELECT f1.doc_id AS a, f2.doc_id AS b,
           CAST(bit_count(xor(f1.simhash, f2.simhash)) AS BIGINT) AS hamming
    FROM fp f1 JOIN fp f2 ON f1.doc_id < f2.doc_id
    WHERE bit_count(xor(f1.simhash, f2.simhash)) <= 1
    """,
)
def dedup_simhash(spark: SparkSession, sf: str) -> DataFrame:
    """SimHash near-dup pairs (shingle fingerprints, hamming ≤ 1), banded.

    Pigeonhole banding, not an all-pairs join: the 16-bit fingerprint is
    split into two 8-bit halves; any pair at hamming ≤ 1 differs in at most
    one half, so it collides exactly on the other. Each row explodes to two
    (half_id, half_value) keys, the self-join is an equi-join on that key
    (linear shuffle, shuffle-hash, no sort), candidate pairs are deduped and
    verified with one bit_count over the carried fingerprints. Same result
    as the all-pairs oracle, but the plan scales: candidate volume is bound
    by bucket co-occupancy instead of n². At real scale the same shape runs
    on a 64-bit simhash split into (d+1) bands (e.g. 4×16-bit for
    hamming ≤ 3), which keeps buckets sparse; with 16 bits the band width
    is fixed by the oracle's fingerprint size.
    """
    t = _docs_tokens(spark, sf)
    sh = F.array_distinct(shingles(F.col("toks")))
    # cache barrier: materialize the 16-expression fingerprint ONCE per row.
    # A repartition alone does not survive CollapseProject — the planner
    # folds this projection into the band-explode select, duplicating the
    # whole aggregate tree into each half expression (measured ~20× the
    # map cost); the eager cache pins the two-long relation instead.
    fp = t.select("doc_id", simhash16(sh).alias("simhash")).cache()
    fp.count()
    halves = F.array(
        F.shiftright("simhash", 8).cast("long"),
        F.col("simhash").bitwiseAND(F.lit(255)).cast("long"),
    )
    e = fp.select("doc_id", "simhash", F.posexplode(halves).alias("hid", "hv"))
    e2 = e.select(
        F.col("doc_id").alias("b"),
        F.col("simhash").alias("sh2"),
        F.col("hid").alias("hid2"),
        F.col("hv").alias("hv2"),
    )
    # verify INSIDE the join stage (bit_count over two carried longs, pure
    # codegen) so only true hits reach the dedup shuffle — a hamming-0 pair
    # collides on both halves and would otherwise double through distinct
    ham = F.bit_count(F.col("simhash").bitwiseXOR(F.col("sh2")))
    return (
        e.hint("shuffle_hash")
        .join(e2, (e.hid == e2.hid2) & (e.hv == e2.hv2) & (e.doc_id < e2.b))
        .filter(ham <= 1)
        .select(
            F.col("doc_id").alias("a"), "b", ham.cast("long").alias("hamming")
        )
        .distinct()
    )


# --- embedding-cosine near-dup: top-20 most similar pairs ---------------------
@register(
    "dedup_embedding_pairs",
    oracle="""
    WITH p AS (
      SELECT a.vec_id AS ia, b.vec_id AS ib,
             round(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                                          CAST(b.embedding AS DOUBLE[])), 4) AS cos
      FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
    ),
    ranked AS (
      SELECT ia, ib, cos,
             CAST(row_number() OVER (ORDER BY cos DESC, ia, ib) AS BIGINT) AS rank
      FROM p
    )
    SELECT ia, ib, cos, rank FROM ranked WHERE rank <= 20
    """,
)
def dedup_embedding_pairs(spark: SparkSession, sf: str) -> DataFrame:
    """Top-20 nearest pairs via multi-table LSH candidates + exact cosine.

    Scale path (the registered plan, not just a comment): random-hyperplane
    LSH over L OR-amplified tables generates near-linear candidate pairs
    (operators/lsh.py embedding_near_dup), each verified with an exact
    JVM-side cosine — never the O(n²) theta join. On the planted-dup test
    data the top pairs collide in ≥1 of the L tables with prob ≈ 1, so the
    result matches the all-pairs oracle exactly (gated by the driver's
    value-hash); tests/test_lsh.py holds the recall contract in general.
    """
    from milvus_spark.operators.lsh import embedding_near_dup, hyperplane_tables

    e = load_table(spark, sf, "embeddings")
    dim = len(e.select("embedding").first()[0])
    # Short codes + many tables: the test corpus's top pairs are only
    # moderately similar (cos ≈ 0.44-0.51), so per-table collision prob is
    # ~0.2 and 60 OR-amplified tables push miss prob per pair below 1e-4.
    # Deterministic seed → the exact-match gate is reproducible. With real
    # near-dup corpora (cos ≥ 0.9) 8-16 tables suffice and candidates stay
    # near-linear; the plan shape (index self-join, no nested-loop cross
    # join) is identical either way.
    HT = hyperplane_tables(dim, nbits=4, n_tables=60, seed=7)
    pairs = embedding_near_dup(e, "embedding", "vec_id", HT, threshold=-1.0).select(
        F.col("ia"), F.col("ib"), F.col("cos")
    )
    # Distributed top-k (TakeOrdered) first; the rank window then runs on 20 rows.
    top = pairs.orderBy(F.col("cos").desc(), F.col("ia").asc(), F.col("ib").asc()).limit(20)
    from pyspark.sql import Window as W

    w = W.partitionBy(F.lit(0)).orderBy(F.col("cos").desc(), F.col("ia").asc(), F.col("ib").asc())
    return top.withColumn("rank", F.row_number().over(w).cast("long")).select(
        "ia", "ib", "cos", "rank"
    )


# --- dedup clustering: connected components over the near-dup graph -----------
@register(
    "dedup_components",
    oracle=f"""
    WITH {_JACCARD_CTES},
    edges AS (
      SELECT a, b FROM jac WHERE jaccard >= 0.5
      UNION SELECT b, a FROM jac WHERE jaccard >= 0.5
    ),
    nodes AS (SELECT DISTINCT a AS n FROM edges),
    reach AS (
      WITH RECURSIVE r(src, dst) AS (
        SELECT n, n FROM nodes
        UNION
        SELECT r.src, e.b FROM r JOIN edges e ON r.dst = e.a
      )
      SELECT src, dst FROM r
    )
    SELECT src AS doc_id, CAST(min(dst) AS BIGINT) AS canonical_id
    FROM reach GROUP BY src
    """,
)
def dedup_components(spark: SparkSession, sf: str) -> DataFrame:
    """Near-dup clusters: connected components of the jaccard ≥ 0.5 pair
    graph via min-label propagation on the COLLAPSED group graph.

    Identical-set groups are cliques, so each group is one supernode whose
    initial label is its minimum member doc_id (= the group rep). Labels
    propagate over rep-level edges only — iterations shuffle the
    unique-set graph, never the member-level pair list, so a 90%-duplicate
    corpus converges on the 10% graph. The final member expansion is one
    equi-join on the group hash. min-label over supernodes equals min
    doc_id over the member-level component (every member ≥ its group rep),
    so the output is bit-identical to the recursive-CTE oracle. Standard
    Spark connected-components shape otherwise: O(component diameter)
    rounds, one shuffle keyed on the node per round."""
    members, rep_pairs = _ngram_rep_pairs(spark, sf)
    # localCheckpoint (not cache) for every piece of iteration state: it
    # truncates the lineage to materialized blocks, so the 20-iteration
    # loop plans against TINY trees. cache() here would register dozens of
    # deep plans with the CacheManager, whose per-query plan matching then
    # dominates wall-clock (measured: warm runs SLOWER than cold).
    gm = (
        members.groupBy("h")
        .agg(F.min("doc_id").alias("rid"), F.count(F.lit(1)).alias("csize"))
        .localCheckpoint()
    )
    ga = gm.select(F.col("h").alias("ha"))
    gb = gm.select(F.col("h").alias("hb"))
    rp = rep_pairs.join(ga, "ha").join(gb, "hb").select("ha", "hb").localCheckpoint()
    # node set: groups with a cross edge, plus multi-member groups (their
    # within-clique edges put every member in the oracle's node set)
    nodes = (
        rp.select(F.col("ha").alias("h"))
        .unionByName(rp.select(F.col("hb").alias("h")))
        .unionByName(gm.filter(F.col("csize") >= 2).select("h"))
        .distinct()
    )
    edges = rp.unionByName(
        rp.select(F.col("hb").alias("ha"), F.col("ha").alias("hb"))
    ).localCheckpoint()
    labels = nodes.join(gm, "h").select("h", F.col("rid").alias("comp")).localCheckpoint()
    for _ in range(20):
        neigh = labels.join(edges, labels.h == edges.ha).select(
            F.col("hb").alias("h"), F.col("comp")
        )
        new_labels = (
            labels.unionByName(neigh)
            .groupBy("h")
            .agg(F.min("comp").alias("comp"))
            .localCheckpoint()
        )
        changed = (
            new_labels.alias("x")
            .join(labels.alias("y"), "h")
            .filter(F.col("x.comp") != F.col("y.comp"))
            .count()
        )
        labels = new_labels
        if changed == 0:
            break
    return members.join(labels, "h").select(
        "doc_id", F.col("comp").cast("long").alias("canonical_id")
    )


# --- MHJACCARD metric: minhash-signature similarity search --------------------
_MH_SIG_COLS = ", ".join(
    f"list_min(list_transform(sh, g -> {seeded_hash_sql('g', i)})) AS s{i}" for i in range(_H)
)
_MH_EQ = " + ".join(f"(CASE WHEN q.s{i} = c.s{i} THEN 1 ELSE 0 END)" for i in range(_H))


@register(
    "vec_mhjaccard_topk",
    oracle=f"""
    WITH t AS (SELECT doc_id, {_TOKS} AS toks FROM documents),
    s AS (SELECT doc_id, list_distinct({SHINGLES_SQL.format(t='toks')}) AS sh FROM t),
    sig AS (SELECT doc_id, {_MH_SIG_COLS} FROM s),
    q AS (SELECT * FROM sig WHERE doc_id < 2),
    scored AS (
      SELECT q.doc_id AS qid, c.doc_id,
             round(1.0 - ({_MH_EQ}) * 1.0 / {_H}, 4) AS dist
      FROM sig c, q
    )
    SELECT qid, doc_id, dist, rank FROM (
      SELECT qid, doc_id, dist,
             CAST(row_number() OVER (PARTITION BY qid ORDER BY dist, doc_id) AS BIGINT) AS rank
      FROM scored
    ) WHERE rank <= 10
    """,
)
def vec_mhjaccard_topk(spark: SparkSession, sf: str) -> DataFrame:
    """MHJACCARD metric (metric_type.go:49-53; minhash index search,
    MinHashComputer.cpp): estimated Jaccard distance = 1 − matching signature
    slots / H. Signatures are the derived index table (cached); the query set
    is broadcast; scoring is a pure JVM column expression."""
    from pyspark.sql import Window as W

    t = _docs_tokens(spark, sf)
    s = t.select("doc_id", F.array_distinct(shingles(F.col("toks"))).alias("sh"))
    sig = s.select(
        "doc_id", *[c.alias(f"s{i}") for i, c in enumerate(minhash_signature(F.col("sh"), _H))]
    ).cache()
    q = sig.filter(F.col("doc_id") < 2).select(
        F.col("doc_id").alias("qid"), *[F.col(f"s{i}").alias(f"q{i}") for i in range(_H)]
    )
    eq = sum(
        (F.when(F.col(f"s{i}") == F.col(f"q{i}"), 1).otherwise(0) for i in range(_H)),
        start=F.lit(0),
    )
    scored = sig.crossJoin(F.broadcast(q)).select(
        "qid", "doc_id", F.round(1.0 - eq / _H, 4).alias("dist")
    )
    w = W.partitionBy("qid").orderBy(F.col("dist").asc(), F.col("doc_id").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= 10)
    )


@register(
    "txt_ngram_inner_match",
    oracle="""
    SELECT doc_id, n_chars FROM documents WHERE contains(text, 'hash join')
    """,
)
def txt_ngram_inner_match(spark: SparkSession, sf: str) -> DataFrame:
    """InnerMatch (%substring%) answered through the n-gram inverted index
    (NgramInvertedIndex.cpp analog, operators/ngram.py): posting-list
    intersection prunes to candidates, exact contains() verifies. The oracle
    is the direct scan — index path must be result-identical."""
    from milvus_spark.operators.ngram import build_ngram_index, inner_match

    d = load_table(spark, sf, "documents")
    idx = build_ngram_index(d, "text", "doc_id")
    return inner_match(d, idx, "text", "doc_id", "hash join").select(
        "doc_id", "n_chars"
    )


# --- BPE-ish subword token counting -------------------------------------------
_BPE_RE = " ?[a-z]+| ?[0-9]+| ?[^a-z0-9 ]+"


@register(
    "txt_bpe_token_count",
    oracle=f"""
    WITH t AS (
      SELECT doc_id,
             len(regexp_extract_all(lower(text), '{_BPE_RE}')) AS n_bpe,
             len({TOKENS_SQL.format(col="text")}) AS n_words
      FROM documents
    )
    SELECT doc_id, CAST(n_bpe AS BIGINT) AS n_bpe,
           CAST(n_words AS BIGINT) AS n_words,
           round(n_bpe * 1.0 / greatest(n_words, 1), 4) AS bpe_per_word
    FROM t
    """,
)
def txt_bpe_token_count(spark: SparkSession, sf: str) -> DataFrame:
    """BPE-ish token counting: a GPT-2-style pretokenizer regex (letter runs
    / digit runs / punctuation runs, each with optional leading space) —
    the budget estimator a training pipeline runs before packing. Pure
    regexp_extract_all, map-side codegen; the word-token ratio sanity-checks
    the tokenizer against the whitespace count."""
    d = load_table(spark, sf, "documents")
    n_bpe = F.size(F.regexp_extract_all(F.lower("text"), F.lit(_BPE_RE), 0))
    n_words = F.size(tokens(F.col("text")))
    return d.select(
        "doc_id",
        n_bpe.cast("long").alias("n_bpe"),
        n_words.cast("long").alias("n_words"),
        F.round(n_bpe / F.greatest(n_words, F.lit(1)), 4).alias("bpe_per_word"),
    )


# --- script identification: CJK-aware language-ID complement -------------------
@register(
    "txt_script_id",
    oracle="""
    WITH m AS (
      SELECT doc_id,
             text || CASE WHEN doc_id % 4 = 1 THEN ' 向量搜索引擎'
                          WHEN doc_id % 4 = 2 THEN ' ベクトル検索'
                          WHEN doc_id % 4 = 3 THEN ' 벡터검색엔진' ELSE '' END AS mixed
      FROM documents
    ),
    counts AS (
      SELECT doc_id,
             len(regexp_extract_all(mixed, '[一-鿿]')) AS han,
             len(regexp_extract_all(mixed, '[぀-ヿ]')) AS kana,
             len(regexp_extract_all(mixed, '[가-힯]')) AS hangul
      FROM m
    )
    SELECT doc_id,
           CASE WHEN han = 0 AND kana = 0 AND hangul = 0 THEN 'latin'
                WHEN kana >= han AND kana >= hangul THEN 'ja'
                WHEN hangul >= han THEN 'ko'
                ELSE 'zh' END AS script,
           CAST(han + kana + hangul AS BIGINT) AS n_cjk_chars
    FROM counts
    """,
)
def txt_script_id(spark: SparkSession, sf: str) -> DataFrame:
    """Script-based language identification for CJK corpora (the complement
    to txt_lang_id's latin n-gram heuristic; reference analyzers dispatch
    per-language the same way, internal/util/analyzer/ multi-analyzer).
    Deterministic CJK suffixes are appended per doc_id class so every script
    branch is exercised; pure regexp counting, map-side only."""
    d = load_table(spark, sf, "documents")
    suffix = (
        F.when(F.col("doc_id") % 4 == 1, F.lit(" 向量搜索引擎"))
        .when(F.col("doc_id") % 4 == 2, F.lit(" ベクトル検索"))
        .when(F.col("doc_id") % 4 == 3, F.lit(" 벡터검색엔진"))
        .otherwise(F.lit(""))
    )
    mixed = F.concat(F.col("text"), suffix)
    han = F.size(F.regexp_extract_all(mixed, F.lit("([一-鿿])"), 1))
    kana = F.size(F.regexp_extract_all(mixed, F.lit("([぀-ヿ])"), 1))
    hangul = F.size(F.regexp_extract_all(mixed, F.lit("([가-힯])"), 1))
    script = (
        F.when((han == 0) & (kana == 0) & (hangul == 0), F.lit("latin"))
        .when((kana >= han) & (kana >= hangul), F.lit("ja"))
        .when(hangul >= han, F.lit("ko"))
        .otherwise(F.lit("zh"))
    )
    return d.select(
        "doc_id", script.alias("script"), (han + kana + hangul).cast("long").alias("n_cjk_chars")
    )


# --- incremental dedup: new batch vs persisted corpus signatures ---------------
@register(
    "dedup_minhash_incremental",
    oracle=f"""
    WITH t AS (SELECT doc_id, {_TOKS} AS toks FROM documents),
    s AS (SELECT doc_id, list_distinct({SHINGLES_SQL.format(t='toks')}) AS sh FROM t),
    sig AS ({_minhash_sig_sql()}),
    bands AS (
      {" UNION ALL ".join(f"SELECT doc_id, {j} AS band, {_band_sql(j)} AS bh FROM sig" for j in range(_BANDS))}
    ),
    nb AS (SELECT * FROM bands WHERE doc_id % 17 = 0),
    cb AS (SELECT * FROM bands WHERE doc_id % 17 <> 0),
    cand AS (
      SELECT DISTINCT nb.doc_id AS a, cb.doc_id AS b
      FROM nb JOIN cb ON nb.band = cb.band AND nb.bh = cb.bh
    ),
    verified AS (
      SELECT c.a, c.b,
             round(len(list_intersect(sa.sh, sb.sh)) * 1.0 /
                   (len(sa.sh) + len(sb.sh) - len(list_intersect(sa.sh, sb.sh))), 4) AS jaccard
      FROM cand c JOIN s sa ON c.a = sa.doc_id JOIN s sb ON c.b = sb.doc_id
    )
    SELECT a, b, jaccard FROM verified WHERE jaccard >= 0.5
    """,
)
def dedup_minhash_incremental(spark: SparkSession, sf: str) -> DataFrame:
    """Incremental near-dup admission: an incoming batch (doc_id % 17 == 0
    plays the new arrivals) is checked against the EXISTING corpus via the
    persisted band index — the shape a continuously-ingesting 100 TB
    pipeline needs, where re-running all-pairs dedup per batch is absurd.
    Plan: corpus band signatures are the persisted index (computed once,
    cached); the new batch's bands are tiny and BROADCAST into the band
    join, so the corpus never shuffles; surviving candidates verify with
    exact shingle Jaccard ≥ 0.5. Cost per batch is O(batch × band-hit
    fan-out), independent of corpus size."""
    t = _docs_tokens(spark, sf)
    s = t.select("doc_id", F.array_distinct(shingles(F.col("toks"))).alias("sh"))
    corpus_s = s.filter(F.col("doc_id") % 17 != 0).cache()
    new_s = s.filter(F.col("doc_id") % 17 == 0).cache()

    def bandify(df: DataFrame) -> DataFrame:
        sig = df.select(
            "doc_id",
            *[c.alias(f"s{i}") for i, c in enumerate(minhash_signature(F.col("sh"), _H))],
        )
        band_arr = F.array(
            *[
                F.md5(F.concat_ws("_", F.col(f"s{2 * j}"), F.col(f"s{2 * j + 1}")))
                for j in range(_BANDS)
            ]
        )
        return sig.select("doc_id", F.posexplode(band_arr).alias("band", "bh"))

    cb = bandify(corpus_s)
    nb = bandify(new_s).select(
        F.col("doc_id").alias("a"), F.col("band").alias("band2"), F.col("bh").alias("bh2")
    )
    corpus_s.count()
    new_s.count()
    cand = (
        cb.join(F.broadcast(nb), (cb.band == nb.band2) & (cb.bh == nb.bh2))
        .select("a", F.col("doc_id").alias("b"))
        .distinct()
    )
    sa = new_s.select(F.col("doc_id").alias("a"), F.col("sh").alias("sha"))
    sb = corpus_s.select(F.col("doc_id").alias("b"), F.col("sh").alias("shb"))
    inter = F.size(F.array_intersect("sha", "shb"))
    verified = (
        sb.join(F.broadcast(cand), "b")
        .join(F.broadcast(sa), "a")
        .select(
            "a", "b",
            F.round(inter / (F.size("sha") + F.size("shb") - inter), 4).alias("jaccard"),
        )
    )
    return verified.filter(F.col("jaccard") >= 0.5).select("a", "b", "jaccard")


# --- canonical selection: keep the best document per near-dup cluster ---------
_QUALITY_SQL = (
    "round(0.4 * least(1.0, len(toks) / 100.0)"
    f" + 0.3 * (len(list_filter(toks, x -> list_contains({_STOP_SQL}, x))) * 1.0 / len(toks))"
    " + 0.3 * (len(list_distinct(toks)) * 1.0 / len(toks)), 4)"
)


@register(
    "dedup_keep_best",
    oracle=f"""
    WITH {_JACCARD_CTES},
    edges AS (
      SELECT a, b FROM jac WHERE jaccard >= 0.5
      UNION SELECT b, a FROM jac WHERE jaccard >= 0.5
    ),
    nodes AS (SELECT DISTINCT a AS n FROM edges),
    reach AS (
      WITH RECURSIVE r(src, dst) AS (
        SELECT n, n FROM nodes
        UNION
        SELECT r.src, e.b FROM r JOIN edges e ON r.dst = e.a
      )
      SELECT src, dst FROM r
    ),
    comp AS (SELECT src AS doc_id, min(dst) AS canonical_id FROM reach GROUP BY src),
    q AS (SELECT doc_id, {_QUALITY_SQL} AS quality FROM t),
    allc AS (
      SELECT q.doc_id, CAST(COALESCE(comp.canonical_id, q.doc_id) AS BIGINT) AS cluster_id,
             q.quality
      FROM q LEFT JOIN comp ON q.doc_id = comp.doc_id
    ),
    ranked AS (
      SELECT doc_id, cluster_id, quality,
             row_number() OVER (PARTITION BY cluster_id
                                ORDER BY quality DESC, doc_id ASC) AS rn
      FROM allc
    )
    SELECT doc_id, cluster_id, quality FROM ranked WHERE rn = 1
    """,
)
def dedup_keep_best(spark: SparkSession, sf: str) -> DataFrame:
    """Canonical selection: within every near-dup cluster keep the single
    highest-quality document (ties to the lowest doc_id); singletons keep
    themselves. The train-data shape: dedup should retain the BEST copy,
    not an arbitrary one. The per-cluster argmax is a window partitioned
    by cluster id — cluster sizes bound the partitions, so no global sort
    and no skew beyond the largest dup cluster (whose pair set is itself
    the required output, so the prefix-filtered generation is output-bound)."""
    from pyspark.sql import Window as W

    qual = txt_quality(spark, sf).select("doc_id", "quality")
    comp = dedup_components(spark, sf)
    allc = qual.join(F.broadcast(comp), "doc_id", "left").select(
        "doc_id",
        F.coalesce("canonical_id", "doc_id").cast("long").alias("cluster_id"),
        "quality",
    )
    w = W.partitionBy("cluster_id").orderBy(F.col("quality").desc(), F.col("doc_id").asc())
    return (
        allc.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("doc_id", "cluster_id", "quality")
    )


# --- split decontamination: near-dups crossing a train/val split --------------
@register(
    "dedup_split_decontaminate",
    oracle=f"""
    WITH {_JACCARD_CTES},
    assign AS (
      SELECT doc_id,
             CASE WHEN (('0x' || substr(md5(doc_id::VARCHAR), 1, 8))::BIGINT % 10) < 8
                  THEN 'train' ELSE 'val' END AS split
      FROM t
    )
    SELECT j.a, j.b, j.jaccard, sa.split AS split_a, sb.split AS split_b
    FROM jac j
    JOIN assign sa ON j.a = sa.doc_id
    JOIN assign sb ON j.b = sb.doc_id
    WHERE j.jaccard >= 0.5 AND sa.split <> sb.split
    """,
)
def dedup_split_decontaminate(spark: SparkSession, sf: str) -> DataFrame:
    """Train/val split decontamination: deterministic 80/20 hash split,
    then every near-dup pair (jaccard ≥ 0.5) that CROSSES the split — the
    leakage a benchmark-contamination audit must surface before training.
    The pair set rides the prefix-filtered inverted index
    (dedup_ngram_jaccard — lossless, so cross-split leaks in arbitrarily
    large dup clusters are surfaced); the split assignment is a pure hash
    column, so the audit adds only two broadcast joins on the pair list."""
    pairs = dedup_ngram_jaccard(spark, sf)

    # the split is a PURE HASH of doc_id, so it evaluates directly on the
    # pair columns — no join at all (r7: the registry hint audit flagged
    # the previous broadcast of the corpus-sized (doc_id, split) frame;
    # broadcasting an sf-proportional side OOMs at warehouse scale)
    def split_of(c: str) -> Column:
        return F.when(
            token_hash(F.col(c).cast("string")) % 10 < 8, "train"
        ).otherwise("val")

    return (
        pairs.withColumn("split_a", split_of("a"))
        .withColumn("split_b", split_of("b"))
        .filter(F.col("split_a") != F.col("split_b"))
        .select("a", "b", "jaccard", "split_a", "split_b")
    )


# --- duplicated-span fraction: the exact-substring dedup metric ---------------
@register(
    "dedup_span_fraction",
    oracle=f"""
    WITH t AS (SELECT doc_id, {_TOKS} AS toks FROM documents),
    s AS (SELECT doc_id, {SHINGLES_SQL.format(t='toks')} AS sh FROM t
          WHERE len(toks) >= 3),
    e AS (SELECT doc_id, unnest(sh) AS g FROM s),
    gdf AS (SELECT g, count(DISTINCT doc_id) AS df FROM e GROUP BY g),
    per AS (
      SELECT e.doc_id,
             count(*) AS n_spans,
             sum(CASE WHEN gdf.df >= 2 THEN 1 ELSE 0 END) AS dup_spans
      FROM e JOIN gdf USING (g) GROUP BY e.doc_id
    )
    SELECT doc_id, CAST(n_spans AS BIGINT) AS n_spans,
           CAST(dup_spans AS BIGINT) AS dup_spans,
           round(dup_spans * 1.0 / n_spans, 4) AS dup_frac
    FROM per
    """,
)
def dedup_span_fraction(spark: SparkSession, sf: str) -> DataFrame:
    """Per-document duplicated-span fraction: the share of a document's
    token 3-gram spans that also occur in at least one OTHER document —
    the exact-substring duplication signal train-data pipelines filter on
    (suffix-array span dedup approximated at fixed span length; a doc with
    dup_frac ≈ 1 is boilerplate/copy even when no single pair passes a
    Jaccard gate). Plan shape: explode → groupBy span key (distinct-doc
    count, map-side partial agg) → join back on the SAME key (no extra
    shuffle of the big side) → per-doc agg. Spans are counted with
    multiplicity per doc (a doc repeating its own 3-gram counts each
    occurrence), df counts DISTINCT docs — both sides of the oracle agree."""
    # r11 optimization audit: this double-subtree shape (the corpus
    # tokenizes+explodes once under the df aggregate and once under the
    # join probe) was deliberately KEPT. A restructure that pre-collapses
    # (g, doc_id) multiplicity so both branches could share one exchange
    # does NOT get exchange reuse in practice — the column pruner rewrites
    # the df branch's count(c) over the non-nullable count to count(1) and
    # drops c from its partial aggregate, so the two exchanges canonicalize
    # differently and the probe side just gains an extra shuffle. The
    # single-pass window alternative (count over Window.partitionBy(g))
    # loses partial aggregation: a hot gram's pairs all land in ONE window
    # task, and AQE skew-splitting applies to joins only — a 100 TB
    # regression. Here the df aggregate is partial/final (skew-safe) and
    # the probe side feeds the join unshuffled (broadcast at small gdf;
    # SMJ + AQE skew split when gdf outgrows the threshold).
    t = _docs_tokens(spark, sf).filter(F.size("toks") >= 3)
    e = t.select("doc_id", F.explode(shingles(F.col("toks"))).alias("g"))
    gdf = e.groupBy("g").agg(F.count_distinct("doc_id").alias("df"))
    per = (
        e.join(gdf, "g")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_spans"),
            F.sum(F.when(F.col("df") >= 2, 1).otherwise(0)).alias("dup_spans"),
        )
    )
    return per.select(
        "doc_id", "n_spans", "dup_spans",
        F.round(F.col("dup_spans") / F.col("n_spans"), 4).alias("dup_frac"),
    )


# --- semantic dedup: kmeans-cluster embeddings, prune within-cluster ----------
_SEM_K = 8
_SEM_THETA = 0.35


@register(
    "dedup_semantic",
    oracle=f"""
    WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
    c AS (SELECT vec_id AS cid, v AS cv FROM e WHERE vec_id < {_SEM_K}),
    scored AS (
      SELECT e.vec_id, c.cid,
             list_sum(list_transform(range(1, len(e.v) + 1),
                                     i -> (e.v[i] - c.cv[i]) * (e.v[i] - c.cv[i]))) AS d
      FROM e, c
    ),
    best AS (
      SELECT vec_id, cid FROM (
        SELECT vec_id, cid,
               row_number() OVER (PARTITION BY vec_id ORDER BY d, cid) AS rn
        FROM scored
      ) WHERE rn = 1
    ),
    m AS (SELECT b.vec_id, b.cid, e.v FROM best b JOIN e USING (vec_id)),
    p AS (
      SELECT a.cid AS cid, a.vec_id AS keep_id, b.vec_id AS drop_id,
             list_cosine_similarity(a.v, b.v) AS cos
      FROM m a JOIN m b ON a.cid = b.cid AND a.vec_id < b.vec_id
      WHERE list_cosine_similarity(a.v, b.v) >= {_SEM_THETA}
    )
    SELECT drop_id, keep_id, cid, round(cos, 4) + 0 AS cos FROM (
      SELECT cid, keep_id, drop_id, cos,
             row_number() OVER (PARTITION BY drop_id ORDER BY cos DESC, keep_id) AS rn
      FROM p
    ) WHERE rn = 1
    """,
)
def dedup_semantic(spark: SparkSession, sf: str) -> DataFrame:
    """Semantic (embedding-space) dedup, SemDeDup-shaped (Abbas et al. 2023,
    arXiv:2303.09540): cluster the embeddings with one deterministic k-means
    assignment (centroids = the first K vectors, the same coarse quantizer
    kernel as vec_kmeans_step / operators/ivf.py), then within each cluster
    drop every vector that has an earlier (lower-id) cluster-mate with
    cosine >= theta, reporting the strongest such keeper.

    Scale shape: the quadratic pair work is confined to a cluster — exactly
    why SemDeDup clusters first. Assignment is a broadcast nested-loop over
    K centroids with pure-JVM zip_with/aggregate distances (no shuffle
    before the per-vector argmin); the pair stage is a shuffle EQUI-join on
    cid (never a global cross join), so each cluster's pairs materialize
    only on that cluster's partition. At 100 TB, K scales with corpus size
    (SemDeDup uses n/K ~ 10^4) so per-cluster work stays bounded; here K=8
    keeps the all-pairs DuckDB oracle tractable. The strongest-keeper pick
    is a per-drop_id window (bounded by cluster size). Norms are
    precomputed once per side; cosine stays in whole-stage codegen."""
    from milvus_spark.operators.semantic import semantic_dedup

    e = load_table(spark, sf, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )
    return semantic_dedup(e, _SEM_K, _SEM_THETA)


# --- character-entropy quality signal -----------------------------------------
@register(
    "txt_char_entropy",
    oracle="""
    WITH ch AS (
      SELECT doc_id, c FROM (
        SELECT doc_id, unnest(string_split(text, '')) AS c FROM documents
      ) WHERE c <> ''
    ),
    freq AS (SELECT doc_id, c, CAST(count(*) AS DOUBLE) AS n FROM ch GROUP BY 1, 2),
    tot AS (SELECT doc_id, sum(n) AS tot FROM freq GROUP BY 1)
    SELECT f.doc_id,
           round(-sum((n / tot) * log2(n / tot)), 4) + 0 AS entropy
    FROM freq f JOIN tot USING (doc_id)
    GROUP BY 1
    """,
)
def txt_char_entropy(spark: SparkSession, sf: str) -> DataFrame:
    """Per-document character entropy — the classic gibberish/boilerplate
    quality signal a pretraining filter thresholds on (low entropy =
    repeated filler, high = encoded noise). Pure JVM: explode to chars,
    two map-side-combined aggregates on (doc_id[,char]) — the same shape
    as token counting, linear and skew-bounded by document length."""
    d = load_table(spark, sf, "documents")
    ch = d.select(
        "doc_id", F.explode(F.split("text", "")).alias("c")
    ).filter(F.col("c") != "")
    freq = ch.groupBy("doc_id", "c").agg(F.count(F.lit(1)).cast("double").alias("n"))
    tot = freq.groupBy("doc_id").agg(F.sum("n").alias("tot"))
    p = F.col("n") / F.col("tot")
    return (
        freq.join(tot, "doc_id")
        .groupBy("doc_id")
        .agg((F.round(-F.sum(p * F.log2(p)), 4) + F.lit(0.0)).alias("entropy"))
    )


# --- tf-idf keyword extraction ------------------------------------------------
@register(
    "txt_keyword_extract",
    oracle=f"""
    WITH t AS (SELECT doc_id, {_TOKS} AS toks FROM documents),
    n_docs AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM t),
    tf AS (
      SELECT doc_id, tok, CAST(count(*) AS DOUBLE) AS tf
      FROM (SELECT doc_id, unnest(toks) AS tok FROM t)
      GROUP BY 1, 2
    ),
    df AS (SELECT tok, CAST(count(*) AS DOUBLE) AS df FROM tf GROUP BY tok),
    scored AS (
      SELECT tf.doc_id, tf.tok,
             round(tf.tf * ln((SELECT n FROM n_docs) / df.df), 4) + 0 AS tfidf
      FROM tf JOIN df USING (tok)
    )
    SELECT doc_id, tok, tfidf, kw_rank FROM (
      SELECT doc_id, tok, tfidf,
             CAST(row_number() OVER (
               PARTITION BY doc_id ORDER BY tfidf DESC, tok
             ) AS BIGINT) AS kw_rank
      FROM scored
    ) WHERE kw_rank <= 3
    """,
)
def txt_keyword_extract(spark: SparkSession, sf: str) -> DataFrame:
    """TF-IDF keyword extraction: top-3 terms per document (raw tf ×
    ln(N/df), ties to lexicographic token). The classic document-labeling
    signal a curation pipeline attaches for topic routing.

    Scale shape: tf is a (doc,term)-keyed map-side-combined aggregate; df
    aggregates the tf table again on the term key; the df table joins back
    on term (broadcast-sized after stopword-free tokenization at any
    corpus — term vocabularies grow ~log of corpus); the final window is
    per-document, bounded by doc vocabulary."""
    t = _docs_tokens(spark, sf)
    n_docs = t.count()
    tf = (
        t.select("doc_id", F.explode("toks").alias("tok"))
        .groupBy("doc_id", "tok")
        .agg(F.count(F.lit(1)).cast("double").alias("tf"))
    )
    df = tf.groupBy("tok").agg(F.count(F.lit(1)).cast("double").alias("df"))
    scored = tf.join(df, "tok").select(
        "doc_id", "tok",
        (F.round(F.col("tf") * F.log(F.lit(float(n_docs)) / F.col("df")), 4) + F.lit(0.0)).alias("tfidf"),
    )
    from pyspark.sql import Window as W

    w = W.partitionBy("doc_id").orderBy(F.col("tfidf").desc(), F.col("tok").asc())
    return (
        scored.withColumn("kw_rank", F.row_number().over(w).cast("long"))
        .filter(F.col("kw_rank") <= 3)
        .select("doc_id", "tok", "tfidf", "kw_rank")
    )


# --- PMI collocations: phrase-mining signal -----------------------------------
@register(
    "txt_bigram_pmi",
    oracle=f"""
    WITH t AS (SELECT doc_id, {_TOKS} AS toks FROM documents),
    big AS (
      SELECT doc_id,
             unnest(list_transform(range(1, len(toks)),
                    i -> [toks[CAST(i AS INT)], toks[CAST(i AS INT) + 1]])) AS bg
      FROM t WHERE len(toks) >= 2
    ),
    bc AS (SELECT bg[1] AS w1, bg[2] AS w2, CAST(count(*) AS DOUBLE) AS n_ab
           FROM big GROUP BY 1, 2),
    uni AS (SELECT unnest(toks) AS w FROM t),
    uc AS (SELECT w, CAST(count(*) AS DOUBLE) AS n FROM uni GROUP BY w),
    tot AS (SELECT sum(n) AS n_tok FROM uc),
    tot2 AS (SELECT sum(n_ab) AS n_big FROM bc),
    pmi AS (
      SELECT bc.w1, bc.w2, bc.n_ab,
             round(log2((bc.n_ab / (SELECT n_big FROM tot2))
                        / ((u1.n / (SELECT n_tok FROM tot))
                           * (u2.n / (SELECT n_tok FROM tot)))), 4) + 0 AS pmi
      FROM bc JOIN uc u1 ON bc.w1 = u1.w JOIN uc u2 ON bc.w2 = u2.w
      WHERE bc.n_ab >= 25
    )
    SELECT w1, w2, CAST(n_ab AS BIGINT) AS n_ab, pmi, pmi_rank FROM (
      SELECT w1, w2, n_ab, pmi,
             CAST(row_number() OVER (ORDER BY pmi DESC, w1, w2) AS BIGINT) AS pmi_rank
      FROM pmi
    ) WHERE pmi_rank <= 20
    """,
)
def txt_bigram_pmi(spark: SparkSession, sf: str) -> DataFrame:
    """Pointwise-mutual-information collocations: the top-20 bigrams whose
    co-occurrence beats chance (min support 25) — the phrase-mining signal
    a tokenizer-training pipeline uses to promote multi-word units.

    Scale shape: bigram and unigram counts are map-side-combined keyed
    aggregates; the two unigram joins hit a vocabulary-sized table
    (broadcastable at any corpus — vocab grows ~log n); the final top-20
    is a bounded TakeOrdered on the ROUNDED pmi (tie → lexicographic)."""
    t = _docs_tokens(spark, sf).filter(F.size("toks") >= 2)
    idx = F.sequence(F.lit(1), F.size("toks") - 1)
    bg = t.select(
        F.explode(
            F.transform(idx, lambda i: F.struct(
                F.element_at("toks", i).alias("w1"),
                F.element_at("toks", i + 1).alias("w2"),
            ))
        ).alias("b")
    ).select("b.w1", "b.w2")
    bc = bg.groupBy("w1", "w2").agg(F.count(F.lit(1)).cast("double").alias("n_ab"))
    uni = _docs_tokens(spark, sf).select(F.explode("toks").alias("w"))
    uc = uni.groupBy("w").agg(F.count(F.lit(1)).cast("double").alias("n"))
    n_tok = float(uc.agg(F.sum("n")).first()[0])
    n_big = float(bc.agg(F.sum("n_ab")).first()[0])
    u1 = uc.select(F.col("w").alias("w1"), F.col("n").alias("n1"))
    u2 = uc.select(F.col("w").alias("w2"), F.col("n").alias("n2"))
    pmi = (
        bc.filter(F.col("n_ab") >= 25)
        .join(F.broadcast(u1), "w1")
        .join(F.broadcast(u2), "w2")
        .select(
            "w1", "w2", "n_ab",
            (F.round(
                F.log2((F.col("n_ab") / F.lit(n_big))
                       / ((F.col("n1") / F.lit(n_tok)) * (F.col("n2") / F.lit(n_tok)))),
                4,
            ) + F.lit(0.0)).alias("pmi"),
        )
    )
    from pyspark.sql import Window as W

    top = pmi.orderBy(F.col("pmi").desc(), "w1", "w2").limit(20)
    w = W.partitionBy(F.lit(0)).orderBy(F.col("pmi").desc(), "w1", "w2")
    return top.withColumn("pmi_rank", F.row_number().over(w).cast("long")).select(
        "w1", "w2", F.col("n_ab").cast("long").alias("n_ab"), "pmi", "pmi_rank"
    )


# --- incremental semantic dedup: arriving batch vs existing corpus ------------
@register(
    "dedup_semantic_incremental",
    oracle=f"""
    WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
    c AS (SELECT vec_id AS cid, v AS cv FROM e WHERE vec_id < {_SEM_K}),
    scored AS (
      SELECT e.vec_id, c.cid,
             list_sum(list_transform(range(1, len(e.v) + 1),
                                     i -> (e.v[i] - c.cv[i]) * (e.v[i] - c.cv[i]))) AS d
      FROM e, c
    ),
    best AS (
      SELECT vec_id, cid FROM (
        SELECT vec_id, cid,
               row_number() OVER (PARTITION BY vec_id ORDER BY d, cid) AS rn
        FROM scored
      ) WHERE rn = 1
    ),
    m AS (SELECT b.vec_id, b.cid, e.v FROM best b JOIN e USING (vec_id)),
    batch AS (SELECT * FROM m WHERE vec_id % 5 = 0),
    corpus AS (SELECT * FROM m WHERE vec_id % 5 <> 0),
    hits AS (
      SELECT b.vec_id AS new_id, c.vec_id AS dup_of, b.cid,
             list_cosine_similarity(b.v, c.v) AS cos
      FROM batch b JOIN corpus c ON b.cid = c.cid
      WHERE list_cosine_similarity(b.v, c.v) >= {_SEM_THETA}
    )
    SELECT new_id, dup_of, cid, round(cos, 4) + 0 AS cos FROM (
      SELECT new_id, dup_of, cid, cos,
             row_number() OVER (PARTITION BY new_id ORDER BY cos DESC, dup_of) AS rn
      FROM hits
    ) WHERE rn = 1
    """,
)
def dedup_semantic_incremental(spark: SparkSession, sf: str) -> DataFrame:
    """Incremental SEMANTIC admission: an arriving embedding batch checks
    only against CORPUS members of its own cluster (the continuously-
    ingesting shape of dedup_semantic, sibling of
    dedup_minhash_incremental) — each new vector reports its strongest
    existing duplicate at cosine >= theta, or admits silently.

    Scale shape: both sides run the same broadcast-K assignment; the
    batch-vs-corpus compare is a cid EQUI-join, so a new vector only ever
    meets its own cluster's members — per-arrival work is bounded by
    cluster size (K∝n), never corpus size."""
    from milvus_spark.operators.semantic import assign_clusters

    e = load_table(spark, sf, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )
    m = assign_clusters(e, _SEM_K)
    norm = F.sqrt(
        F.aggregate(F.zip_with("v", "v", lambda a, b: a * b), F.lit(0.0), lambda a, x: a + x)
    )
    side = m.withColumn("nn", norm)
    batch = side.filter(F.col("vec_id") % 5 == 0).select(
        "cid", F.col("vec_id").alias("new_id"), F.col("v").alias("vb"), F.col("nn").alias("nb")
    )
    corpus = side.filter(F.col("vec_id") % 5 != 0).select(
        "cid", F.col("vec_id").alias("dup_of"), F.col("v").alias("vc"), F.col("nn").alias("nc")
    )
    dot = F.aggregate(F.zip_with("vb", "vc", lambda a, b: a * b), F.lit(0.0), lambda a, x: a + x)
    hits = (
        batch.join(corpus, "cid")
        .select("cid", "new_id", "dup_of", (dot / (F.col("nb") * F.col("nc"))).alias("cos"))
        .filter(F.col("cos") >= _SEM_THETA)
    )
    from pyspark.sql import Window as W

    w = W.partitionBy("new_id").orderBy(F.col("cos").desc(), F.col("dup_of").asc())
    return (
        hits.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("new_id", "dup_of", "cid", (F.round("cos", 4) + F.lit(0.0)).alias("cos"))
    )


# --- minhash estimation calibration: estimated vs true jaccard ----------------
@register(
    "dedup_minhash_calibration",
    oracle=f"""
    WITH {_JACCARD_CTES},
    sigs AS (
      SELECT doc_id,
             list_transform(range(0, {_H}), i ->
               list_min(list_transform(sh, g ->
                 {HASH_SQL.format(s="CAST(i AS VARCHAR) || ':' || g")}))) AS sig
      FROM s WHERE len(sh) > 0
    ),
    est AS (
      SELECT j.a, j.b, j.jaccard,
             round(len(list_filter(range(1, {_H} + 1),
                       i -> sa.sig[CAST(i AS INT)] = sb.sig[CAST(i AS INT)]))
                   * 1.0 / {_H}, 4) + 0 AS est_jaccard
      FROM jac j JOIN sigs sa ON j.a = sa.doc_id JOIN sigs sb ON j.b = sb.doc_id
      WHERE j.jaccard >= 0.5
    )
    SELECT a, b, jaccard, est_jaccard,
           round(abs(jaccard - est_jaccard), 4) + 0 AS abs_err
    FROM est
    """,
)
def dedup_minhash_calibration(spark: SparkSession, sf: str) -> DataFrame:
    """Estimator calibration: for every TRUE near-dup pair (jaccard >= 0.5),
    the {_H}-component MinHash estimate next to the exact Jaccard and its
    absolute error — the observability readout that tells an operator
    whether the signature width is adequate before trusting banded dedup
    at scale. True pairs come from the same lossless prefix-filtered path
    the dedup queries use; signatures are per-row map work."""
    members, rep_pairs = _ngram_rep_pairs(spark, sf)
    pairs = _expand_group_pairs(members, rep_pairs, [F.col("jaccard")]).unionByName(
        _within_group_pairs(members).withColumn("jaccard", F.lit(1.0))
    )
    t = _docs_tokens(spark, sf)
    s = t.select("doc_id", F.array_distinct(shingles(F.col("toks"))).alias("sh")).filter(
        F.size("sh") > 0
    )
    sig = s.select(
        "doc_id",
        F.array(*[c for c in minhash_signature(F.col("sh"), _H)]).alias("sig"),
    )
    sa = sig.select(F.col("doc_id").alias("a"), F.col("sig").alias("siga"))
    sb = sig.select(F.col("doc_id").alias("b"), F.col("sig").alias("sigb"))
    est = (
        F.size(F.filter(F.zip_with("siga", "sigb", lambda x, y: x == y), lambda m: m))
        / F.lit(float(_H))
    )
    out = (
        pairs.join(sa, "a")
        .join(sb, "b")
        .select(
            "a", "b",
            (F.round("jaccard", 4) + F.lit(0.0)).alias("jaccard"),
            (F.round(est, 4) + F.lit(0.0)).alias("est_jaccard"),
        )
    )
    return out.withColumn(
        "abs_err",
        F.round(F.abs(F.col("jaccard") - F.col("est_jaccard")), 4) + F.lit(0.0),
    )


# --- dedup observability: near-dup rate per source ----------------------------
@register(
    "dedup_rate_by_source",
    oracle=f"""
    WITH {_JACCARD_CTES},
    dup_ids AS (
      SELECT DISTINCT d FROM (
        SELECT a AS d FROM jac WHERE jaccard >= 0.5
        UNION ALL SELECT b FROM jac WHERE jaccard >= 0.5
      )
    )
    SELECT doc.source,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(count(*) FILTER (doc.doc_id IN (SELECT d FROM dup_ids)) AS BIGINT) AS n_in_dup,
           round(count(*) FILTER (doc.doc_id IN (SELECT d FROM dup_ids)) * 1.0
                 / count(*), 4) + 0 AS dup_rate
    FROM documents doc
    GROUP BY doc.source
    """,
)
def dedup_rate_by_source(spark: SparkSession, sf: str) -> DataFrame:
    """Dedup observability: which SOURCES are dirtiest — per-source count
    of documents involved in any near-dup pair (jaccard >= 0.5) and the
    rate. Pairs come from the same lossless collapsed prefix-filtered path
    as dedup_ngram_jaccard; the rollup is a semi-join of the corpus against
    the (small) dup-id set + one keyed aggregate — the report every
    curation run publishes to pick which feeds to renegotiate."""
    members, rep_pairs = _ngram_rep_pairs(spark, sf)
    pairs = _expand_group_pairs(members, rep_pairs, [F.col("jaccard")]).unionByName(
        _within_group_pairs(members).withColumn("jaccard", F.lit(1.0))
    ).filter(F.col("jaccard") >= NGRAM_JACCARD_THETA)
    dup_ids = (
        pairs.select(F.col("a").alias("d"))
        .unionByName(pairs.select(F.col("b").alias("d")))
        .distinct()
    )
    d = load_table(spark, sf, "documents").select("doc_id", "source")
    flagged = d.join(
        F.broadcast(dup_ids), d.doc_id == dup_ids.d, "left"
    ).select("source", F.col("d").isNotNull().cast("long").alias("is_dup"))
    return flagged.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("is_dup").alias("n_in_dup"),
        (F.round(F.sum("is_dup") / F.count(F.lit(1)), 4) + F.lit(0.0)).alias("dup_rate"),
    )
