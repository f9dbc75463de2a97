"""Training-data curation suite over the TPC-H-ish tables.

Beyond the reference's own operator surface (SURVEY.md §2), these are the
row-level curation passes a 100 TB pre-training pipeline runs between ingest
and dedup: chunking documents into model-window pieces, masking PII-shaped
fields, deterministic stratified downsampling, and repetition-based quality
filtering (the Gopher/C4-style rules). Every query is pure built-in-function
DataFrame code with a bit-identical DuckDB oracle.

Scale notes (100 TB posture):
  - Chunking and redaction are per-row map-side transforms inside
    whole-stage codegen — no shuffle at all; chunk explode multiplies rows
    by ~len/stride, so the output is written partitioned by source shard.
  - Stratified sampling uses the portable seeded-md5 hash on the pk — a
    deterministic Bernoulli per stratum. No shuffle, no RNG state, and the
    same rows are kept on any cluster size or retry (idempotent re-runs).
  - The repetition filter is a per-row aggregate over the token array —
    map-side only.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from milvus_spark.operators.text import TOKENS_SQL, seeded_hash, seeded_hash_sql, tokens
from milvus_spark.registry import register
from milvus_spark.session import load_table

_WIN, _STRIDE = 32, 24


@register(
    "cur_chunk_sliding",
    oracle=f"""
    WITH t AS (
      SELECT doc_id, {TOKENS_SQL.format(col="text")} AS toks FROM documents
    ),
    starts AS (
      SELECT doc_id, toks,
             unnest(generate_series(0, greatest(len(toks) - 1, 0), {_STRIDE})) AS start
      FROM t
    ),
    chunks AS (
      SELECT doc_id, CAST(start AS BIGINT) AS chunk_start,
             list_slice(toks, start + 1, start + {_WIN}) AS chunk
      FROM starts
    )
    SELECT doc_id, chunk_start,
           array_to_string(chunk, ' ') AS chunk_text,
           CAST(len(chunk) AS BIGINT) AS n_tokens
    FROM chunks WHERE len(chunk) > 0
    """,
)
def cur_chunk_sliding(spark: SparkSession, sf: str) -> DataFrame:
    """Sliding-window chunking: 32-token windows at stride 24 (8-token
    overlap), the standard shape for packing documents into model context
    windows. Pure map-side: sequence + transform + explode, no shuffle."""
    d = load_table(spark, sf, "documents")
    t = d.select("doc_id", tokens(F.col("text")).alias("toks"))
    starts = t.select(
        "doc_id",
        "toks",
        F.explode(
            F.sequence(F.lit(0), F.greatest(F.size("toks") - 1, F.lit(0)), F.lit(_STRIDE))
        ).alias("start"),
    )
    chunks = starts.select(
        "doc_id",
        F.col("start").cast("long").alias("chunk_start"),
        F.slice("toks", F.col("start") + 1, _WIN).alias("chunk"),
    )
    return chunks.filter(F.size("chunk") > 0).select(
        "doc_id",
        "chunk_start",
        F.array_join("chunk", " ").alias("chunk_text"),
        F.size("chunk").cast("long").alias("n_tokens"),
    )


@register(
    "cur_redact_pii",
    oracle="""
    SELECT c_custkey,
           regexp_replace(c_name, '[0-9]', '#', 'g') AS name_masked,
           CAST(floor(c_acctbal / 1000) * 1000 AS DOUBLE) AS acctbal_bucket,
           c_mktsegment
    FROM customer WHERE c_custkey <= 500
    """,
)
def cur_redact_pii(spark: SparkSession, sf: str) -> DataFrame:
    """PII-shaped masking before a corpus leaves the trust boundary: digit
    runs in identifying strings masked, and the numeric quasi-identifier
    generalized to a 1000-wide bucket (k-anonymity-style coarsening). Per-row
    regex/arithmetic — map-side, codegen'd, no Python."""
    c = load_table(spark, sf, "customer")
    return c.filter(F.col("c_custkey") <= 500).select(
        "c_custkey",
        F.regexp_replace("c_name", "[0-9]", "#").alias("name_masked"),
        (F.floor(F.col("c_acctbal") / 1000) * 1000).cast("double").alias("acctbal_bucket"),
        "c_mktsegment",
    )


@register(
    "cur_stratified_sample",
    oracle=f"""
    SELECT doc_id, lang
    FROM documents
    WHERE {seeded_hash_sql("CAST(doc_id AS VARCHAR)", 42)} % 100
          < (CASE WHEN lang = 'en' THEN 50 ELSE 10 END)
    """,
)
def cur_stratified_sample(spark: SparkSession, sf: str) -> DataFrame:
    """Deterministic stratified downsample: per-language keep rates (en 50%,
    others 10%) decided by the portable seeded-md5 hash of the pk — the same
    rows survive on any partitioning, cluster size, or retry, unlike
    rand()-based sampling. This is how a 100 TB corpus is rebalanced without
    a shuffle or a stateful sampler."""
    d = load_table(spark, sf, "documents")
    bucket = F.pmod(seeded_hash(F.col("doc_id").cast("string"), 42), F.lit(100))
    rate = F.when(F.col("lang") == "en", F.lit(50)).otherwise(F.lit(10))
    return d.filter(bucket < rate).select("doc_id", "lang")


@register(
    "cur_repetition_filter",
    oracle=f"""
    WITH t AS (
      SELECT doc_id, {TOKENS_SQL.format(col="text")} AS toks FROM documents
    )
    SELECT doc_id,
           round(1.0 - len(list_distinct(toks)) / len(toks), 4) AS dup_ratio
    FROM t
    WHERE len(toks) >= 20
      AND round(1.0 - len(list_distinct(toks)) / len(toks), 4) > 0.5
    """,
)
def cur_repetition_filter(spark: SparkSession, sf: str) -> DataFrame:
    """Gopher-style repetition quality rule: flag documents whose
    duplicate-token ratio (1 − distinct/total) exceeds 0.5 — boilerplate and
    looped generations. Per-row array aggregate, map-side only."""
    d = load_table(spark, sf, "documents")
    t = d.select("doc_id", tokens(F.col("text")).alias("toks"))
    ratio = F.round(
        F.lit(1.0) - F.size(F.array_distinct("toks")) / F.size("toks"), 4
    )
    return (
        t.filter(F.size("toks") >= 20)
        .select("doc_id", ratio.alias("dup_ratio"))
        .filter(F.col("dup_ratio") > 0.5)
    )


@register(
    "cur_pipeline_e2e",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, source, {TOKENS_SQL.format(col="text")} AS toks
      FROM documents
    ),
    quality AS (
      SELECT doc_id, source, toks FROM toks
      WHERE len(toks) >= 20
        AND 1.0 - len(list_distinct(toks)) / len(toks) <= 0.5
    ),
    chunks AS (
      SELECT doc_id, source, CAST(start AS BIGINT) AS chunk_start,
             array_to_string(list_slice(toks, start + 1, start + {_WIN}), ' ') AS chunk_text,
             len(list_slice(toks, start + 1, start + {_WIN})) AS n_tokens
      FROM (
        SELECT doc_id, source, toks,
               unnest(generate_series(0, greatest(len(toks) - 1, 0), {_STRIDE})) AS start
        FROM quality
      )
      WHERE len(list_slice(toks, start + 1, start + {_WIN})) > 0
    ),
    deduped AS (
      SELECT chunk_text, min(doc_id) AS keeper, count(*) AS n_copies,
             min(source) AS source, min(n_tokens) AS n_tokens
      FROM chunks GROUP BY chunk_text
    )
    SELECT source,
           CAST(count(*) AS BIGINT) AS n_chunks,
           CAST(sum(n_tokens) AS BIGINT) AS total_tokens,
           CAST(sum(n_copies - 1) AS BIGINT) AS dropped_dups
    FROM deduped GROUP BY source
    """,
)
def cur_pipeline_e2e(spark: SparkSession, sf: str) -> DataFrame:
    """End-to-end curation pipeline in ONE declarative plan: repetition
    quality gate → sliding-window chunking → exact chunk dedup (keep lowest
    doc_id) → per-source corpus stats. This is the shape a 100 TB
    pre-training pass takes: the gate and chunker are map-side (codegen, no
    shuffle), the dedup is one hash shuffle on chunk_text (map-side partial
    agg first), and the stats agg reuses the same shuffled partitioning.
    Catalyst pipelines all four stages — nothing materializes between them."""
    d = load_table(spark, sf, "documents")
    t = d.select("doc_id", "source", tokens(F.col("text")).alias("toks"))
    dup_ratio = F.lit(1.0) - F.size(F.array_distinct("toks")) / F.size("toks")
    quality = t.filter((F.size("toks") >= 20) & (dup_ratio <= 0.5))
    starts = quality.select(
        "doc_id", "source", "toks",
        F.explode(
            F.sequence(F.lit(0), F.greatest(F.size("toks") - 1, F.lit(0)), F.lit(_STRIDE))
        ).alias("start"),
    )
    chunks = starts.select(
        "doc_id", "source",
        F.col("start").cast("long").alias("chunk_start"),
        F.array_join(F.slice("toks", F.col("start") + 1, _WIN), " ").alias("chunk_text"),
        F.size(F.slice("toks", F.col("start") + 1, _WIN)).alias("n_tokens"),
    ).filter(F.col("n_tokens") > 0)
    deduped = chunks.groupBy("chunk_text").agg(
        F.min("doc_id").alias("keeper"),
        F.count(F.lit(1)).alias("n_copies"),
        F.min("source").alias("source"),
        F.min("n_tokens").alias("n_tokens"),
    )
    return deduped.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("n_chunks"),
        F.sum("n_tokens").cast("long").alias("total_tokens"),
        (F.sum(F.col("n_copies") - 1)).cast("long").alias("dropped_dups"),
    )


# --- temperature-weighted source mixing ----------------------------------------
_MIX_ALPHA = 0.5  # temperature: w_s ∝ count_s^alpha / count_s = count_s^(alpha-1)


@register(
    "cur_source_mix",
    oracle=f"""
    WITH counts AS (
      SELECT source, CAST(sum(n_chars) AS DOUBLE) AS n FROM documents GROUP BY source
    ),
    rates AS (
      -- temperature sampling: target share p_s ∝ n_s^alpha, so the keep
      -- rate from raw data is r_s ∝ n_s^(alpha-1), normalized so the
      -- smallest source keeps everything and larger ones downsample
      SELECT source,
             pow(n, {_MIX_ALPHA} - 1) / (SELECT max(pow(n, {_MIX_ALPHA} - 1)) FROM counts) AS rate
      FROM counts
    )
    SELECT d.doc_id, d.source
    FROM documents d JOIN rates r ON d.source = r.source
    WHERE {seeded_hash_sql("CAST(d.doc_id AS VARCHAR)", 99)} % 10000 < CAST(floor(r.rate * 10000) AS BIGINT)
    """,
)
def cur_source_mix(spark: SparkSession, sf: str) -> DataFrame:
    """Temperature-based source mixing (the multinomial alpha-sampling used
    to rebalance pre-training corpora): per-source keep rate proportional to
    count^alpha normalized by the largest source, applied as the
    deterministic seeded-hash Bernoulli — idempotent on retries, identical
    on any cluster size. Plan: one tiny per-source aggregate broadcast back
    into a map-side filter; the corpus is never shuffled."""
    d = load_table(spark, sf, "documents")
    counts = d.groupBy("source").agg(F.sum("n_chars").cast("double").alias("n"))
    maxw = counts.agg(F.max(F.pow("n", F.lit(_MIX_ALPHA - 1))).alias("m"))
    rates = counts.crossJoin(F.broadcast(maxw)).select(
        "source", (F.pow("n", F.lit(_MIX_ALPHA - 1)) / F.col("m")).alias("rate")
    )
    # floor on BOTH engines: Spark's cast truncates but DuckDB's rounds,
    # so an explicit floor keeps the boundary row set bit-identical
    keep = seeded_hash(F.col("doc_id").cast("string"), 99) % 10000 < F.floor(
        F.col("rate") * 10000
    ).cast("long")
    return d.join(F.broadcast(rates), "source").filter(keep).select("doc_id", "source")


# --- benchmark contamination: 8-gram overlap against an eval set ---------------
_CONTAM_N = 8


@register(
    "cur_contamination",
    oracle=f"""
    WITH t AS (
      SELECT doc_id, {TOKENS_SQL.format(col="text")} AS toks FROM documents
    ),
    bench AS (
      -- stand-in benchmark set: every {_CONTAM_N}-gram of the 10 longest docs
      SELECT DISTINCT array_to_string(list_slice(toks, i, i + {_CONTAM_N - 1}), ' ') AS gram
      FROM (
        SELECT toks FROM t JOIN documents USING (doc_id)
        ORDER BY n_chars DESC, doc_id LIMIT 10
      ), unnest(range(1, greatest(len(toks) - {_CONTAM_N - 2}, 1))) AS u(i)
      WHERE len(toks) >= {_CONTAM_N}
    ),
    grams AS (
      SELECT doc_id, array_to_string(list_slice(toks, i, i + {_CONTAM_N - 1}), ' ') AS gram
      FROM t, unnest(range(1, greatest(len(toks) - {_CONTAM_N - 2}, 1))) AS u(i)
      WHERE len(toks) >= {_CONTAM_N}
    )
    SELECT g.doc_id, CAST(count(DISTINCT g.gram) AS BIGINT) AS n_hits
    FROM grams g JOIN bench b ON g.gram = b.gram
    GROUP BY g.doc_id
    HAVING count(DISTINCT g.gram) > 0
    """,
)
def cur_contamination(spark: SparkSession, sf: str) -> DataFrame:
    """Benchmark contamination check: flag documents sharing any
    {n}-gram with an eval set (the n-gram-overlap decontamination step every
    serious pre-training pipeline runs; n=8 is the common choice). The
    benchmark here is a deterministic stand-in (8-grams of the 10 longest
    docs) so the oracle is exact. Plan: benchmark grams are a small DISTINCT
    set broadcast into a hash join against the corpus's exploded grams —
    map-side explode, one broadcast join, per-doc count; at 100 TB the
    bench-gram set stays driver-small (eval sets are tiny) so the corpus is
    never shuffled.""".format(n=_CONTAM_N)
    d = load_table(spark, sf, "documents")
    t = d.select("doc_id", "n_chars", tokens(F.col("text")).alias("toks"))

    def grams_of(df):
        idx = F.sequence(F.lit(1), F.size("toks") - F.lit(_CONTAM_N - 1))
        g = F.transform(
            idx,
            lambda i: F.concat_ws(
                " ", *[F.element_at(F.col("toks"), i + j) for j in range(_CONTAM_N)]
            ),
        )
        return (
            df.filter(F.size("toks") >= _CONTAM_N)
            .select("doc_id", F.explode(g).alias("gram"))
        )

    bench_docs = t.orderBy(F.col("n_chars").desc(), F.col("doc_id")).limit(10)
    bench = grams_of(bench_docs).select("gram").distinct()
    corpus_grams = grams_of(t)
    return (
        corpus_grams.join(F.broadcast(bench), "gram")
        .groupBy("doc_id")
        .agg(F.count_distinct("gram").cast("long").alias("n_hits"))
    )


# --- sequence packing: concat-and-chunk into training windows ------------------
_PACK_W = 256  # tokens per packed training example


@register(
    "cur_pack_sequences",
    oracle=f"""
    WITH t AS (
      SELECT doc_id, len({TOKENS_SQL.format(col="text")}) AS n_tokens FROM documents
    ),
    pos AS (
      SELECT doc_id, n_tokens,
             sum(n_tokens) OVER (ORDER BY doc_id ROWS UNBOUNDED PRECEDING) - n_tokens AS start
      FROM t
    )
    SELECT CAST(start // {_PACK_W} AS BIGINT) AS bin,
           CAST(count(*) AS BIGINT) AS n_docs_starting,
           CAST(sum(n_tokens) AS BIGINT) AS n_tokens,
           CAST(sum(CASE WHEN start // {_PACK_W} <> (start + n_tokens - 1) // {_PACK_W}
                    THEN 1 ELSE 0 END) AS BIGINT) AS n_spanning
    FROM pos
    GROUP BY 1
    """,
)
def cur_pack_sequences(spark: SparkSession, sf: str) -> DataFrame:
    """Concat-and-chunk sequence packing (the GPT-style pre-training packing
    pass): documents concatenate in pk order and split into fixed
    {w}-token examples; per example, how many docs start in it, their token
    mass, and how many cross the boundary (the attention-mask reset points).

    Plan — DISTRIBUTED two-pass prefix sum (associative scan), never a
    global unpartitioned window: (1) docs land in contiguous doc_id range
    shards, each shard computes its local running sum in parallel; (2) the
    per-shard token totals (≤ nshards rows) come to the driver, cumulative
    offsets go back as a broadcast join, and start = shard offset + local
    running sum. No partition ever holds more than its shard's
    (doc_id, n_tokens) pairs, so the same plan runs at a 100 TB corpus —
    the per-shard window is the only sort and it's shard-local.""".format(w=_PACK_W)
    d = load_table(spark, sf, "documents")
    from pyspark.sql import Window as W

    # cache the tiny (doc_id, n_tokens) projection (~16 B/doc): three
    # actions read it (bounds, per-shard totals, final plan) and without
    # the cache each re-tokenizes the whole corpus
    t = d.select("doc_id", F.size(tokens(F.col("text"))).alias("n_tokens")).cache()
    nshards = 32
    bounds = t.agg(F.min("doc_id").alias("lo"), F.max("doc_id").alias("hi")).first()
    lo = int(bounds.lo) if bounds.lo is not None else 0
    hi = int(bounds.hi) if bounds.hi is not None else 0
    width = max(1, (hi - lo) // nshards + 1)
    t = t.withColumn("shard", ((F.col("doc_id") - F.lit(lo)) / F.lit(width)).cast("int"))
    wl = W.partitionBy("shard").orderBy("doc_id").rowsBetween(W.unboundedPreceding, 0)
    loc = t.withColumn("local_end", F.sum("n_tokens").over(wl))
    # pass 2: tiny per-shard totals (≤ nshards rows) → cumulative offsets
    totals = sorted(
        (int(r.shard), int(r.tot))
        for r in loc.groupBy("shard").agg(F.max("local_end").alias("tot")).collect()
    )
    offs, acc = [], 0
    for s, tot in totals:
        offs.append((s, acc))
        acc += tot
    off_df = spark.createDataFrame(offs or [(0, 0)], "shard int, off long")
    pos = loc.join(F.broadcast(off_df), "shard").withColumn(
        "start", F.col("off") + F.col("local_end") - F.col("n_tokens")
    )
    # floor division on both engines: a zero-token doc whose start sits on a
    # window boundary must give end_bin = bin - 1 (DuckDB // floors; a
    # truncating cast would round toward zero and flip n_spanning)
    bin_ = F.floor(F.col("start") / _PACK_W).cast("long")
    end_bin = F.floor((F.col("start") + F.col("n_tokens") - 1) / _PACK_W).cast("long")
    return (
        pos.select("doc_id", "n_tokens", bin_.alias("bin"), (bin_ != end_bin).alias("sp"))
        .groupBy("bin")
        .agg(
            F.count(F.lit(1)).alias("n_docs_starting"),
            F.sum("n_tokens").cast("long").alias("n_tokens"),
            F.sum(F.when(F.col("sp"), 1).otherwise(0)).cast("long").alias("n_spanning"),
        )
    )


# --- BPE vocabulary learning: one merge iteration over the corpus --------------
@register(
    "cur_bpe_merge_step",
    oracle=f"""
    WITH words AS (
      SELECT w, CAST(count(*) AS BIGINT) AS freq FROM (
        SELECT unnest({TOKENS_SQL.format(col="text")}) AS w FROM documents
      ) GROUP BY w
    ),
    pairs AS (
      SELECT substr(w, CAST(i AS INT), 2) AS pair, freq
      FROM words, UNNEST(range(1, length(w))) t(i)
    )
    SELECT pair, CAST(sum(freq) AS BIGINT) AS cnt FROM pairs
    GROUP BY pair ORDER BY cnt DESC, pair ASC LIMIT 20
    """,
)
def cur_bpe_merge_step(spark: SparkSession, sf: str) -> DataFrame:
    """One BPE merge iteration (byte-pair-encoding vocabulary learning,
    Sennrich et al. 2016): the top adjacent-symbol pairs by corpus
    frequency — the pair a tokenizer trainer would merge next.

    Scale shape (the reason BPE training fits Spark): pair statistics are
    computed over the DISTINCT-WORD frequency table, not the raw corpus —
    the word groupBy is combiner-reduced map-side, and the pair explode
    runs over |vocab| rows (millions) regardless of corpus size (hundreds
    of billions of tokens). The driver loop for successive merges would
    re-run this with the learned merge applied — each iteration one
    bounded shuffle."""
    d = load_table(spark, sf, "documents")
    words = (
        d.select(F.explode(tokens(F.col("text"))).alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("freq"))
    )
    # NB: F.sequence(1, 0) counts DOWN in Spark — single-char words must be
    # filtered out, not left to produce an empty range
    pairs = words.filter(F.length("w") >= 2).select(
        F.explode(
            F.transform(
                F.sequence(F.lit(1), F.length("w") - 1),
                lambda i: F.col("w").substr(i, F.lit(2)),
            )
        ).alias("pair"),
        "freq",
    )
    return (
        pairs.groupBy("pair")
        .agg(F.sum("freq").cast("long").alias("cnt"))
        .orderBy(F.col("cnt").desc(), F.col("pair").asc())
        .limit(20)
    )


# --- LM-based quality scoring: unigram-LM mean negative log-likelihood ---------
@register(
    "cur_lm_quality_score",
    oracle=f"""
    WITH tok AS (
      SELECT doc_id, unnest({TOKENS_SQL.format(col="text")}) AS w FROM documents
    ),
    lm AS (
      SELECT w, CAST(count(*) AS BIGINT) AS freq FROM tok GROUP BY w
    ),
    tot AS (SELECT CAST(sum(freq) AS DOUBLE) AS n FROM lm),
    scored AS (
      SELECT tok.doc_id, -ln(lm.freq / tot.n) AS nll
      FROM tok JOIN lm ON tok.w = lm.w, tot
    )
    SELECT doc_id,
           round(avg(nll), 4) AS mean_nll,
           CAST(count(*) AS BIGINT) AS n_tokens
    FROM scored GROUP BY doc_id
    ORDER BY mean_nll DESC, doc_id LIMIT 50
    """,
)
def cur_lm_quality_score(spark: SparkSession, sf: str) -> DataFrame:
    """Language-model quality scoring (the perplexity-filter slot in a
    C4/CCNet-style pipeline): a unigram LM is estimated from the corpus
    itself and each document is scored by mean negative log-likelihood; the
    50 most 'surprising' docs surface for filtering.

    Scale shape: the LM is a |vocab|-row table (combiner-reduced groupBy)
    broadcast back onto the token stream — scoring is a map-side broadcast
    join + per-doc aggregate, one corpus shuffle total. A real KenLM-style
    n-gram LM drops into the same plan with n-gram keys."""
    d = load_table(spark, sf, "documents")
    tok = d.select("doc_id", F.explode(tokens(F.col("text"))).alias("w"))
    lm = tok.groupBy("w").agg(F.count(F.lit(1)).alias("freq"))
    n = lm.agg(F.sum("freq").cast("double").alias("n"))
    scored = (
        tok.join(F.broadcast(lm), "w")
        .crossJoin(F.broadcast(n))
        .select("doc_id", (-F.log(F.col("freq") / F.col("n"))).alias("nll"))
    )
    return (
        scored.groupBy("doc_id")
        .agg(
            F.round(F.avg("nll"), 4).alias("mean_nll"),
            F.count(F.lit(1)).cast("long").alias("n_tokens"),
        )
        .orderBy(F.col("mean_nll").desc(), F.col("doc_id"))
        .limit(50)
    )


# --- vocabulary coverage audit -------------------------------------------------
@register(
    "cur_vocab_coverage",
    oracle=f"""
    WITH toks AS (
      SELECT d.doc_id, d.source, t.tok
      FROM documents d, unnest({TOKENS_SQL.format(col="d.text")}) AS t(tok)
    ),
    vocab AS (
      SELECT tok FROM (
        SELECT tok, row_number() OVER (ORDER BY count(*) DESC, tok) AS rn
        FROM toks GROUP BY tok
      ) WHERE rn <= 50
    ),
    per_doc AS (
      SELECT doc_id, source, count(*) AS n_tok,
             sum(CASE WHEN tok IN (SELECT tok FROM vocab) THEN 1 ELSE 0 END) AS n_in
      FROM toks GROUP BY doc_id, source
    )
    SELECT source,
           CAST(count(*) AS BIGINT) AS n_docs,
           round(avg(n_in * 1.0 / n_tok), 4) AS avg_coverage,
           CAST(sum(CASE WHEN n_in * 1.0 / n_tok < 0.3 THEN 1 ELSE 0 END) AS BIGINT) AS n_low
    FROM per_doc GROUP BY source
    """,
)
def cur_vocab_coverage(spark: SparkSession, sf: str) -> DataFrame:
    """Vocabulary-coverage audit before tokenizer training: derive the
    corpus top-50 token vocabulary (one word-count shuffle, map-side
    combined, TakeOrdered head), broadcast it as a literal, then score every
    document's in-vocab token fraction map-side (HOF filter over the token
    array — duplicates count, so array_intersect would be wrong) and roll up
    per source. At 100 TB the vocab derivation is a standard word count and
    the audit pass is shuffle-free except the final tiny per-source agg."""
    d = load_table(spark, sf, "documents").withColumn("toks", tokens(F.col("text")))
    counts = (
        d.select(F.explode("toks").alias("tok"))
        .groupBy("tok")
        .count()
        .orderBy(F.col("count").desc(), F.col("tok"))
        .limit(50)
    )
    vocab = [r.tok for r in counts.collect()]
    varr = F.array(*[F.lit(t) for t in sorted(vocab)])
    scored = (
        d.filter(F.size("toks") > 0)
        .select(
            "source",
            F.size("toks").alias("n_tok"),
            F.size(F.filter("toks", lambda t: F.array_contains(varr, t))).alias("n_in"),
        )
        .withColumn("cov", F.col("n_in") / F.col("n_tok"))
    )
    return scored.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.round(F.avg("cov"), 4).alias("avg_coverage"),
        F.sum(F.when(F.col("cov") < 0.3, 1).otherwise(0)).cast("long").alias("n_low"),
    )


# --- deterministic sharded training order --------------------------------------
_SHARDS = 16
_KNUTH = 2654435761  # Knuth multiplicative hash — identical in both engines


@register(
    "cur_shard_order",
    oracle=f"""
    WITH h AS (
      SELECT doc_id,
             (doc_id * {_KNUTH}) % 4294967296 AS hkey,
             (doc_id * {_KNUTH}) % {_SHARDS} AS shard
      FROM documents
    ),
    ranked AS (
      SELECT shard, hkey, doc_id,
             row_number() OVER (PARTITION BY shard ORDER BY hkey, doc_id) AS pos
      FROM h
    )
    SELECT CAST(shard AS BIGINT) AS shard,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(min(hkey) AS BIGINT) AS first_key,
           CAST(max(hkey) AS BIGINT) AS last_key,
           CAST(sum(doc_id * pos) % 1000000007 AS BIGINT) AS order_sig
    FROM ranked GROUP BY shard
    """,
)
def cur_shard_order(spark: SparkSession, sf: str) -> DataFrame:
    """Deterministic global training order: every document lands in a shard
    and a position by a pure function of its id (Knuth multiplicative hash),
    so the exact same interleaving reproduces on any cluster size, retry, or
    engine — no RNG state, no global sort. The position-weighted checksum
    (order_sig) proves the per-shard ORDER, not just membership, matches the
    oracle. Plan: one hash-partition shuffle on shard + per-shard local sort
    (sortWithinPartitions shape); at 100 TB shard count scales with corpus
    size (shards ≈ corpus/file-target) keeping each sort bounded."""
    from pyspark.sql import Window as W

    d = load_table(spark, sf, "documents").select(
        "doc_id",
        ((F.col("doc_id") * _KNUTH) % F.lit(4294967296)).alias("hkey"),
        ((F.col("doc_id") * _KNUTH) % _SHARDS).alias("shard"),
    )
    w = W.partitionBy("shard").orderBy("hkey", "doc_id")
    ranked = d.withColumn("pos", F.row_number().over(w))
    return ranked.groupBy("shard").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.min("hkey").cast("long").alias("first_key"),
        F.max("hkey").cast("long").alias("last_key"),
        (F.sum(F.col("doc_id") * F.col("pos")) % 1000000007).cast("long").alias("order_sig"),
    ).withColumn("shard", F.col("shard").cast("long"))


# --- token-budget selection per source ----------------------------------------
@register(
    "cur_budget_select",
    oracle=f"""
    WITH t AS (SELECT doc_id, source,
                      list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'),
                                  x -> x <> '') AS toks
               FROM documents),
    q AS (
      SELECT doc_id, source, CAST(len(toks) AS BIGINT) AS n_tokens,
             round(0.4 * least(1.0, len(toks) / 100.0)
                   + 0.3 * (len(list_filter(toks,
                       x -> list_contains(['the','a','of','and','to','in','is'], x)))
                       * 1.0 / len(toks))
                   + 0.3 * (len(list_distinct(toks)) * 1.0 / len(toks)), 4) AS quality
      FROM t
    ),
    c AS (
      SELECT doc_id, source, n_tokens, quality,
             CAST(sum(n_tokens) OVER (PARTITION BY source
                                      ORDER BY quality DESC, doc_id ASC
                                      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_tokens
      FROM q
    )
    SELECT doc_id, source, n_tokens, quality, cum_tokens
    FROM c WHERE cum_tokens <= 1200
    """,
)
def cur_budget_select(spark: SparkSession, sf: str) -> DataFrame:
    """Token-budget curation: within each source, take documents in
    descending quality order until the source token budget (1200) is
    exhausted — the data-mixing step that fills per-source quotas with the
    best material first. The running sum is a window per source key; at
    100 TB the per-source scan is the irreducible sequential shape, and
    sources partition the work (a skewed mega-source would be range-salted
    into quota shards the same way cur_pack_sequences splits its prefix
    sums)."""
    from milvus_spark.operators.text import tokens as _tokens
    from pyspark.sql import Window as W

    d = load_table(spark, sf, "documents")
    t = d.select("doc_id", "source", _tokens(F.col("text")).alias("toks"))
    n = F.size("toks")
    quality = F.round(
        0.4 * F.least(F.lit(1.0), n / F.lit(100.0))
        + 0.3
        * (
            F.size(F.filter("toks", lambda x: x.isin("the", "a", "of", "and", "to", "in", "is")))
            / n
        )
        + 0.3 * (F.size(F.array_distinct("toks")) / n),
        4,
    )
    q = t.select(
        "doc_id", "source", n.cast("long").alias("n_tokens"), quality.alias("quality")
    )
    w = (
        W.partitionBy("source")
        .orderBy(F.col("quality").desc(), F.col("doc_id").asc())
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    c = q.withColumn("cum_tokens", F.sum("n_tokens").over(w).cast("long"))
    return c.filter(F.col("cum_tokens") <= 1200).select(
        "doc_id", "source", "n_tokens", "quality", "cum_tokens"
    )


# --- cluster-balanced sampling: topic diversity under a per-cluster cap -------
_CB_K = 8
_CB_CAP = 40


@register(
    "cur_cluster_balance",
    oracle=f"""
    WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
    c AS (SELECT vec_id AS cid, v AS cv FROM e WHERE vec_id < {_CB_K}),
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
    ranked AS (
      SELECT vec_id, cid,
             CAST(row_number() OVER (
               PARTITION BY cid
               ORDER BY {seeded_hash_sql("CAST(vec_id AS VARCHAR)", 7)}, vec_id
             ) AS BIGINT) AS pick
      FROM best
    )
    SELECT vec_id, cid, pick FROM ranked WHERE pick <= {_CB_CAP}
    """,
)
def cur_cluster_balance(spark: SparkSession, sf: str) -> DataFrame:
    """Cluster-balanced sampling: cap each embedding cluster's contribution
    so no topic dominates the curated mix — the diversity-sampling
    counterpart of dedup_semantic (same deterministic k-means assignment
    kernel, operators/semantic.py). Within a cluster, the 'random' picks
    are a seeded-hash order, so the sample is reproducible and the oracle
    exact.

    Scale shape: broadcast-K assignment (no shuffle before the argmin),
    then ONE shuffle on cid for the per-cluster window — the window's
    partition is a cluster, bounded by the same K∝n contract as
    dedup_semantic, and only ranks <= cap survive."""
    from milvus_spark.operators.semantic import assign_clusters
    from milvus_spark.operators.text import seeded_hash
    from pyspark.sql import Window as W

    e = load_table(spark, sf, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )
    best = assign_clusters(e, _CB_K).select("vec_id", "cid")
    w = W.partitionBy("cid").orderBy(
        seeded_hash(F.col("vec_id").cast("string"), 7), "vec_id"
    )
    return (
        best.withColumn("pick", F.row_number().over(w).cast("long"))
        .filter(F.col("pick") <= _CB_CAP)
        .select("vec_id", "cid", "pick")
    )


# --- deterministic source interleave (training stream order) ------------------
@register(
    "cur_interleave_sources",
    oracle=f"""
    WITH ranked AS (
      SELECT doc_id, source,
             CAST(row_number() OVER (
               PARTITION BY source
               ORDER BY {seeded_hash_sql("CAST(doc_id AS VARCHAR)", 31)}, doc_id
             ) AS BIGINT) AS rn,
             CAST(dense_rank() OVER (ORDER BY source) AS BIGINT) AS src_idx,
             CAST((SELECT count(DISTINCT source) FROM documents) AS BIGINT) AS n_src
      FROM documents
    )
    SELECT doc_id, source,
           (rn - 1) * n_src + src_idx AS position
    FROM ranked WHERE rn <= 50
    """,
)
def cur_interleave_sources(spark: SparkSession, sf: str) -> DataFrame:
    """Round-robin source interleave: the training-stream order that
    prevents any source from clustering (epoch = one shuffled doc per
    source, repeat). The global position is CLOSED FORM —
    (per-source_rank − 1) × n_sources + source_index — so no global sort
    or window ever runs: one per-source window (seeded-hash shuffle order,
    reproducible) and pure arithmetic. At 100 TB the write is a
    repartitionByRange on position; the ordering logic stays shuffle-free."""
    from pyspark.sql import Window as W

    d = load_table(spark, sf, "documents")
    n_src = d.select("source").distinct().count()
    srcs = {
        r.source: i + 1
        for i, r in enumerate(d.select("source").distinct().orderBy("source").collect())
    }
    src_idx = F.create_map(
        *[x for s, i in sorted(srcs.items()) for x in (F.lit(s), F.lit(i))]
    )[F.col("source")]
    w = W.partitionBy("source").orderBy(
        seeded_hash(F.col("doc_id").cast("string"), 31), "doc_id"
    )
    return (
        d.withColumn("rn", F.row_number().over(w).cast("long"))
        .filter(F.col("rn") <= 50)
        .select(
            "doc_id", "source",
            ((F.col("rn") - 1) * n_src + src_idx).cast("long").alias("position"),
        )
    )


# --- quality-gate funnel: survivors per cumulative filter stage ---------------
@register(
    "cur_gate_funnel",
    oracle=f"""
    WITH t AS (SELECT doc_id, {TOKENS_SQL.format(col='text')} AS toks FROM documents),
    m AS (
      SELECT doc_id,
             len(toks) AS n_tok,
             len(list_filter(toks, x -> list_contains(['the','a','of','and','to','in','is'], x))) * 1.0
               / len(toks) AS stop_ratio,
             len(list_distinct(toks)) * 1.0 / len(toks) AS uniq_ratio
      FROM t
    )
    SELECT stage, CAST(n_pass AS BIGINT) AS n_pass FROM (
      SELECT 1 AS stage_no, 'total' AS stage, count(*) AS n_pass FROM m
      UNION ALL
      SELECT 2, 'len_ge_20', count(*) FROM m WHERE n_tok >= 20
      UNION ALL
      SELECT 3, 'has_stopwords', count(*) FROM m WHERE n_tok >= 20 AND stop_ratio >= 0.01
      UNION ALL
      SELECT 4, 'diverse', count(*) FROM m
       WHERE n_tok >= 20 AND stop_ratio >= 0.01 AND uniq_ratio >= 0.3
    )
    """,
)
def cur_gate_funnel(spark: SparkSession, sf: str) -> DataFrame:
    """Quality-gate funnel: how many documents survive each CUMULATIVE
    filter stage (length → stopword-presence → lexical diversity) — the
    observability readout every curation run publishes before committing a
    corpus. ONE scan: every stage is a conditional count over the same
    per-doc metrics (no per-stage rescans), map-side combined."""
    d = load_table(spark, sf, "documents").withColumn("toks", tokens(F.col("text")))
    n = F.size("toks")
    stop_ratio = F.size(
        F.filter("toks", lambda x: x.isin("the", "a", "of", "and", "to", "in", "is"))
    ) / n
    uniq_ratio = F.size(F.array_distinct("toks")) / n
    m = d.select(
        n.alias("n_tok"), stop_ratio.alias("sr"), uniq_ratio.alias("ur")
    )
    g2 = F.col("n_tok") >= 20
    g3 = g2 & (F.col("sr") >= 0.01)
    g4 = g3 & (F.col("ur") >= 0.3)
    agg = m.agg(
        F.count(F.lit(1)).alias("total"),
        F.sum(g2.cast("long")).alias("len_ge_20"),
        F.sum(g3.cast("long")).alias("has_stopwords"),
        F.sum(g4.cast("long")).alias("diverse"),
    )
    stages = ["total", "len_ge_20", "has_stopwords", "diverse"]
    stacked = agg.select(
        F.explode(
            F.array(*[F.struct(F.lit(s).alias("stage"), F.col(s).alias("n_pass")) for s in stages])
        ).alias("s")
    )
    return stacked.select(F.col("s.stage").alias("stage"), F.col("s.n_pass").alias("n_pass"))


# --- deterministic train/val/test split ---------------------------------------
@register(
    "cur_holdout_split",
    oracle=f"""
    WITH assigned AS (
      SELECT doc_id,
             CASE WHEN {seeded_hash_sql("CAST(doc_id AS VARCHAR)", 77)} % 100 < 80 THEN 'train'
                  WHEN {seeded_hash_sql("CAST(doc_id AS VARCHAR)", 77)} % 100 < 90 THEN 'val'
                  ELSE 'test' END AS split
      FROM documents
    )
    SELECT split, CAST(count(*) AS BIGINT) AS n,
           CAST(min(doc_id) AS BIGINT) AS min_id, CAST(max(doc_id) AS BIGINT) AS max_id
    FROM assigned GROUP BY split
    """,
)
def cur_holdout_split(spark: SparkSession, sf: str) -> DataFrame:
    """Deterministic 80/10/10 train/val/test assignment by seeded hash —
    reproducible across runs AND engines (the split every training corpus
    commits to before anything else; dedup_split_decontaminate then guards
    its leakage). Pure map + one keyed rollup."""
    d = load_table(spark, sf, "documents")
    h = seeded_hash(F.col("doc_id").cast("string"), 77) % 100
    split = (
        F.when(h < 80, "train").when(h < 90, "val").otherwise("test")
    )
    return (
        d.select("doc_id", split.alias("split"))
        .groupBy("split")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min("doc_id").alias("min_id"),
            F.max("doc_id").alias("max_id"),
        )
    )
