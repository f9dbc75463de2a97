"""Round-9 driver-facing queries: adaptive serving-ef, the persisted
text-match posting index, and stored-tf BM25 — appended AFTER every
earlier suite so pre-existing registration positions never shift under
the driver's in-order sampling.

Reference parity (file:line into /root/reference):
  - Serving recall vs segment fill: knowhere's multi-layer HNSW holds
    recall roughly flat as a segment fills (query/SearchOnIndex.cpp;
    Malkov & Yashunin layer schedule) — our single-layer graph derives
    serving ef from per-bucket fill instead (operators/hnsw.adaptive_ef).
  - Text-match posting index: internal/core/src/index/TextMatchIndex.cpp
    (tantivy postings with positions per segment), dispatch
    internal/util/textmatch/ — lexical queries read posting lists, never
    the corpus.
  - BM25 stored term-freq vectors: internal/util/function/
    bm25_function.go:103 (tf sparse vectors computed at INSERT; IDF
    applied at query from the delegator's global stats,
    idf_oracle.go:81).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from milvus_spark.operators.text import TOKENS_SQL
from milvus_spark.operators.multimodal import fan_out_ids
from milvus_spark.registry import register
from milvus_spark.scratch import mkdtemp as scratch_mkdtemp
from milvus_spark.session import load_table

NQ = 8
_TOKS = TOKENS_SQL.format(col="text")


def _client(spark):
    from milvus_spark.client import MilvusSparkClient

    return MilvusSparkClient(spark, root=scratch_mkdtemp("r9_"))

# memoized per (applicationId, sf) — the same contract as addons_r7's
# _PROD_MEMO: the reference is a long-running server that builds indexes
# before serving, so the bench times steady-state serving, not the build
_ADAPTIVE_MEMO: dict = {}


def _adaptive_segment(spark: SparkSession, sf: str):
    """One near-seal-cap segment (24k rows) built as a SINGLE pk-bucket
    graph: the shape whose fixed-ef recall decline motivated the adaptive
    policy. The segment uses the recall-curve test's calibrated geometry
    — 16 cluster centers (the table's first 16 embeddings, normalized and
    scaled) plus seeded Gaussian noise — constructed once on the driver
    (seeded rng, fully deterministic) and memoized. Two degenerate
    fixture shapes were measured and REJECTED first: jittered duplicates
    (every node's m nearest are its own clones — cross-cluster edges
    starve; 0.81 recall) and pairwise great-circle mixtures of few base
    directions (arc-collapsed manifold; 0.75 at sf0.01's 48-copy shape).
    Serving recall vs the brute-force exact result is gated once at
    build: adaptive must beat fixed-64 (the lift) and clear 0.85."""
    import numpy as np

    from milvus_spark.operators.hnsw import build_hnsw, hnsw_search
    from milvus_spark.operators.ivf import l2_normalize

    key = (spark.sparkContext.applicationId, sf)
    if key in _ADAPTIVE_MEMO:
        return _ADAPTIVE_MEMO[key]
    emb = load_table(spark, sf, "embeddings")
    crows = emb.orderBy("vec_id").limit(16).collect()
    C = np.asarray([list(r.embedding) for r in crows], dtype=np.float64)
    # center norm must dominate the noise norm (~sqrt(dim)) or the 16
    # clusters wash into one blob (measured 0.65 recall at center norm 3
    # vs sqrt(64)=8 noise); 3*sqrt(dim) separates them like the curve
    # test's 32-d geometry does
    C = (
        C / np.linalg.norm(C, axis=1, keepdims=True)
        * 3.0 * np.sqrt(C.shape[1])
    )
    rng = np.random.default_rng(7)
    n_seg = 24_000
    X = C[rng.integers(0, 16, n_seg)] + rng.normal(size=(n_seg, C.shape[1]))
    seg = spark.createDataFrame(
        [(i, X[i].tolist()) for i in range(n_seg)],
        "vec_id long, embedding array<double>",
    )
    norm = l2_normalize(seg, "embedding")
    idx = build_hnsw(norm, "embedding", "vec_id", n_partitions=1).cache()
    idx.count()
    Q = C[np.arange(NQ) % 16] + rng.normal(size=(NQ, C.shape[1]))
    queries = [
        (q / (np.linalg.norm(q) or 1.0)).tolist() for q in Q
    ]
    # recall gate vs the distributed brute-force kernel (the reference's
    # own ANN ground-truth contract, SearchBruteForce.cpp) — NOT an
    # exhaustive-ef beam: a Python beam visiting all ~24k nodes per query
    # costs ~10s/query, while the matmul kernel scans the segment in one
    # vectorized pass (measured: the gate drops from ~70s to ~2s)
    from milvus_spark.operators.knn import brute_force_search

    exact_b = brute_force_search(
        norm, list(enumerate(queries)), "embedding", "vec_id", metric="COSINE", k=10
    ).select("qid", F.col("vec_id").alias("id"))
    exact_b = exact_b.cache()
    exact_b.count()

    def _recall(df):
        return (
            df.select("qid", "id").join(exact_b, ["qid", "id"], "left_semi").count()
            / (NQ * 10)
        )

    served = _recall(
        hnsw_search(idx, queries, ef=64, k=10, n_partitions=1, adaptive=True)
    )
    fixed = _recall(hnsw_search(idx, queries, ef=64, k=10, n_partitions=1))
    # two invariants, each what the policy actually promises on this
    # 64-d near-seal-cap segment: (a) LIFT — widening the beam with fill
    # recovers recall fixed ef=64 loses (measured +0.04..+0.10 across
    # seeds/scales at this fill); (b) an absolute floor. The >= 0.9 AT
    # EVERY FILL contract itself is pinned by the curve test's calibrated
    # 32-d geometry (tests/test_hnsw.py) — 64-d normalized clusters are
    # intrinsically harder and hover 0.88-0.96 at this fill, so an
    # absolute 0.9 here would gate on the fixture draw, not the policy.
    assert served >= fixed, (
        f"adaptive-ef recall {served:.2f} below fixed-64 {fixed:.2f}"
    )
    assert served >= 0.85, (
        f"adaptive-ef serving recall {served:.2f} on the {n_seg}-row segment"
    )
    exact_b.unpersist()
    _ADAPTIVE_MEMO[key] = (idx, queries)
    return _ADAPTIVE_MEMO[key]


@register("vec_hnsw_adaptive_ef")  # rows-only: approximate serving path
def vec_hnsw_adaptive_ef(spark: SparkSession, sf: str) -> DataFrame:
    """The adaptive serving regime on a near-seal-cap segment (r9 — the
    r8 verdict's #1 ask): the beam widens to adaptive_ef(fill) instead of
    the fixed 64 whose recall declines with fill. This row's time IS the
    policy's latency cost (same plan as vec_hnsw_prod_ef, wider beam);
    recall gated at build in _adaptive_segment: adaptive must BEAT
    fixed-64 (the policy's lift) and clear an absolute floor; the
    >= 0.9-at-every-fill contract is the curve test's."""
    from milvus_spark.operators.hnsw import hnsw_search

    idx, queries = _adaptive_segment(spark, sf)
    raw = hnsw_search(idx, queries, ef=64, k=10, n_partitions=1, adaptive=True)
    return raw.select(
        F.col("qid").cast("long").alias("qid"),
        F.col("id").alias("vec_id"),
        (F.round(1.0 - F.col("sqdist") / 2.0, 4) + F.lit(0.0)).alias("score"),
        F.col("rank").cast("long").alias("rank"),
    )


@register(
    "cli_text_match_index",
    oracle=f"""
    WITH vis AS (SELECT * FROM documents WHERE doc_id % 41 != 5),
    t AS (SELECT doc_id, n_chars, {_TOKS} AS toks FROM vis)
    SELECT doc_id, n_chars FROM t
    WHERE len(list_intersect(list_distinct(toks), ['spark', 'merge', 'vector'])) >= 2
    """,
)
def cli_text_match_index(spark: SparkSession, sf: str) -> DataFrame:
    """text_match dispatched through the PERSISTED posting index across
    its full lifecycle (r9 — the r8 verdict's #2 ask; TextMatchIndex.cpp:
    the reference builds a tantivy text index per segment so lexical
    queries read postings, never the corpus): build on a partial corpus,
    append the rest via refresh (a new posting epoch — base posting files
    never rewrite), delete docs and refresh again (the delete folds into
    the [pk, bound] version mask), then query. The final filter reads ONLY
    the three query terms' posting lists (tbucket partition pruning + term
    row-group pushdown, pinned in tests/test_text_index.py) and
    hash-matches the corpus-scan oracle over the visible state."""
    client = _client(spark)
    d = load_table(spark, sf, "documents").select("doc_id", "text", "n_chars")
    client.create_collection("tmi", pk_field="doc_id")
    client.insert("tmi", d.filter(F.col("doc_id") % 3 != 0))
    client.create_index("tmi", "text", "TEXT_MATCH")
    client.insert("tmi", d.filter(F.col("doc_id") % 3 == 0))
    client.refresh_index("tmi", "text", "TEXT_MATCH")  # posting epoch 1
    client.delete("tmi", filter="doc_id % 41 == 5")
    entry = client.refresh_index("tmi", "text", "TEXT_MATCH")  # delete mask
    assert entry["built_ts"] == client._current_ts("tmi")
    return client.query(
        "tmi",
        filter='text_match(text, "spark merge vector", minimum_should_match=2)',
        output_fields=["doc_id", "n_chars"],
    ).select("doc_id", "n_chars")


@register(
    "cli_bm25_stored_tf",
    oracle=f"""
    WITH vis AS (SELECT doc_id, text FROM documents WHERE doc_id % 50 != 3),
    t AS (SELECT doc_id, {_TOKS} AS toks FROM vis),
    dl AS (SELECT doc_id, len(toks) AS dl FROM t),
    stats AS (SELECT count(*) AS n, avg(dl) AS avgdl FROM dl),
    posting AS (
      SELECT doc_id, tok, count(*) AS tf
      FROM (SELECT doc_id, unnest(toks) AS tok FROM t)
      WHERE list_contains(['spark', 'merge', 'vector'], tok)
      GROUP BY doc_id, tok
    ),
    dfq AS (SELECT tok, count(*) AS df FROM posting GROUP BY tok),
    scored AS (
      SELECT p.doc_id,
             sum(ln(1 + (s.n - dfq.df + 0.5) / (dfq.df + 0.5))
                 * p.tf * (1.2 + 1)
                 / (p.tf + 1.2 * (1 - 0.75 + 0.75 * d.dl / s.avgdl))) AS bm25
      FROM posting p
      JOIN dfq ON p.tok = dfq.tok
      JOIN dl d ON p.doc_id = d.doc_id
      CROSS JOIN stats s
      GROUP BY p.doc_id
    )
    SELECT doc_id, round(bm25, 4) AS score,
           CAST(row_number() OVER (ORDER BY round(bm25, 4) DESC, doc_id) AS BIGINT) AS rank
    FROM scored
    QUALIFY rank <= 10
    """,
)
def cli_bm25_stored_tf(spark: SparkSession, sf: str) -> DataFrame:
    """BM25 text_search from STORED term-frequency under the index
    lifecycle (r9 — the r8 verdict's #5 ask; bm25_function.go:103: tf is
    computed at insert, IDF applied at query from collection-global
    stats): the posting index persists (tf, dl) per (doc, term); a late
    batch appends as a posting epoch, deletes fold into the version mask,
    and the search scores the query terms' postings + one stats aggregate
    over the live doclens — zero query-time tokenization. Hash-matches
    the from-scratch BM25 oracle over the final visible corpus."""
    client = _client(spark)
    d = load_table(spark, sf, "documents").select("doc_id", "text")
    client.create_collection("bst", pk_field="doc_id")
    client.insert("bst", d.filter(F.col("doc_id") % 5 != 0))
    client.create_index("bst", "text", "TEXT_MATCH")
    client.insert("bst", d.filter(F.col("doc_id") % 5 == 0))
    client.delete("bst", filter="doc_id % 50 == 3")
    entry = client.refresh_index("bst", "text", "TEXT_MATCH")
    assert entry["built_ts"] == client._current_ts("bst")
    return client.text_search("bst", "text", "spark merge vector", limit=10)


@register(
    "cli_auto_refresh_ann",
    oracle=f"""
    WITH q AS (SELECT vec_id AS qid, CAST(embedding AS DOUBLE[]) AS qv
               FROM embeddings WHERE vec_id < {NQ}),
    scored AS (
      SELECT q.qid, e.vec_id,
             round(list_cosine_similarity(CAST(e.embedding AS DOUBLE[]), q.qv), 4) AS score
      FROM embeddings e, q
    ),
    ranked AS (
      SELECT qid, vec_id, score,
             CAST(row_number() OVER (PARTITION BY qid ORDER BY score DESC, vec_id) AS BIGINT) AS rank
      FROM scored
    )
    SELECT qid, vec_id, score, rank FROM ranked WHERE rank <= 10
    """,
)
def cli_auto_refresh_ann(spark: SparkSession, sf: str) -> DataFrame:
    """Auto-refresh policy end-to-end (r9 — the r8 verdict's #6 ask; the
    seal-policy analog, component_param.go:5605-5630: the reference seals
    AND indexes by size policy): the index is created with
    auto_refresh_rows=80, a post-build ingest crosses the threshold, and
    refresh_index fires INSIDE insert() — serving flips from the
    sealed+growing merge back to pure epoch search with no manual
    refresh. The assert pins that the policy actually fired; exhaustive
    ef makes the result exact vs the whole-corpus oracle."""
    client = _client(spark)
    emb = load_table(spark, sf, "embeddings")
    client.create_collection(
        "aref", pk_field="vec_id", vector_field="embedding", metric_type="COSINE"
    )
    client.insert("aref", emb.filter(F.col("vec_id") % 5 != 0))
    client.create_index(
        "aref", "embedding", "HNSW", {"M": 8, "auto_refresh_rows": 80}
    )
    # 20% of the corpus lands AFTER the build — past the 80-row policy
    # threshold, so the refresh fires inside this insert call
    client.insert("aref", emb.filter(F.col("vec_id") % 5 == 0))
    entry = client.describe_index("aref", "embedding", "HNSW")
    assert entry["built_ts"] == client._current_ts("aref"), "policy did not fire"
    assert entry["pending_rows"] == 0
    qrows = emb.filter(F.col("vec_id") < NQ).orderBy("vec_id").collect()
    out = client.search(
        "aref",
        [list(r.embedding) for r in qrows],
        limit=10,
        search_params={"ef": 10**6},
    )
    return out.select(
        F.col("qid").cast("long").alias("qid"), "vec_id",
        (F.col("score") + F.lit(0.0)).alias("score"),
        F.col("rank").cast("long").alias("rank"),
    )


@register(
    "mm_jpeg420_real_decode",
    oracle="""
    SELECT doc_id,
           round(((doc_id*2*37)%256)/255, 6) AS luma01,
           CAST(16 AS BIGINT) AS n_px
    FROM documents
    """,
)
def mm_jpeg420_real_decode(spark: SparkSession, sf: str) -> DataFrame:
    """REAL 4:2:0 SUBSAMPLED baseline-JPEG decode end-to-end (r9 — the r8
    verdict's #4 ask: most real-world JPEGs are 4:2:0, which r8's decoder
    refused): each document gets a spec-conformant interleaved-MCU 4:2:0
    stream (solid neutral gray R=G=B=even L, so Y=L exactly and
    Cb=Cr=128 — the closed form survives both quantization and the 2×2
    chroma box mean; width spans ≥2 MCUs so the interleave + box
    upsample genuinely execute), image_features(fake=False) decodes it
    in mapInPandas, and the 4×4 thumb equals L/255 exactly. Round-trips
    vs a direct-DCT reference (never touching Huffman) are pinned in
    tests/test_sources_multimodal.py. Scale shape: one map-side
    Arrow-batched pass, zero shuffles, media bytes never leave their
    partition."""
    from typing import Iterator

    import pandas as pd

    from milvus_spark.operators.multimodal import image_features, make_jpeg

    d = load_table(spark, sf, "documents").select("doc_id")

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            ids = [int(i) for i in pdf["doc_id"]]
            yield pd.DataFrame({
                "doc_id": ids,
                "media": [
                    make_jpeg(
                        17 + i % 4, 9 + i % 3,
                        rgb=((i * 2 * 37) % 256,) * 3,
                        subsampling="420",
                    )
                    for i in ids
                ],
            })

    media = fan_out_ids(d).mapInPandas(gen, "doc_id long, media binary")
    feats = image_features(media, "media", "doc_id", fake=False)
    return feats.select(
        "doc_id",
        F.element_at("thumb", 1).alias("luma01"),
        F.size("thumb").cast("long").alias("n_px"),
    )


@register(
    "mm_png_palette_decode",
    oracle="""
    SELECT doc_id,
           round((0.299*((doc_id*53)%256) + 0.587*((doc_id*71)%256)
                  + 0.114*((doc_id*101)%256))/255, 6) AS luma01,
           CAST(16 AS BIGINT) AS n_px
    FROM documents
    """,
)
def mm_png_palette_decode(spark: SparkSession, sf: str) -> DataFrame:
    """REAL PALETTE-PNG decode end-to-end (r9 — the other half of the r8
    verdict's #4 ask: r8's PNG decoder refused color type 3): each
    document gets a spec-conformant paletted PNG (PLTE carrying its
    id-derived solid color, 8-bit indices), the decoder maps indices
    through the PLTE table to BT.601 luma, and the thumb equals the
    closed form. Arbitrary multi-entry palettes under every scanline
    filter type are pinned in tests/test_sources_multimodal.py."""
    from typing import Iterator

    import pandas as pd

    from milvus_spark.operators.multimodal import image_features, make_png

    d = load_table(spark, sf, "documents").select("doc_id")

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            ids = [int(i) for i in pdf["doc_id"]]
            yield pd.DataFrame({
                "doc_id": ids,
                "media": [
                    make_png(
                        5 + i % 3, 3 + i % 4,
                        ((i * 53) % 256, (i * 71) % 256, (i * 101) % 256),
                        color_type=3,
                    )
                    for i in ids
                ],
            })

    media = fan_out_ids(d).mapInPandas(gen, "doc_id long, media binary")
    feats = image_features(media, "media", "doc_id", fake=False)
    return feats.select(
        "doc_id",
        F.element_at("thumb", 1).alias("luma01"),
        F.size("thumb").cast("long").alias("n_px"),
    )


@register(
    "mm_jpeg_prog_real_decode",
    oracle="""
    SELECT doc_id,
           round(((doc_id*2*43)%256)/255, 6) AS luma01,
           CAST(16 AS BIGINT) AS n_px
    FROM documents
    """,
)
def mm_jpeg_prog_real_decode(spark: SparkSession, sf: str) -> DataFrame:
    """REAL PROGRESSIVE (SOF2) JPEG decode end-to-end (r9 — past the r8
    verdict's #4 ask: progressive was the biggest remaining refusal,
    previously listed library-gated): each document gets a spec-conformant
    multi-scan stream exercising BOTH progressive dimensions — successive
    approximation (DC/AC first scans at Al=1 plus refinement scans with
    correction-bit coding, spec G.1.2.3) and spectral selection
    (per-component AC band scans) with cross-block EOBRUN accumulation.
    Solid neutral gray (R=G=B=even L) keeps the closed form: the DC
    arithmetic-shift + OR-bit reconstruction is lossless, so the thumb
    equals L/255 exactly. Bit-identical-to-baseline equivalence on
    arbitrary pixels (incl. 4:2:0 progressive and EOBRUN-heavy flat+busy
    shapes) is pinned in tests/test_sources_multimodal.py."""
    from typing import Iterator

    import pandas as pd

    from milvus_spark.operators.multimodal import image_features, make_jpeg

    d = load_table(spark, sf, "documents").select("doc_id")

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            ids = [int(i) for i in pdf["doc_id"]]
            yield pd.DataFrame({
                "doc_id": ids,
                "media": [
                    make_jpeg(
                        11 + i % 4, 9 + i % 3,
                        rgb=((i * 2 * 43) % 256,) * 3,
                        progressive=True,
                    )
                    for i in ids
                ],
            })

    media = fan_out_ids(d).mapInPandas(gen, "doc_id long, media binary")
    feats = image_features(media, "media", "doc_id", fake=False)
    return feats.select(
        "doc_id",
        F.element_at("thumb", 1).alias("luma01"),
        F.size("thumb").cast("long").alias("n_px"),
    )


@register(
    "mm_flac_real_decode",
    oracle="""
    SELECT doc_id,
           round((((doc_id*991)%15000)*2 + 1)/32768, 6) AS amp,
           CAST(8 AS BIGINT) AS n_bins
    FROM documents
    """,
)
def mm_flac_real_decode(spark: SparkSession, sf: str) -> DataFrame:
    """REAL FLAC decode end-to-end with pure Python (r9 — the last
    library-gated audio format): each document gets a spec-conformant
    MID-SIDE stereo FLAC (both channels at the id-derived constant, so
    mid = v and side = 0 — the stereo decorrelation path executes while
    the decoded amplitude keeps the closed form |v|/32768), audio
    features decode it in mapInPandas, every energy bin equals the
    oracle. FIXED/LPC subframes, Rice residuals and all four stereo
    modes are round-trip-pinned in tests/test_sources_multimodal.py."""
    from typing import Iterator

    import numpy as np
    import pandas as pd

    from milvus_spark.operators.multimodal import audio_features, make_flac

    d = load_table(spark, sf, "documents").select("doc_id")

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            ids = [int(i) for i in pdf["doc_id"]]
            payloads = []
            for i in ids:
                # ODD amplitudes only: v/32768 lands exactly on a 6th-
                # decimal .5 iff v % 512 == 256, where Python's banker's
                # rounding and DuckDB's half-away rounding disagree
                v = ((i * 991) % 15000) * 2 + 1
                st = np.full((200 + i % 40, 2), v, dtype=np.int64)
                payloads.append(
                    make_flac(st, channels=2, stereo_mode="mid_side",
                              block_size=128)
                )
            yield pd.DataFrame({"doc_id": ids, "media": payloads})

    media = fan_out_ids(d).mapInPandas(gen, "doc_id long, media binary")
    feats = audio_features(media, "media", "doc_id", fake=False)
    return feats.select(
        "doc_id",
        F.element_at("fbank", 1).alias("amp"),
        F.size("fbank").cast("long").alias("n_bins"),
    )
