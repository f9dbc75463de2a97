"""Training-pipeline queries over stubbed media codecs / embedding providers.

The codec and model kernels are container-stubbed (operators/multimodal.py,
operators/embedding.py) but DELIBERATELY SQL-reproducible — every fake
feature is integer/hex arithmetic over a digest both engines compute the
same way — so each query here carries an exact DuckDB oracle: the driver
hash-checks the full mapInPandas / pandas-UDF plumbing (schema, Arrow
batching, row expansion, normalization order) end to end, not just row
counts. Kernel-level assertions live in tests/test_sources_multimodal.py
and tests/test_embedding.py.

Reference parity: ingest FunctionSchema population
(internal/util/function/embedding/*_provider.go; function_chain_validator.go)
and media-column handling as opaque binary + typed metadata.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from milvus_spark.registry import register
from milvus_spark.session import load_table

# DuckDB-side hex parsing helpers (sha256/md5 return lowercase hex there,
# matching Spark's sha2/md5 and Python's hashlib hexdigest)
_HEXPOS = "strpos('0123456789abcdef', substr({h}, {i}, 1)) - 1"
# byte value of 1-based hex pair p
_PAIR = (
    "((strpos('0123456789abcdef', substr({h}, 2*({p})-1, 1)) - 1) * 16"
    " + (strpos('0123456789abcdef', substr({h}, 2*({p}), 1)) - 1))"
)
# integer from the first 15 hex chars (60 bits — exact in BIGINT)
_HEX15 = (
    "CAST(list_sum(list_transform(range(1,16), i -> "
    "CAST(strpos('0123456789abcdef', substr({h}, CAST(i AS INT), 1)) - 1 AS BIGINT)"
    " * CAST(power(16, 15 - i) AS BIGINT))) AS BIGINT)"
)


@register(
    "mm_image_features",
    oracle=f"""
    WITH f AS (
      SELECT doc_id, sha256(sha256(text)) AS h FROM documents
    )
    SELECT doc_id,
           {_HEX15.format(h='h')} AS phash,
           CAST(16 AS BIGINT) AS thumb_dim,
           CAST({_PAIR.format(h='h', p='1')} AS BIGINT) AS thumb_b0
    FROM f
    """,
)
def mm_image_features(spark: SparkSession, sf: str) -> DataFrame:
    """Multimodal feature extraction over binary media columns
    (mapInPandas batch decode — codec stubbed behind a deterministic fake,
    plumbing real): one (phash, thumb) row per document. thumb_b0 recovers
    the first decoded 'pixel' byte exactly (thumb values are byte/255
    rounded to 6 decimals, so *255 re-rounded is lossless)."""
    from milvus_spark.operators.multimodal import image_features, make_media_table

    docs = load_table(spark, sf, "documents")
    media = make_media_table(docs, "doc_id", "text")
    feats = image_features(media, "media", "doc_id")
    return feats.select(
        "doc_id",
        F.col("phash"),
        F.size("thumb").cast("long").alias("thumb_dim"),
        F.round(F.element_at("thumb", 1) * 255, 0).cast("long").alias("thumb_b0"),
    )


@register(
    "embed_ingest",
    oracle=f"""
    WITH g AS (
      SELECT doc_id, md5(text) AS h FROM documents WHERE doc_id % 10 = 0
    ),
    v AS (
      SELECT doc_id,
             list_transform(range(1,17), j ->
               CAST({_PAIR.format(h='h', p='CAST(j AS INT)')} AS DOUBLE) - 127.5) AS c
      FROM g
    ),
    n AS (
      SELECT doc_id, c, sqrt(list_sum(list_transform(c, x -> x * x))) AS nrm FROM v
    )
    SELECT doc_id,
           CAST(16 AS BIGINT) AS dim,
           round(c[1] / nrm, 4) AS c0,
           round(c[8] / nrm, 4) AS c7
    FROM n
    """,
)
def embed_ingest(spark: SparkSession, sf: str) -> DataFrame:
    """Embedding FunctionSchema ingest hook (embedding/*_provider.go):
    text column → unit-normalized vector via the md5-hexpair provider
    (pandas UDF, Arrow-batched; the provider slot a real model call drops
    into). The oracle recomputes the identical vector from md5 hex pairs,
    pinning the full Arrow round trip, centering, and normalization order."""
    from milvus_spark.operators.embedding import MD5_DIM, md5_embed_batch, with_text_embedding

    docs = load_table(spark, sf, "documents").filter(F.col("doc_id") % 10 == 0)
    emb = with_text_embedding(docs, "text", dim=MD5_DIM, provider=md5_embed_batch)
    v = F.col("embedding")
    return emb.select(
        "doc_id",
        F.size(v).cast("long").alias("dim"),
        F.round(F.element_at(v, 1), 4).alias("c0"),
        F.round(F.element_at(v, 8), 4).alias("c7"),
    )


@register(
    "mm_frame_sample",
    oracle=f"""
    WITH m AS (
      SELECT doc_id, sha256(text) AS payload, length(text) AS media_len
      FROM documents WHERE doc_id % 5 = 0
    ),
    fr AS (
      SELECT m.doc_id, CAST(u.i AS INT) AS frame_idx,
             sha256(m.payload || CAST(u.i AS VARCHAR)) AS fh
      FROM m, UNNEST(range(0, (m.media_len % 7) + 2, 2)) u(i)
    )
    SELECT doc_id, frame_idx,
           CAST(4 AS BIGINT) AS vec_dim,
           CAST({_PAIR.format(h='fh', p='1')} AS BIGINT) AS frame_b0
    FROM fr
    """,
)
def mm_frame_sample(spark: SparkSession, sf: str) -> DataFrame:
    """Video frame sampling over binary media columns (every-2nd-frame
    stride): the row-EXPANDING mapInPandas shape a real container demuxer
    uses — frame count derives from the media-length metadata so expansion
    varies per document, and the oracle reproduces every frame row plus
    the first 'pixel' byte of each sampled frame."""
    from milvus_spark.operators.multimodal import frame_sample, make_media_table

    docs = load_table(spark, sf, "documents").filter(F.col("doc_id") % 5 == 0)
    media = make_media_table(docs, "doc_id", "text")
    frames = frame_sample(media, "media", "doc_id", "media_len", every_n=2)
    return frames.select(
        "doc_id",
        "frame_idx",
        F.size("frame_vec").cast("long").alias("vec_dim"),
        F.round(F.element_at("frame_vec", 1) * 255, 0).cast("long").alias("frame_b0"),
    )


@register(
    "mm_audio_features",
    oracle=f"""
    WITH f AS (
      SELECT doc_id, sha256(sha256(text)) AS h
      FROM documents WHERE doc_id % 3 = 0
    )
    SELECT doc_id,
           CAST(8 AS BIGINT) AS n_frames,
           CAST({_PAIR.format(h='h', p='1')} AS BIGINT) AS a0,
           CAST({_PAIR.format(h='h', p='1')} + {_PAIR.format(h='h', p='2')}
              + {_PAIR.format(h='h', p='3')} + {_PAIR.format(h='h', p='4')}
              + {_PAIR.format(h='h', p='5')} + {_PAIR.format(h='h', p='6')}
              + {_PAIR.format(h='h', p='7')} + {_PAIR.format(h='h', p='8')} AS BIGINT) AS a_sum
    FROM f
    """,
)
def mm_audio_features(spark: SparkSession, sf: str) -> DataFrame:
    """Audio feature extraction over binary media columns: the fixed-frame
    (fbank-style) mapInPandas shape — codec stubbed deterministic,
    plumbing real. a0/a_sum recover the first frame byte and the exact
    byte total (sum of round-6 values × 255 re-rounds losslessly)."""
    from milvus_spark.operators.multimodal import audio_features, make_media_table

    docs = load_table(spark, sf, "documents").filter(F.col("doc_id") % 3 == 0)
    media = make_media_table(docs, "doc_id", "text")
    feats = audio_features(media, "media", "doc_id")
    v = F.col("fbank")
    total = F.aggregate(v, F.lit(0.0), lambda a, x: a + x)
    return feats.select(
        "doc_id",
        F.size(v).cast("long").alias("n_frames"),
        F.round(F.element_at(v, 1) * 255, 0).cast("long").alias("a0"),
        F.round(total * 255, 0).cast("long").alias("a_sum"),
    )


# --- keyframe selection: scene-cut detection over sampled frames --------------
_FB = _PAIR  # frame-hash byte extractor


@register(
    "mm_keyframe_select",
    oracle=f"""
    WITH m AS (
      SELECT doc_id, sha256(text) AS payload, length(text) AS media_len
      FROM documents WHERE doc_id % 5 = 0
    ),
    fr AS (
      SELECT m.doc_id, CAST(u.i AS INT) AS frame_idx,
             sha256(m.payload || CAST(u.i AS VARCHAR)) AS fh
      FROM m, UNNEST(range(0, (m.media_len % 7) + 2, 2)) u(i)
    ),
    px AS (
      SELECT doc_id, frame_idx,
             {_FB.format(h='fh', p='1')} AS b1, {_FB.format(h='fh', p='2')} AS b2,
             {_FB.format(h='fh', p='3')} AS b3, {_FB.format(h='fh', p='4')} AS b4
      FROM fr
    ),
    d AS (
      SELECT doc_id, frame_idx,
             abs(b1 - lag(b1) OVER w) + abs(b2 - lag(b2) OVER w)
           + abs(b3 - lag(b3) OVER w) + abs(b4 - lag(b4) OVER w) AS dist
      FROM px WINDOW w AS (PARTITION BY doc_id ORDER BY frame_idx)
    )
    SELECT doc_id, frame_idx, CAST(COALESCE(dist, 0) AS BIGINT) AS cut_dist
    FROM d WHERE dist IS NULL OR dist >= 340
    """,
)
def mm_keyframe_select(spark: SparkSession, sf: str) -> DataFrame:
    """Keyframe selection: keep the first frame of each media plus every
    sampled frame whose L1 pixel distance to the previous frame crosses
    the scene-cut threshold — the shot-boundary step of a video curation
    pipeline. The distance is a JVM-side zip_with over the decoded frame
    vectors (the mapInPandas decode already ran); the per-document lag
    window is bounded by frames-per-video, so a billion-video corpus
    parallelizes by doc with no global sort. Codec stubbed (fake=True
    deterministic pixels), plumbing and selection math real."""
    from pyspark.sql import Window as W

    from milvus_spark.operators.multimodal import frame_sample, make_media_table

    docs = load_table(spark, sf, "documents").filter(F.col("doc_id") % 5 == 0)
    media = make_media_table(docs, "doc_id", "text")
    frames = frame_sample(media, "media", "doc_id", "media_len", every_n=2)
    w = W.partitionBy("doc_id").orderBy("frame_idx")
    prev = F.lag("frame_vec").over(w)
    dist = F.round(
        F.aggregate(
            F.zip_with("frame_vec", prev, lambda x, y: F.abs(x - y)),
            F.lit(0.0),
            lambda a, x: a + x,
        )
        * 255,
        0,
    ).cast("long")
    d = frames.withColumn("cut_dist", dist)
    return d.filter(F.col("cut_dist").isNull() | (F.col("cut_dist") >= 340)).select(
        "doc_id", "frame_idx", F.coalesce("cut_dist", F.lit(0)).alias("cut_dist")
    )


# --- cross-modal retrieval: image query → text corpus -------------------------
@register(
    "mm_crossmodal_topk",
    oracle=f"""
    WITH q AS (
      SELECT doc_id AS qid, sha256(sha256(text)) AS h
      FROM documents WHERE doc_id % 100 = 0
    ),
    qv AS (
      SELECT qid, list_transform(range(1,17), j ->
               round(CAST({_PAIR.format(h='h', p='CAST(j AS INT)')} AS DOUBLE) / 255.0, 6)) AS iv
      FROM q
    ),
    g AS (SELECT doc_id, md5(text) AS h FROM documents),
    v AS (
      SELECT doc_id, list_transform(range(1,17), j ->
               CAST({_PAIR.format(h='h', p='CAST(j AS INT)')} AS DOUBLE) - 127.5) AS c
      FROM g
    ),
    tv AS (
      SELECT doc_id,
             list_transform(c, x -> x / sqrt(list_sum(list_transform(c, y -> y * y)))) AS tvv
      FROM v
    ),
    s AS (
      SELECT qv.qid, tv.doc_id,
             round(list_sum(list_transform(range(1,17), j ->
               iv[CAST(j AS INT)] * tvv[CAST(j AS INT)])), 4) AS score
      FROM qv, tv
    ),
    ranked AS (
      SELECT qid, doc_id, score,
             CAST(row_number() OVER (PARTITION BY qid
                                     ORDER BY score DESC, doc_id ASC) AS BIGINT) AS rank
      FROM s
    )
    SELECT qid, doc_id, score, rank FROM ranked WHERE rank <= 5
    """,
)
def mm_crossmodal_topk(spark: SparkSession, sf: str) -> DataFrame:
    """Cross-modal retrieval: image-derived feature vectors (the stubbed
    decode path's 16-dim thumbs) queried against the text corpus's
    16-dim embedding column — the CLIP-style joint-space top-k with both
    encoders swapped for deterministic fakes, so the full plumbing
    (decode → project → broadcast queries → JVM dot product → per-query
    top-k) is oracle-checked end to end. Query images broadcast; the dot
    product is a zip_with fold in whole-stage codegen; top-k is a window
    over per-query bounded partitions."""
    from pyspark.sql import Window as W

    from milvus_spark.operators.embedding import md5_embed_batch, with_text_embedding
    from milvus_spark.operators.multimodal import image_features, make_media_table

    docs = load_table(spark, sf, "documents")
    qdocs = docs.filter(F.col("doc_id") % 100 == 0)
    qv = image_features(make_media_table(qdocs, "doc_id", "text"), "media", "doc_id").select(
        F.col("doc_id").alias("qid"), F.col("thumb").alias("iv")
    )
    tv = with_text_embedding(docs, "text", dim=16, provider=md5_embed_batch).select(
        "doc_id", F.col("embedding").alias("tvv")
    )
    score = F.round(
        F.aggregate(
            F.zip_with("iv", "tvv", lambda x, y: x * y), F.lit(0.0), lambda a, x: a + x
        ),
        4,
    )
    s = tv.crossJoin(F.broadcast(qv)).select("qid", "doc_id", score.alias("score"))
    w = W.partitionBy("qid").orderBy(F.col("score").desc(), F.col("doc_id").asc())
    return (
        s.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= 5)
        .select("qid", "doc_id", "score", "rank")
    )


# --- end-to-end semantic search: text -> embedding -> ANN top-k ---------------
@register(
    "cur_semantic_search_e2e",
    oracle=f"""
    WITH g AS (SELECT doc_id, md5(text) AS h FROM documents),
    v AS (
      SELECT doc_id,
             list_transform(range(1,17), j ->
               CAST({_PAIR.format(h='h', p='CAST(j AS INT)')} AS DOUBLE) - 127.5) AS c
      FROM g
    ),
    n AS (
      SELECT doc_id,
             list_transform(c, x -> x / sqrt(list_sum(list_transform(c, y -> y * y)))) AS e
      FROM v
    ),
    q AS (SELECT doc_id AS qid, e AS qv FROM n WHERE doc_id < 3),
    scored AS (
      SELECT q.qid, n.doc_id,
             round(list_cosine_similarity(n.e, q.qv), 4) + 0 AS score
      FROM n, q
    )
    SELECT qid, doc_id, score, rank FROM (
      SELECT qid, doc_id, score,
             CAST(row_number() OVER (PARTITION BY qid ORDER BY score DESC, doc_id) AS BIGINT) AS rank
      FROM scored
    ) WHERE rank <= 5
    """,
)
def cur_semantic_search_e2e(spark: SparkSession, sf: str) -> DataFrame:
    """The full semantic-search user journey in one plan: corpus text →
    embedding (the deterministic provider — an HTTP provider swaps in) →
    exact cosine top-5 for three query texts, through the SAME brute-force
    kernel every vector query uses. The driver hash-checks provider
    plumbing + normalization + search end to end."""
    from milvus_spark.operators.embedding import md5_embed_batch, with_text_embedding
    from milvus_spark.operators.knn import brute_force_search

    d = load_table(spark, sf, "documents").select("doc_id", "text")
    emb = with_text_embedding(d, "text", out_col="e", dim=16, provider=md5_embed_batch)
    qrows = emb.filter(F.col("doc_id") < 3).orderBy("doc_id").collect()
    queries = [(int(r.doc_id), list(r.e)) for r in qrows]
    hits = brute_force_search(
        emb.select("doc_id", "e"), queries, vec_col="e", pk_col="doc_id",
        metric="COSINE", k=5,
    )
    return hits.select("qid", "doc_id", "score", "rank")
