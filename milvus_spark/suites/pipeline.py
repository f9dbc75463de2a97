"""Training-pipeline queries that are genuinely non-SQL-expressible
(stubbed media codec; hash-projection embedding provider): registered
WITHOUT oracle_sql so the driver records the rows-only check — the Spark
plumbing (schema, Arrow batching, determinism) is what's under test, with
exact assertions living in tests/test_sources_multimodal.py and
tests/test_embedding.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from milvus_spark.registry import register
from milvus_spark.session import load_table


@register("mm_image_features")
def mm_image_features(spark: SparkSession, sf: str) -> DataFrame:
    """Multimodal feature extraction over binary media columns
    (mapInPandas batch decode — codec stubbed behind a deterministic fake,
    plumbing real): one (thumb, phash) row per document."""
    from milvus_spark.operators.multimodal import image_features, make_media_table

    docs = load_table(spark, sf, "documents")
    media = make_media_table(docs, "doc_id", "text")
    feats = image_features(media, "media", "doc_id")
    return feats.select(
        "doc_id",
        F.col("phash"),
        F.size("thumb").cast("long").alias("thumb_dim"),
    )


@register("embed_ingest")
def embed_ingest(spark: SparkSession, sf: str) -> DataFrame:
    """Embedding FunctionSchema ingest hook (embedding/*_provider.go):
    text column → unit-normalized vector via the deterministic fake
    provider (pandas UDF, Arrow-batched). Returns per-doc norm (≈1) and
    first component so the rows-only check still pins determinism."""
    from milvus_spark.operators.embedding import with_text_embedding

    docs = load_table(spark, sf, "documents").filter(F.col("doc_id") % 10 == 0)
    emb = with_text_embedding(docs, "text")
    v = F.col("embedding").cast("array<double>")
    norm = F.sqrt(F.aggregate(v, F.lit(0.0), lambda a, x: a + x * x))
    return emb.select(
        "doc_id",
        F.round(norm, 4).alias("norm"),
        F.round(F.element_at(v, 1), 4).alias("c0"),
    )


@register("mm_frame_sample")
def mm_frame_sample(spark: SparkSession, sf: str) -> DataFrame:
    """Video frame sampling over binary media columns (every-2nd-frame
    stride): the row-EXPANDING mapInPandas shape a real container demuxer
    uses — codec stubbed deterministic, plumbing (schema, per-frame rows,
    Arrow batching) real. Exact per-frame assertions live in
    tests/test_sources_multimodal.py."""
    from milvus_spark.operators.multimodal import frame_sample, make_media_table

    docs = load_table(spark, sf, "documents").filter(F.col("doc_id") % 5 == 0)
    media = make_media_table(docs, "doc_id", "text")
    frames = frame_sample(media, "media", "doc_id", every_n=2)
    return frames.select(
        "doc_id", "frame_idx", F.size("frame_vec").cast("long").alias("vec_dim")
    )
