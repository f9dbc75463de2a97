"""Round-6 additions. Registered from a module imported LAST so every
pre-existing query keeps its global registration position — the driver
samples ~50 queries per round in registration order, and inserting
mid-order would shift the un-sampled tail out from under its rotation
(the r4/r5 ordering lesson)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from milvus_spark.registry import register
from milvus_spark.session import load_table
from milvus_spark.suites.vector2 import NQ


# ---------- filtered ANN through the per-segment graph ------------------------
@register(
    "vec_hnsw_filtered",
    oracle=f"""
    WITH q AS (SELECT vec_id AS qid, CAST(embedding AS DOUBLE[]) AS qv
               FROM embeddings WHERE vec_id < {NQ}),
    scored AS (
      SELECT q.qid, e.vec_id,
             round(list_cosine_similarity(CAST(e.embedding AS DOUBLE[]), q.qv), 4) AS score
      FROM embeddings e, q WHERE e.label % 3 = 0
    ),
    ranked AS (
      SELECT qid, vec_id, score,
             CAST(row_number() OVER (PARTITION BY qid ORDER BY score DESC, vec_id) AS BIGINT) AS rank
      FROM scored
    )
    SELECT qid, vec_id, score, rank FROM ranked WHERE rank <= 10
    """,
)
def vec_hnsw_filtered(spark: SparkSession, sf: str) -> DataFrame:
    """Filtered ANN THROUGH the per-segment graph — the reference's
    FilterBits→VectorSearch mode (query/PlanProto.cpp:622-780,
    SearchOnSealed.cpp:31), the everyday production path that previously
    fell back to an exact scan. The scalar predicate (label % 3 = 0) runs
    Catalyst-side on the base table with full pushdown; only the surviving
    pk ids move, cogrouped onto the index's pk-bucket layout; each
    segment's beam search traverses the whole graph but admits only
    bitset-matching nodes. The gate query searches with ef >= the corpus
    so the beam visits every node — EXACT equivalence with the filtered
    brute-force oracle; the production regime (small ef) is recall-gated
    in tests/test_hnsw.py::test_filtered_search_recall."""
    from milvus_spark.operators.hnsw import build_hnsw, hnsw_search
    from milvus_spark.operators.ivf import l2_normalize

    emb = load_table(spark, sf, "embeddings")
    norm = l2_normalize(emb, "embedding")
    idx = build_hnsw(norm, "embedding", "vec_id", n_partitions=8, m=8, ef_construction=48)
    qrows = norm.filter(F.col("vec_id") < NQ).orderBy("vec_id").collect()
    queries = [list(r.embedding) for r in qrows]
    n = emb.count()
    matches = emb.filter(F.col("label") % 3 == 0).select("vec_id")
    raw = hnsw_search(idx, queries, ef=n, k=50, matches=matches, n_partitions=8)
    scored = raw.select(
        F.col("qid").cast("long").alias("qid"),
        F.col("id").alias("vec_id"),
        (F.round(1.0 - F.col("sqdist") / 2.0, 4) + F.lit(0.0)).alias("score"),
    )
    w = W.partitionBy("qid").orderBy(F.col("score").desc(), F.col("vec_id").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= 10)
        .select("qid", "vec_id", "score", "rank")
    )
