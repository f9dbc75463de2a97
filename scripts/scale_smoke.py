"""Scale-up smoke: replicate the sf0.1 tables 10x (shifted pks) and time
the heavy operators at both scales. Evidence that the plans scale with
data volume, not against it — wall-clock should grow ~linearly (or less,
when per-query fixed overhead dominates at the small scale), never
quadratically.

Usage: python scripts/scale_smoke.py [factor] [name_filter ...]
(default factor 10; name filters are substring matches limiting which
HEAVY queries run — the semantic-dedup contract row runs only when
unfiltered or matched). Prints one JSON line: {"factor": N, "queries":
{name: {"base": s, "scaled": s, "ratio": r}}}.
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

_REPO = str(Path(__file__).resolve().parent.parent)
sys.path.insert(0, _REPO)

BASE_SF = "/root/testdata/sf0.1"
TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()
PK = {
    "orders": "o_orderkey", "lineitem": "l_orderkey", "customer": "c_custkey",
    "events": "event_id", "documents": "doc_id", "embeddings": "vec_id",
}
HEAVY = [
    "rel_agg_group",
    "vec_knn_cosine_filtered",
    "fts_bm25_topk",
    "dedup_minhash_lsh",
    "dedup_simhash",
    "dedup_ngram_jaccard",
    "cur_pipeline_e2e",
    "cur_pack_sequences",
    "cur_bpe_merge_step",
    "geo_grid_join_dwithin",
    "vec_element_collapse",
    "vec_emb_list_struct",
    "stream_exact_dedup",
    "win_asof_last_click",
    "win_range_join_nearby",
    "vec_hnsw_prod_ef",     # r7: production-ef graph serving (memoized build)
    "vec_hnsw_filtered",    # r7: exhaustive-ef filtered gate (memoized build)
    "mm_bmp_real_decode",   # r7: real BMP decode, map-side only
    "mm_png_real_decode",   # r8: real PNG decode (zlib inflate), map-side only
    "mm_jpeg_real_decode",  # r8: real baseline-JPEG decode, map-side only
    "fts_text_match",       # r9: posting-index text match (memoized build)
    "fts_phrase_match3_slop",  # r9: positions-index phrase window
    "fts_bm25_incremental",    # r9: stored-tf BM25 + in-flight batch union
    "mm_jpeg_prog_real_decode",  # r9: progressive multi-scan decode
    "cli_scalar_serving",     # r9: steady-state scalar-index serving (memoized build)
    "cli_scalar_sort_range",  # r9: full scalar-index lifecycle (build+refresh+serve)
    "cli_geo_rtree_within",   # r9: full RTREE lifecycle (build+refresh+serve)
    "mm_avi_frame_sample",    # r9: MJPEG-AVI demux + frame decode, map-side only
    "cli_sparse_wand_topk",   # r10: SPARSE_WAND max-score serving (full lifecycle)
    "cli_bm25_maxscore",      # r10: BM25 through the max-score kernel
    "cli_minhash_serving",    # r11: steady-state banded MHJACCARD lookup (memoized build)
    "cli_rabitq_serving",     # r11: steady-state RaBitQ estimator + refine (memoized build)
    "cli_hnsw_sq_search",     # r11: quantized-graph lifecycle (build+serve)
    "cli_sparse_inverted_refresh",  # r11: two-epoch sparse refresh + delete mask
    "cli_bin_ivf_search",     # r11: binary IVF lifecycle (build+refresh+serve)
    "mm_avi_dib_frame_sample",  # r11: uncompressed-AVI demux, map-side only
]
# dedup_semantic is measured separately (see main): the registered query
# pins K=8 for its all-pairs oracle, but the SemDeDup scale contract holds
# n/K constant — so the scale run grows K with the corpus instead of
# letting clusters grow quadratically.


def build_scaled(spark, factor: int, out: str) -> None:
    from pyspark.sql import functions as F

    os.makedirs(out, exist_ok=True)
    for t in TABLES:
        dst = os.path.join(out, f"{t}.parquet")
        if os.path.exists(os.path.join(dst, "_SUCCESS")):
            continue
        df = spark.read.parquet(f"{BASE_SF}/{t}.parquet")
        if t in PK:
            pk = PK[t]
            hi = df.agg(F.max(pk)).first()[0] + 1
            parts = [
                df.withColumn(pk, (F.col(pk) + F.lit(int(i * hi))).cast("long"))
                for i in range(factor)
            ]
            big = parts[0]
            for p in parts[1:]:
                big = big.unionByName(p)
        else:
            big = df  # dims stay fixed (the realistic shape)
        big.write.mode("overwrite").parquet(dst)


def main() -> None:
    factor = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    filters = sys.argv[2:]
    from milvus_spark.session import get_spark
    import __spark_entry__ as entrymod

    spark = get_spark("scale-smoke", shuffle_partitions=64)
    scaled_dir = os.path.join(_REPO, "_scratch", f"scale{factor}")
    build_scaled(spark, factor, scaled_dir)
    qs = entrymod.queries()
    heavy = [
        n for n in HEAVY if not filters or any(f in n for f in filters)
    ]
    report = {}
    # NOTE on methodology (measured, r6): do NOT clear caches/memos between
    # queries or resize shuffle partitions mid-session here. The warm
    # shared-cache regime IS the steady state the smoke compares across
    # scales; per-query clearCache + runtime partition-count changes were
    # tried and produced wildly unstable numbers (the same ngram base pass
    # measured 8.8s isolated, 24s mid-sweep, 118s with mid-session
    # shuffle-partition changes) because AQE re-plans against a session
    # whose storage/stat state keeps shifting.
    for name in heavy:
        times = {}
        for label, sf in (("base", BASE_SF), ("scaled", scaled_dir)):
            qs[name](spark, sf).count()  # warm (index/caches/python workers)
            t0 = time.time()
            qs[name](spark, sf).count()
            times[label] = round(time.time() - t0, 2)
        ratio = round(times["scaled"] / max(times["base"], 1e-9), 1)
        report[name] = {**times, "ratio": ratio}
        print(f"# {name}: base {times['base']}s scaled {times['scaled']}s ({ratio}x)",
              file=sys.stderr)

    # semantic dedup under the SemDeDup contract: K grows with the corpus
    # (constant n/K), so cluster size — and the per-cluster quadratic pair
    # work — stays fixed under scale-up
    if filters and not any(f in "dedup_semantic" for f in filters):
        print(json.dumps({"factor": factor, "queries": report}))
        return
    from pyspark.sql import functions as F

    from milvus_spark.operators.semantic import semantic_dedup

    times = {}
    for label, sf, k in (("base", BASE_SF, 8), ("scaled", scaled_dir, 8 * factor)):
        e = spark.read.parquet(f"{sf}/embeddings.parquet").select(
            "vec_id", F.col("embedding").cast("array<double>").alias("v")
        )
        semantic_dedup(e, k, 0.35).count()  # warm
        t0 = time.time()
        semantic_dedup(e, k, 0.35).count()
        times[label] = round(time.time() - t0, 2)
    ratio = round(times["scaled"] / max(times["base"], 1e-9), 1)
    report["dedup_semantic (K∝n)"] = {**times, "ratio": ratio}
    print(f"# dedup_semantic (K∝n): base {times['base']}s scaled {times['scaled']}s ({ratio}x)",
          file=sys.stderr)
    print(json.dumps({"factor": factor, "queries": report}))


if __name__ == "__main__":
    main()
