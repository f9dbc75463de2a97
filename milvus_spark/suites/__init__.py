"""Driver-facing query suites. Each module registers into milvus_spark.registry."""

from __future__ import annotations

# Driver-sample rotation (r11+). The correctness driver oracle-checks the
# FIRST 50 registered queries each round; CORRECTNESS rows are keyed by
# name and accumulate across rounds, so rotating which names occupy the
# head converts locally-verified queries into driver-verified ones without
# touching any name->function binding or oracle SQL. Each round's head is
# ~40 queries that have never had a driver row (flagship lifecycle + index
# zoo first) plus ~10 long-green sentinels for regression continuity.
# Names not in the list keep their original relative order after it.
ROTATION_HEAD: list[str] = [
    # sentinels — long driver-green, cheap, one per family; the dml_*/fts_*
    # ones are r11 rotated-out names returning per the r11 verdict's
    # re-sample schedule (7 sentinels + 3 changed-path re-samples below
    # leaves 40 slots for never-driver-verified names, the r11 verdict's
    # "done" bar)
    "rel_agg_group",
    "vec_knn_cosine_filtered",
    "dedup_minhash_lsh",
    "dml_upsert_read",
    "dml_delete_final",
    "fts_text_match",
    "fts_phrase_match",
    # changed-path priority (r12 touches ivf_search, the RaBitQ window and
    # the codec fan-out width — every operator changed this round keeps or
    # gains a driver row):
    # RaBitQ (r11 window-skip + r12 width work): never driver-verified
    "cli_ivf_rabitq_search",
    "cli_rabitq_serving",
    # ivf_search riders: the three lifecycle rows re-sampled from the r11
    # head (driver-green there; the kernel changes this round) plus the
    # never-verified IVF rows
    "cli_upsert_refresh_ivf",
    "cli_growing_merge_ivf",
    "cli_ivf_mask_fold",
    "vec_ivf_cosine",
    "vec_ivf_filtered",
    "cli_bin_ivf_search",
    "cli_bin_ivf_serving",
    # codec fan-out riders (all never driver-verified; one per suite file
    # generation + the three bench rows)
    "mm_png_real_decode",
    "mm_jpeg_real_decode",
    "mm_avi_frame_sample",
    "mm_bmp_real_decode",
    "mm_wav_real_decode",
    "mm_gif_real_decode",
    "mm_flac_real_decode",
    "mm_jpeg12_real_decode",
    "mm_avi_dib_frame_sample",
    "mm_gif_interlaced_decode",
    "mm_flac24_real_decode",
    # argmin-rewrite candidates (r11 verdict #7)
    "dedup_semantic",
    "vec_element_collapse",
    # never-driver-verified: quantized graph tier + aliases (r11)
    "cli_hnsw_sq_search",
    "cli_hnsw_pq_search",
    "cli_hnsw_prq_search",
    "cli_hnsw_sq_grouping",
    "cli_faiss_factory",
    "cli_minhash_function_ingest",
    "cli_minhash_serving",
    "cli_gpu_cagra_search",
    "cli_varchar_pk_search",
    # never-driver-verified bench rows (kernel/serving shapes).
    # vec_hnsw_prod_ef / vec_hnsw_adaptive_ef were drafted here but are
    # the registry's only two ORACLE-LESS queries (approximate-by-design,
    # rows-only in the local gate) — a head slot the driver cannot
    # oracle-verify is wasted at best, so the two slots go to the two
    # oracle-backed never-verified bench rows instead
    "vec_hnsw_filtered",
    "dedup_span_fraction",
    "vec_kmeans_step",
    "stream_exact_dedup",
    "vec_hybrid_rrf",
    "vec_binary_hamming",
    "vec_sparse_ip",
    "vec_maxsim_ip",
    "vec_fp16_ip",
    "win_asof_last_click",
    "win_range_join_nearby",
    "src_packed_manifest",
]


def _rotate() -> None:
    from milvus_spark import registry

    head = [n for n in ROTATION_HEAD if n in registry.QUERIES]
    rest = [n for n in registry.QUERIES if n not in set(head)]
    ordered = {n: registry.QUERIES[n] for n in head + rest}
    # mutate in place: callers that did `from registry import QUERIES`
    # before load_suites() must see the rotated order too
    registry.QUERIES.clear()
    registry.QUERIES.update(ordered)


def load_all() -> None:
    # Import order is stable; each module registers its queries on import.
    from milvus_spark.suites import arrays, curation, dml, fulltext, geo, pipeline, relational, sources_io, streaming_state, text, vector, vector2, windows  # noqa: F401
    # r6+ additions import LAST so pre-existing registration positions
    # never shift; the head-50 the driver samples is then set explicitly
    # by ROTATION_HEAD (see _rotate above)
    from milvus_spark.suites import addons_r6  # noqa: F401
    from milvus_spark.suites import addons_r7  # noqa: F401
    from milvus_spark.suites import addons_r8  # noqa: F401
    from milvus_spark.suites import addons_r9  # noqa: F401
    from milvus_spark.suites import addons_r9b  # noqa: F401
    from milvus_spark.suites import addons_r10  # noqa: F401
    from milvus_spark.suites import addons_r11  # noqa: F401

    _rotate()
