"""Round-9 second batch: the materialized SCALAR INDEX tier — appended
AFTER addons_r9 so pre-existing registration positions never shift under
the driver's in-order sampling.

Reference parity (file:line into /root/reference):
  - internal/core/src/index/InvertedIndexTantivy.cpp — INVERTED scalar
    index: term -> row-id postings per segment, serving ==/IN filters.
  - internal/core/src/index/BitmapIndex.cpp — BITMAP: one id set per
    distinct value for low-cardinality fields (cardinality-capped by
    indexparamcheck).
  - internal/core/src/index/ScalarIndexSort.cpp — STL_SORT: the column
    kept sorted so range predicates binary-search.
  - internal/core/src/index/StringIndexMarisa.cpp — TRIE over varchar;
    prefix queries walk the trie (here: a sorted-term range).
  - ForIndex-vs-ForData dispatch: UnaryExpr.h:1117-1121.

Every query below drives the FULL index lifecycle (build on a partial
corpus → ingest → refresh appends a posting epoch → delete → refresh
folds the version mask) and asserts in-query that the final plan actually
reads the pruned index artifact, so the driver row proves both the
result AND the access path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from milvus_spark.operators.text import TOKENS_SQL
from milvus_spark.operators.multimodal import fan_out_ids
from milvus_spark.registry import register
from milvus_spark.scratch import mkdtemp as scratch_mkdtemp
from milvus_spark.session import load_table


def _client(spark):
    from milvus_spark.client import MilvusSparkClient

    return MilvusSparkClient(spark, root=scratch_mkdtemp("r9b_"))


def _plan(df: DataFrame) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


@register(
    "cli_scalar_inverted",
    oracle="""
    SELECT doc_id, n_chars FROM documents
    WHERE source = 'src3' AND doc_id % 41 != 7
    """,
)
def cli_scalar_inverted(spark: SparkSession, sf: str) -> DataFrame:
    """Equality filter dispatched through the INVERTED scalar index across
    its full lifecycle (r9 — InvertedIndexTantivy.cpp: value -> row-id
    postings per segment, so ``field == v`` reads one posting list): build
    on a partial corpus, append the rest via refresh (a new posting epoch
    — base files never rewrite), delete docs and refresh again (the delete
    folds into the [pk, bound] version mask), then query. The final filter
    reads ONLY the query value's posting list (vbucket directory pruning +
    value row-group pushdown — asserted on the executed plan in-query) and
    hash-matches the column-scan oracle over the visible state."""
    client = _client(spark)
    d = load_table(spark, sf, "documents").select("doc_id", "source", "n_chars")
    client.create_collection("sci", pk_field="doc_id")
    client.insert("sci", d.filter(F.col("doc_id") % 3 != 0))
    client.create_index("sci", "source", "INVERTED")
    client.insert("sci", d.filter(F.col("doc_id") % 3 == 0))
    client.refresh_index("sci", "source", "INVERTED")  # posting epoch 1
    client.delete("sci", filter="doc_id % 41 == 7")
    entry = client.refresh_index("sci", "source", "INVERTED")  # delete mask
    assert entry["built_ts"] == client._current_ts("sci")
    out = client.query(
        "sci", filter='source == "src3"', output_fields=["doc_id", "n_chars"]
    ).select("doc_id", "n_chars")
    assert "vbucket" in _plan(out), "expected the pruned posting-index path"
    return out


@register(
    "cli_scalar_bitmap_in",
    oracle="""
    SELECT o_orderkey, o_totalprice FROM orders
    WHERE o_orderstatus IN ('F', 'P') AND o_orderkey % 37 != 4
    """,
)
def cli_scalar_bitmap_in(spark: SparkSession, sf: str) -> DataFrame:
    """IN filter dispatched through the BITMAP scalar index under the
    lifecycle (r9 — BitmapIndex.cpp: one packed id set per distinct value
    of a LOW-cardinality field; the build refuses past the cardinality
    cap): epoch append + delete mask as above; the query explodes only the
    two matching values' id lists and semi-joins the visible base."""
    client = _client(spark)
    o = load_table(spark, sf, "orders").select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )
    client.create_collection("scb", pk_field="o_orderkey")
    client.insert("scb", o.filter(F.col("o_orderkey") % 4 != 0))
    client.create_index("scb", "o_orderstatus", "BITMAP")
    client.insert("scb", o.filter(F.col("o_orderkey") % 4 == 0))
    client.refresh_index("scb", "o_orderstatus", "BITMAP")
    client.delete("scb", filter="o_orderkey % 37 == 4")
    entry = client.refresh_index("scb", "o_orderstatus", "BITMAP")
    assert entry["built_ts"] == client._current_ts("scb")
    out = client.query(
        "scb",
        filter='o_orderstatus in ["F", "P"]',
        output_fields=["o_orderkey", "o_totalprice"],
    ).select("o_orderkey", "o_totalprice")
    assert "vbucket" in _plan(out), "expected the pruned bitmap-index path"
    return out


@register(
    "cli_scalar_sort_range",
    oracle="""
    SELECT o_orderkey, o_totalprice FROM orders
    WHERE o_totalprice >= 5000 AND o_totalprice <= 20000
      AND o_orderkey % 29 != 3
    """,
)
def cli_scalar_sort_range(spark: SparkSession, sf: str) -> DataFrame:
    """Range filter dispatched through the SORTED scalar index under the
    lifecycle (r9 — ScalarIndexSort.cpp: the column kept sorted so a range
    binary-searches; here the catalog-recorded bucket BOUNDS prune
    directories — the zone-map analog — and the value predicate pushes
    into sorted row groups). Refresh appends land in the bucket their
    value belongs to, so pruning stays exact across epochs."""
    client = _client(spark)
    o = load_table(spark, sf, "orders").select("o_orderkey", "o_totalprice")
    client.create_collection("scs", pk_field="o_orderkey")
    client.insert("scs", o.filter(F.col("o_orderkey") % 5 != 0))
    client.create_index("scs", "o_totalprice", "STL_SORT")
    client.insert("scs", o.filter(F.col("o_orderkey") % 5 == 0))
    client.refresh_index("scs", "o_totalprice", "STL_SORT")
    client.delete("scs", filter="o_orderkey % 29 == 3")
    entry = client.refresh_index("scs", "o_totalprice", "STL_SORT")
    assert entry["built_ts"] == client._current_ts("scs")
    out = client.query(
        "scs",
        filter="o_totalprice >= 5000 and o_totalprice <= 20000",
        output_fields=["o_orderkey", "o_totalprice"],
    ).select("o_orderkey", "o_totalprice")
    assert "sbucket" in _plan(out), "expected the pruned sorted-index path"
    return out


@register(
    "cli_scalar_trie_prefix",
    oracle="""
    SELECT p_partkey, p_name FROM part
    WHERE p_name LIKE 'co%' AND p_partkey % 23 != 2
    """,
)
def cli_scalar_trie_prefix(spark: SparkSession, sf: str) -> DataFrame:
    """Prefix filter dispatched through the TRIE scalar index under the
    lifecycle (r9 — StringIndexMarisa.cpp: a prefix query walks the trie;
    a sorted term layout serves the same access pattern as the range
    [p, prefix_upper(p)) over sorted terms)."""
    client = _client(spark)
    p = load_table(spark, sf, "part").select("p_partkey", "p_name")
    client.create_collection("sct", pk_field="p_partkey")
    client.insert("sct", p.filter(F.col("p_partkey") % 2 != 0))
    client.create_index("sct", "p_name", "TRIE")
    client.insert("sct", p.filter(F.col("p_partkey") % 2 == 0))
    client.refresh_index("sct", "p_name", "TRIE")
    client.delete("sct", filter="p_partkey % 23 == 2")
    entry = client.refresh_index("sct", "p_name", "TRIE")
    assert entry["built_ts"] == client._current_ts("sct")
    out = client.query(
        "sct", filter='p_name like "co%"', output_fields=["p_partkey", "p_name"]
    ).select("p_partkey", "p_name")
    assert "sbucket" in _plan(out), "expected the pruned trie-index path"
    return out


@register(
    "cli_scalar_array_contains",
    oracle=f"""
    WITH t AS (SELECT doc_id, n_chars, {TOKENS_SQL.format(col="text")} AS toks
               FROM documents WHERE doc_id % 43 != 6)
    SELECT doc_id, n_chars FROM t
    WHERE len(list_filter(['table', 'query'], w -> NOT list_contains(toks, w))) = 0
    """,
)
def cli_scalar_array_contains(spark: SparkSession, sf: str) -> DataFrame:
    """array_contains_all dispatched through the MULTI-VALUED inverted
    index under the lifecycle (r9 — InvertedIndexTantivy with multi=true:
    array elements post like terms, so contains = one posting list,
    contains_any = a union, contains_all = an intersection): epoch append +
    delete mask as the scalar rows; the final filter reads ONLY the two
    query values' posting lists and intersects per doc — never scanning
    the array column."""
    from milvus_spark.operators.text import tokens

    client = _client(spark)
    d = load_table(spark, sf, "documents").select(
        "doc_id", tokens(F.col("text")).alias("toks"), "n_chars"
    )
    client.create_collection("sca", pk_field="doc_id")
    client.insert("sca", d.filter(F.col("doc_id") % 3 != 0))
    client.create_index("sca", "toks", "INVERTED")
    client.insert("sca", d.filter(F.col("doc_id") % 3 == 0))
    client.refresh_index("sca", "toks", "INVERTED")
    client.delete("sca", filter="doc_id % 43 == 6")
    entry = client.refresh_index("sca", "toks", "INVERTED")
    assert entry["built_ts"] == client._current_ts("sca")
    out = client.query(
        "sca",
        filter='array_contains_all(toks, ["table", "query"])',
        output_fields=["doc_id", "n_chars"],
    ).select("doc_id", "n_chars")
    assert "vbucket" in _plan(out), "expected the pruned posting-index path"
    return out


@register(
    "cli_scalar_hybrid",
    oracle="""
    SELECT doc_id, n_chars FROM documents
    WHERE lang IN ('fr', 'es') AND doc_id % 47 != 8
    """,
)
def cli_scalar_hybrid(spark: SparkSession, sf: str) -> DataFrame:
    """HYBRID auto-selecting scalar index under the lifecycle (r9 —
    HybridScalarIndex.cpp SelectIndexTypeByCardinality: low-cardinality
    fields get the packed BITMAP, high-cardinality the per-value
    INVERTED postings; the selection persists until rebuild): `lang`
    (5 values) must select BITMAP and `source` (20 values, limit 10)
    INVERTED — both asserted in-query — then the IN filter dispatches
    through the bitmap across an epoch append and a delete mask."""
    client = _client(spark)
    d = load_table(spark, sf, "documents").select(
        "doc_id", "lang", "source", "n_chars"
    )
    client.create_collection("sch", pk_field="doc_id")
    client.insert("sch", d.filter(F.col("doc_id") % 3 != 0))
    e1 = client.create_index("sch", "lang", "HYBRID")
    assert e1["selected"] == "BITMAP", e1
    e2 = client.create_index(
        "sch", "source", "HYBRID", {"bitmap_cardinality_limit": 10}
    )
    assert e2["selected"] == "INVERTED", e2
    client.insert("sch", d.filter(F.col("doc_id") % 3 == 0))
    client.refresh_index("sch", "lang", "HYBRID")
    client.delete("sch", filter="doc_id % 47 == 8")
    entry = client.refresh_index("sch", "lang", "HYBRID")
    assert entry["built_ts"] == client._current_ts("sch")
    out = client.query(
        "sch", filter='lang in ["fr", "es"]', output_fields=["doc_id", "n_chars"]
    ).select("doc_id", "n_chars")
    assert "vbucket" in _plan(out), "expected the pruned bitmap path"
    return out


@register(
    "cli_geo_rtree_within",
    oracle="""
    WITH pts AS (
      SELECT event_id,
             'POINT (' || round(value, 3)::VARCHAR || ' ' || (user_id % 100)::VARCHAR || ')' AS geom,
             round(value, 3) AS x, CAST(user_id % 100 AS DOUBLE) AS y
      FROM events
    )
    SELECT event_id, geom FROM pts
    WHERE x > 10 AND x < 60 AND y > 20 AND y < 45
      AND event_id % 53 != 9
    """,
)
def cli_geo_rtree_within(spark: SparkSession, sf: str) -> DataFrame:
    """st_within dispatched through the RTREE spatial index under the
    lifecycle (r9 — RTreeIndex.cpp: a per-segment R-tree over geometry
    bounding boxes serves the GIS filters; here grid-cell directories
    prune at file listing and the EXACT compiled predicate re-runs on the
    pruned artifact): build on a partial corpus, append via refresh (new
    cell epoch), delete and refresh (version mask), then query a
    rectangle window. st_within excludes the boundary (DE-9IM), matching
    the oracle's interior test."""
    from milvus_spark.operators.geo import wkt_x, wkt_y  # noqa: F401

    client = _client(spark)
    e = load_table(spark, sf, "events")
    pts = e.select(
        "event_id",
        F.concat(
            F.lit("POINT ("),
            F.round(F.col("value"), 3).cast("string"),
            F.lit(" "),
            (F.col("user_id") % 100).cast("string"),
            F.lit(")"),
        ).alias("geom"),
    )
    client.create_collection("geo", pk_field="event_id")
    client.insert("geo", pts.filter(F.col("event_id") % 4 != 0))
    client.create_index("geo", "geom", "RTREE", {"cell_size": 16.0})
    client.insert("geo", pts.filter(F.col("event_id") % 4 == 0))
    client.refresh_index("geo", "geom", "RTREE")
    client.delete("geo", filter="event_id % 53 == 9")
    entry = client.refresh_index("geo", "geom", "RTREE")
    assert entry["built_ts"] == client._current_ts("geo")
    out = client.query(
        "geo",
        filter="st_within(geom, 'POLYGON((10 20, 60 20, 60 45, 10 45, 10 20))')",
        output_fields=["event_id", "geom"],
    ).select("event_id", "geom")
    import re as _re

    assert _re.search(
        r"PartitionFilters: \[cell#\d+ IN", _plan(out)
    ), "expected the cell-pruned RTREE path"
    return out


@register(
    "mm_adpcm_real_decode",
    oracle="""
    SELECT doc_id,
           round((((doc_id*991)%15000)*2 + 1)/32768, 6) AS amp,
           CAST(8 AS BIGINT) AS n_bins
    FROM documents
    """,
)
def mm_adpcm_real_decode(spark: SparkSession, sf: str) -> DataFrame:
    """REAL IMA/DVI ADPCM WAV decode end-to-end (r9b — WAV format 0x11,
    the classic 4-bit compressed-audio shape): each document gets a
    spec-conformant block-coded stereo stream (per-channel block headers
    carrying predictor + step index, channel-interleaved 4-byte nibble
    groups); the constant signal is a closed form because the step index
    starts at 0 where step>>3 == 0, so zero-delta nibbles reconstruct the
    constant exactly. Arbitrary-signal decode == the encoder's tracked
    reconstruction is pinned in tests/test_sources_multimodal.py. ODD
    amplitudes only (the banker's-vs-half-away .5 edge, as mm_flac)."""
    from typing import Iterator

    import numpy as np
    import pandas as pd

    from milvus_spark.operators.multimodal import audio_features, make_wav_adpcm

    d = load_table(spark, sf, "documents").select("doc_id")

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            ids = [int(i) for i in pdf["doc_id"]]
            payloads = []
            for i in ids:
                v = ((i * 991) % 15000) * 2 + 1
                st = np.full((130 + (i % 3) * 65, 2), v, dtype=np.int64)
                payloads.append(make_wav_adpcm(st, block_samples=65)[0])
            yield pd.DataFrame({"doc_id": ids, "media": payloads})

    media = fan_out_ids(d).mapInPandas(gen, "doc_id long, media binary")
    feats = audio_features(media, "media", "doc_id", fake=False)
    return feats.select(
        "doc_id",
        F.element_at("fbank", 1).alias("amp"),
        F.size("fbank").cast("long").alias("n_bins"),
    )


@register(
    "mm_png_adam7_decode",
    oracle="""
    SELECT doc_id,
           round(((doc_id*59)%256)/255, 6) AS luma01,
           CAST(16 AS BIGINT) AS n_px
    FROM documents
    """,
)
def mm_png_adam7_decode(spark: SparkSession, sf: str) -> DataFrame:
    """REAL Adam7-interlaced 16-BIT PNG decode end-to-end (r9b — the last
    common PNG shapes that refused): each document gets a spec-conformant
    interlaced 16-bit GRAYSCALE stream (seven independently filtered
    passes scattered into the grid; samples at L*257 so the /257
    inversion lands exactly on the 8-bit closed form), image_features
    decodes it in mapInPandas, and the 4×4 thumb equals L/255 exactly.
    Interlaced==sequential equivalence on random pixels across every
    in-scope (color, depth, filter) combination is pinned in
    tests/test_sources_multimodal.py."""
    from typing import Iterator

    import numpy as np
    import pandas as pd

    from milvus_spark.operators.multimodal import image_features, make_png

    d = load_table(spark, sf, "documents").select("doc_id")

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            ids = [int(i) for i in pdf["doc_id"]]
            payloads = []
            for i in ids:
                w, h = 9 + i % 4, 7 + i % 3
                v = ((i * 59) % 256) * 257
                px = np.full((h, w, 1), v, dtype=np.int64)
                payloads.append(
                    make_png(
                        w, h, pixels=px, color_type=0, bit_depth=16,
                        filter_type=(i % 5), interlace=1,
                    )
                )
            yield pd.DataFrame({"doc_id": ids, "media": payloads})

    media = fan_out_ids(d).mapInPandas(gen, "doc_id long, media binary")
    feats = image_features(media, "media", "doc_id", fake=False)
    return feats.select(
        "doc_id",
        F.element_at("thumb", 1).alias("luma01"),
        F.size("thumb").cast("long").alias("n_px"),
    )


@register(
    "mm_avi_frame_sample",
    oracle="""
    WITH fr AS (
      SELECT doc_id, unnest(generate_series(0, (doc_id % 5) + 1, 2)) AS i
      FROM documents WHERE doc_id % 5 = 0
    )
    SELECT doc_id, CAST(i AS INT) AS frame_idx,
           round((((doc_id*31 + i*97) % 128) * 2)/255, 6) AS luma01,
           CAST(16 AS BIGINT) AS n_px
    FROM fr
    """,
)
def mm_avi_frame_sample(spark: SparkSession, sf: str) -> DataFrame:
    """REAL video frame sampling end-to-end (r9): each document gets a
    spec-conformant MJPEG AVI — RIFF container with hdrl/strl headers,
    movi '00dc' chunks, idx1 index — holding (doc_id % 5) + 2 solid-gray
    baseline-JPEG frames; video_frames demuxes the container and decodes
    every 2nd frame through the from-scratch JPEG decoder in a single
    row-expanding mapInPandas pass. Each sampled frame's luma equals the
    closed form (solid neutral gray survives quantization exactly).
    Container round-trips + the refusal matrix (non-MJPG codec,
    frame-count mismatch, non-vids stream) are pinned in
    tests/test_sources_multimodal.py. Scale shape: media bytes never
    leave their partition; only sampled frames pay the decode. The 1-in-5
    doc sample bounds the per-round bench cost (the fixture ENCODES ~4
    frames/doc in the same pass — at sf0.1 the full corpus would spend
    ~20 s just manufacturing test videos)."""
    from typing import Iterator

    import pandas as pd

    from milvus_spark.operators.multimodal import (
        make_avi_mjpeg,
        make_jpeg,
        video_frames,
    )

    d = load_table(spark, sf, "documents").select("doc_id").filter(
        F.col("doc_id") % 5 == 0
    )

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            ids = [int(i) for i in pdf["doc_id"]]
            payloads = []
            for i in ids:
                frames = [
                    make_jpeg(17, 9, rgb=(((i * 31 + k * 97) % 128) * 2,) * 3)
                    for k in range((i % 5) + 2)
                ]
                payloads.append(make_avi_mjpeg(frames, 17, 9))
            yield pd.DataFrame({"doc_id": ids, "media": payloads})

    media = fan_out_ids(d).mapInPandas(gen, "doc_id long, media binary")
    out = video_frames(media, "media", "doc_id", every_n=2)
    return out.select(
        "doc_id",
        "frame_idx",
        F.element_at("frame_vec", 1).alias("luma01"),
        F.size("frame_vec").cast("long").alias("n_px"),
    )


# memoized per (applicationId, sf) — the same contract as the vector
# suite's index-build memos: the reference is a long-running server that
# builds indexes before serving, so the bench row times STEADY-STATE
# index serving, not the build
_SERVING_MEMO: dict = {}


def _scalar_serving_client(spark: SparkSession, sf: str):
    key = (spark.sparkContext.applicationId, sf)
    if key in _SERVING_MEMO:
        return _SERVING_MEMO[key]
    client = _client(spark)
    o = load_table(spark, sf, "orders").select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )
    client.create_collection("svo", pk_field="o_orderkey")
    client.insert("svo", o)
    client.create_index("svo", "o_totalprice", "STL_SORT")
    client.create_index("svo", "o_orderstatus", "BITMAP")
    _SERVING_MEMO[key] = client
    return client


@register(
    "cli_scalar_serving",
    oracle="""
    SELECT o_orderkey, o_totalprice FROM orders
    WHERE o_totalprice >= 5000 AND o_totalprice <= 20000
      AND o_orderstatus IN ('F', 'P')
    """,
)
def cli_scalar_serving(spark: SparkSession, sf: str) -> DataFrame:
    """STEADY-STATE scalar-index serving (the bench row for the r9
    scalar tier): a range filter through the sorted index's pruned
    bucket directories, intersected with an IN filter through the packed
    bitmap — both access paths asserted on the executed plan. The index
    builds are memoized per (session, sf) so this row times SERVING, the
    regime a long-running server is in."""
    client = _scalar_serving_client(spark, sf)
    rng = client.query(
        "svo",
        filter="o_totalprice >= 5000 and o_totalprice <= 20000",
        output_fields=["o_orderkey", "o_totalprice"],
    ).select("o_orderkey", "o_totalprice")
    assert "sbucket" in _plan(rng), "expected the sorted-index path"
    st = client.query(
        "svo",
        filter='o_orderstatus in ["F", "P"]',
        output_fields=["o_orderkey"],
    ).select("o_orderkey")
    assert "vbucket" in _plan(st), "expected the bitmap path"
    return rng.join(st, "o_orderkey", "left_semi")


@register(
    "cli_json_cast_index",
    oracle="""
    SELECT event_id FROM events WHERE 's' || (user_id % 5)::VARCHAR = 's2'
    """,
)
def cli_json_cast_index(spark: SparkSession, sf: str) -> DataFrame:
    """Typed JSON-path index dispatch (r9 — the reference's
    json_cast_type index param, indexparamcheck/*_index_checker.go):
    the JSON column shreds ONCE into a VARCHAR-cast sorted column at
    create_index, and a string equality on the path reads the shredded
    column (LeftSemi against the flat artifact, asserted in-query)
    instead of parsing JSON per row per query."""
    client = _client(spark)
    e = load_table(spark, sf, "events")
    j = e.select(
        "event_id",
        F.to_json(
            F.struct(
                F.concat(F.lit("s"), (F.col("user_id") % 5).cast("string")).alias(
                    "status"
                )
            )
        ).alias("props"),
    )
    client.create_collection("jci", pk_field="event_id")
    client.insert("jci", j)
    client.create_index(
        "jci", "props", "JSON_FLAT",
        {"json_path": "$.status", "json_cast_type": "VARCHAR"},
    )
    out = client.query(
        "jci", filter='props["status"] == "s2"', output_fields=["event_id"]
    ).select("event_id")
    # (the artifact path string may truncate in plan output, so pin the
    # join shape: the scan path is a plain Filter, never a LeftSemi)
    assert "LeftSemi" in _plan(out), "expected the shredded path"
    return out


@register(
    "cli_auto_rebuild_scalar",
    oracle="""
    SELECT doc_id, n_chars FROM documents
    WHERE source = 'src5' AND doc_id % 31 != 4
    """,
)
def cli_auto_rebuild_scalar(spark: SparkSession, sf: str) -> DataFrame:
    """Auto-rebuild policy end-to-end (r9 — the compaction half of the
    reference's index automation: compacted segments are re-indexed
    without operator action): an INVERTED index created with
    auto_rebuild=True is left unservable by a tombstone-folding
    compaction, and compact() rebuilds it in place — the assert pins that
    the policy fired and the final filter reads the REBUILT posting index
    (plan asserted), hash-matching the column-scan oracle."""
    client = _client(spark)
    d = load_table(spark, sf, "documents").select("doc_id", "source", "n_chars")
    client.create_collection("arb", pk_field="doc_id")
    client.insert("arb", d)
    client.create_index("arb", "source", "INVERTED", {"auto_rebuild": True})
    client.delete("arb", filter="doc_id % 31 == 4")
    client.compact("arb")  # folds tombstones -> artifact unservable -> rebuild
    entry = client.describe_index("arb", "source", "INVERTED")
    assert entry["built_ts"] == client._current_ts("arb"), "rebuild did not fire"
    out = client.query(
        "arb", filter='source == "src5"', output_fields=["doc_id", "n_chars"]
    ).select("doc_id", "n_chars")
    assert "vbucket" in _plan(out), "expected the rebuilt posting-index path"
    return out


@register(
    "cli_scalar_isnull",
    oracle="""
    SELECT doc_id, n_chars FROM documents
    WHERE doc_id % 7 = 0 AND doc_id % 59 != 3
    """,
)
def cli_scalar_isnull(spark: SparkSession, sf: str) -> DataFrame:
    """`field is null` answered from the scalar index's NULL sidecar under
    the lifecycle (r9 — the reference's scalar indexes keep a null bitmap
    so IsNull is a ForIndex expr, never a column scan): rows with
    doc_id % 7 == 0 carry NULL, the sidecar persists their ids at build,
    a refresh appends the delta's null rows as a new epoch, a delete
    folds into the shared version mask — and the final query reads ONLY
    the (id, _epoch) sidecar."""
    client = _client(spark)
    d = load_table(spark, sf, "documents").select(
        "doc_id",
        F.when(F.col("doc_id") % 7 == 0, F.lit(None)).otherwise(
            F.col("source")
        ).alias("src"),
        "n_chars",
    )
    client.create_collection("nsi", pk_field="doc_id")
    client.insert("nsi", d.filter(F.col("doc_id") % 3 != 0))
    client.create_index("nsi", "src", "INVERTED")
    client.insert("nsi", d.filter(F.col("doc_id") % 3 == 0))
    client.refresh_index("nsi", "src", "INVERTED")
    client.delete("nsi", filter="doc_id % 59 == 3")
    entry = client.refresh_index("nsi", "src", "INVERTED")
    assert entry["built_ts"] == client._current_ts("nsi")
    out = client.query(
        "nsi", filter="src is null", output_fields=["doc_id", "n_chars"]
    ).select("doc_id", "n_chars")
    assert "LeftSemi" in _plan(out), "expected the null-sidecar path"
    return out


@register(
    "cli_scalar_conjunction",
    oracle="""
    SELECT o_orderkey, o_totalprice FROM orders
    WHERE o_orderstatus = 'F'
      AND o_totalprice >= 1000 AND o_totalprice <= 9000
      AND o_orderkey % 43 != 6
    """,
)
def cli_scalar_conjunction(spark: SparkSession, sf: str) -> DataFrame:
    """Conjunctive ForIndex dispatch under the lifecycle (r9 — the
    reference ANDs per-leg ForIndex bitsets): `status == 'F' AND lo <=
    price <= hi` intersects the BITMAP equality leg with the sorted-range
    leg (the two half-ranges fold into one bucket-pruned read); both
    access paths asserted on the executed plan. Epoch appends + a delete
    mask precede the query, so the intersection runs over masked
    postings."""
    client = _client(spark)
    o = load_table(spark, sf, "orders").select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )
    client.create_collection("scj", pk_field="o_orderkey")
    client.insert("scj", o.filter(F.col("o_orderkey") % 4 != 0))
    client.create_index("scj", "o_orderstatus", "BITMAP")
    client.create_index("scj", "o_totalprice", "STL_SORT")
    client.insert("scj", o.filter(F.col("o_orderkey") % 4 == 0))
    client.refresh_index("scj", "o_orderstatus", "BITMAP")
    client.refresh_index("scj", "o_totalprice", "STL_SORT")
    client.delete("scj", filter="o_orderkey % 43 == 6")
    client.refresh_index("scj", "o_orderstatus", "BITMAP")
    entry = client.refresh_index("scj", "o_totalprice", "STL_SORT")
    assert entry["built_ts"] == client._current_ts("scj")
    out = client.query(
        "scj",
        filter='o_orderstatus == "F" and o_totalprice >= 1000 and o_totalprice <= 9000',
        output_fields=["o_orderkey", "o_totalprice"],
    ).select("o_orderkey", "o_totalprice")
    plan = _plan(out)
    assert "vbucket" in plan and "sbucket" in plan, "both index legs expected"
    return out


@register(
    "cli_scalar_disjunction",
    oracle="""
    SELECT o_orderkey, o_totalprice FROM orders
    WHERE (o_orderstatus = 'P' OR o_totalprice >= 95000)
      AND o_orderkey % 41 != 5
    """,
)
def cli_scalar_disjunction(spark: SparkSession, sf: str) -> DataFrame:
    """Disjunctive ForIndex dispatch under the lifecycle (r9 — the OR
    twin: the reference ORs per-leg ForIndex bitsets): `status == 'P' OR
    price >= hi` unions the BITMAP equality candidates with the
    sorted-range candidates; both access paths asserted on the executed
    plan, over epoch appends + a delete mask."""
    client = _client(spark)
    o = load_table(spark, sf, "orders").select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )
    client.create_collection("sdj", pk_field="o_orderkey")
    client.insert("sdj", o.filter(F.col("o_orderkey") % 4 != 0))
    client.create_index("sdj", "o_orderstatus", "BITMAP")
    client.create_index("sdj", "o_totalprice", "STL_SORT")
    client.insert("sdj", o.filter(F.col("o_orderkey") % 4 == 0))
    client.refresh_index("sdj", "o_orderstatus", "BITMAP")
    client.refresh_index("sdj", "o_totalprice", "STL_SORT")
    client.delete("sdj", filter="o_orderkey % 41 == 5")
    client.refresh_index("sdj", "o_orderstatus", "BITMAP")
    entry = client.refresh_index("sdj", "o_totalprice", "STL_SORT")
    assert entry["built_ts"] == client._current_ts("sdj")
    out = client.query(
        "sdj",
        filter='o_orderstatus == "P" or o_totalprice >= 95000',
        output_fields=["o_orderkey", "o_totalprice"],
    ).select("o_orderkey", "o_totalprice")
    plan = _plan(out)
    assert "vbucket" in plan and "sbucket" in plan, "both index legs expected"
    return out


@register(
    "cli_ngram_lifecycle",
    oracle="""
    SELECT doc_id, n_chars FROM documents
    WHERE text LIKE '%hash join%' AND doc_id % 37 != 8
    """,
)
def cli_ngram_lifecycle(spark: SparkSession, sf: str) -> DataFrame:
    """InnerMatch dispatched through the NGRAM posting index across the
    full lifecycle (r9 — NgramInvertedIndex.cpp is a per-segment index
    like the rest of the zoo, so it now rides the shared epoch +
    version-mask machinery): build on a partial corpus, append via
    refresh (a new posting epoch), delete and refresh (version mask),
    then query `%pattern%` — the final filter reads ONLY the pattern's
    grams' posting directories (gbucket pruning, asserted in-query),
    intersects, and verifies survivors against the text."""
    client = _client(spark)
    d = load_table(spark, sf, "documents").select("doc_id", "text", "n_chars")
    client.create_collection("ngl", pk_field="doc_id")
    client.insert("ngl", d.filter(F.col("doc_id") % 3 != 0))
    client.create_index("ngl", "text", "NGRAM", {"n": 3})
    client.insert("ngl", d.filter(F.col("doc_id") % 3 == 0))
    client.refresh_index("ngl", "text", "NGRAM")
    client.delete("ngl", filter="doc_id % 37 == 8")
    entry = client.refresh_index("ngl", "text", "NGRAM")
    assert entry["built_ts"] == client._current_ts("ngl")
    out = client.query(
        "ngl", filter='text like "%hash join%"',
        output_fields=["doc_id", "n_chars"],
    ).select("doc_id", "n_chars")
    assert "gbucket" in _plan(out), "expected the pruned gram-posting path"
    return out
