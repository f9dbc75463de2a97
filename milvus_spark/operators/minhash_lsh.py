"""MINHASH_LSH: persisted band index over MinHash signature vectors.

Reference parity (file:line into /root/reference):
  - internal/util/indexparamcheck/index_params_validation.go:247 and
    index_params_validation_test.go:199-215 — MINHASH_LSH is a first-class
    vector index type whose metric must be MHJACCARD; the signature
    dimension is filled from the schema and a mismatching ``dim`` param is
    rejected ("dimension mismatch").
  - internal/util/function/minhash_function.go:51,72 — the MinHash
    function emits signature vectors (num_hashes slots, universal-hash
    permutations); MINHASH_LSH indexes that output field.
  - internal/core/src/minhash/MinHashComputer.cpp — MHJACCARD distance is
    1 − (matching signature slots / num_hashes).

Index layout (the same shape the dedup band index in suites/text.py uses,
persisted with the standard epoch lifecycle): one row per (doc, band) —
``(id, band, bh, sig, _epoch)`` — hive-partitioned by ``band`` and sorted
by ``bh`` within each partition. ``bh`` is the md5 of the band's
signature slots joined by ``_`` (bit-identical to DuckDB's
``md5(s0 || '_' || s1)``, so oracles can replicate the bucket exactly).
``sig`` rides inline (the reference's ``with_raw_data``) so candidate
verification reads no second artifact.

At 100 TB the artifact is n_docs × bands rows of ~sig-width each; a query
reads ONLY its own band buckets — ``band`` directory pruning plus ``bh``
row-group pruning on the sorted layout — then exact-verifies the
candidates inline. LSH banding is candidate-limited by design (docs
sharing no band with the query are not retrieved); verification makes
every RETURNED distance exact, the reference's mh_search_with_jaccard
contract.
"""

from __future__ import annotations

import hashlib
from typing import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def band_hash_col(sig: Column, band: int, rows_per_band: int) -> Column:
    """md5 bucket hash of one band's signature slots (1-indexed
    element_at; long slots cast to string exactly like DuckDB's ||)."""
    slots = [
        F.element_at(sig, band * rows_per_band + i + 1).cast("string")
        for i in range(rows_per_band)
    ]
    return F.md5(F.concat_ws("_", *slots))


def build_minhash_bands(
    df: DataFrame, field: str, pk_col: str, num_hashes: int, bands: int
) -> DataFrame:
    """One row per (doc, band): (id, band, bh, sig). The caller stamps
    ``_epoch`` and writes partitionBy("band") sorted by bh."""
    r = num_hashes // bands
    sig = F.col(field).cast("array<long>")
    # null/empty signatures are unindexed (matches refresh's indexed_cond)
    df = df.filter(F.col(field).isNotNull() & (F.size(F.col(field)) > 0))
    rows = df.select(
        F.col(pk_col).cast("long").alias("id"), sig.alias("sig")
    ).select(
        "id",
        "sig",
        F.posexplode(
            F.array(*[band_hash_col(F.col("sig"), j, r) for j in range(bands)])
        ).alias("band", "bh"),
    )
    return rows.select("id", "band", "bh", "sig")


def query_band_hashes(sig: Sequence[int], bands: int) -> list[str]:
    """Driver-side twin of band_hash_col for a query signature."""
    r = len(sig) // bands
    return [
        hashlib.md5(
            "_".join(str(int(s)) for s in sig[j * r : (j + 1) * r]).encode()
        ).hexdigest()
        for j in range(bands)
    ]


def mhjaccard_dist(sig: Column, qsig: Column, num_hashes: int) -> Column:
    """Estimated Jaccard DISTANCE = 1 − matching slots / num_hashes
    (MinHashComputer.cpp). Pure JVM column expression."""
    eq = F.aggregate(
        F.zip_with(sig, qsig, lambda x, y: F.when(x == y, 1).otherwise(0)),
        F.lit(0),
        lambda a, x: a + x,
    )
    return F.lit(1.0) - eq.cast("double") / F.lit(float(num_hashes))


def minhash_lsh_search(
    bands_df: DataFrame,
    queries: Sequence[tuple[int, Sequence[int]]],
    num_hashes: int,
    bands: int,
    k: int,
    round_to: int = 4,
) -> DataFrame:
    """Banded candidate retrieval + exact verify + top-k merge.

    ``bands_df`` is (id, band, bh, sig) — sealed artifact rows (delete
    mask already applied) plus, for sealed+growing serving, on-the-fly
    band rows for the growing delta. The ``bh`` IN-filter prunes row
    groups on the band-sorted layout; the broadcast query-band join maps
    candidates to qids; duplicates (a doc sharing several bands) collapse
    before scoring; one ranked window merges per-query top-k.
    """
    spark = bands_df.sparkSession
    qrows = []
    for qid, sig in queries:
        sig = [int(s) for s in sig]
        if len(sig) != num_hashes:
            raise ValueError(
                f"dimension mismatch: query {qid} has {len(sig)} slots, "
                f"index expects {num_hashes}"
            )
        for j, bh in enumerate(query_band_hashes(sig, bands)):
            qrows.append((int(qid), j, bh, sig))
    qdf = spark.createDataFrame(
        qrows, "qid long, band int, bh string, qsig array<long>"
    )
    all_bh = sorted({r[2] for r in qrows})
    pruned = bands_df.filter(F.col("bh").isin(all_bh))
    # Score every band hit BEFORE collapsing duplicates: all hits of one
    # (qid, id) pair carry the same (sig, qsig), so min(score) == the score
    # and the dedup becomes a hash aggregate over an 8-byte double instead
    # of a sort aggregate whose first(sig)/first(qsig) buffers drag both
    # signature arrays through the shuffle (measured plan: 2 SortAggregate
    # + array-carrying Exchange -> partial/final HashAggregate on doubles).
    scored = (
        pruned.join(F.broadcast(qdf), ["band", "bh"])
        .select(
            "qid",
            "id",
            F.round(
                mhjaccard_dist(F.col("sig"), F.col("qsig"), num_hashes), round_to
            ).alias("score"),
        )
        .groupBy("qid", "id")
        .agg(F.min("score").alias("score"))
    )
    w = Window.partitionBy("qid").orderBy(F.col("score").asc(), F.col("id").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= int(k))
    )
