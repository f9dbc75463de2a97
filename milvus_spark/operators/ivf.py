"""IVF-style approximate nearest-neighbor: the 100 TB scale path.

Reference parity (file:line into /root/reference):
  - Clustering compaction (k-means on vector clustering key, per-cluster
    segments + PartitionStatsSnapshot): internal/datanode/compactor/
    clustering_compactor.go:64,249; internal/core/src/clustering/
    KmeansClustering.cpp.
  - Segment pruning by centroid distance: internal/querynodev2/delegator/
    segment_pruner.go:36,207,297.
  - IVF index search (nprobe clusters, exact within): knowhere IVF via
    query/SearchOnSealed.cpp — correctness contract is recall vs brute force
    (brute force = SearchBruteForce.cpp, our operators/knn.py).

Spark design:
  - "Index build" = a KMeans job producing (a) a tiny centroid table and
    (b) a corpus rewrite partitioned by cluster_id — exactly clustering
    compaction. Centroids live driver-side/broadcast (k ≤ a few thousand).
  - "Index search" = rank centroids per query (driver numpy, nq×k tiny),
    build a (qid, cluster_id) probe list, broadcast-join it against the
    cluster-partitioned corpus — Spark prunes non-probed partitions from the
    parquet scan (the segment-pruner analog, but free) — then exact scoring
    within, same kernel as brute force.
  - Shuffle volume: only per-batch top-k rows (O(batches · nq · k)); the
    corpus is read once, filtered at the source by partition pruning.
"""

from __future__ import annotations

from typing import Optional, Sequence

import numpy as np
import pandas as pd

from milvus_spark.operators.rounding import round_half_up
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from milvus_spark.operators.knn import _score_block, metric_ascending


def l2_normalize(df: DataFrame, vec_col: str) -> DataFrame:
    """Unit-normalize a vector column (JVM-side). For COSINE collections the
    IVF pipeline clusters/stores normalized vectors: cosine is scale-invariant
    so scores are unchanged, and L2 cells on the unit sphere = cosine cells."""
    v = F.col(vec_col).cast("array<double>")
    n = F.sqrt(F.aggregate(v, F.lit(0.0), lambda a, x: a + x * x))
    safe = F.when(n == 0, F.lit(1.0)).otherwise(n)
    return df.withColumn(vec_col, F.transform(v, lambda x: x / safe))


def unpack_bits_expr(col: Column | str) -> Column:
    """Unpack a packed-byte BINARY_VECTOR column (Milvus wire format:
    uint8 bytes, MSB-first — the np.unpackbits convention the scoring
    kernel uses) into an array<double> of 0/1 bits, JVM-side.

    The bit expansion stays inside whole-stage codegen (shift/mask per
    bit, flatten), so binary IVF builds never round-trip packed vectors
    through Python just to cluster them."""
    v = F.col(col).cast("array<int>") if isinstance(col, str) else col.cast("array<int>")
    return F.flatten(
        F.transform(
            v,
            lambda b: F.array(
                *[
                    F.shiftright(b, 7 - i).bitwiseAND(F.lit(1)).cast("double")
                    for i in range(8)
                ]
            ),
        )
    )


def build_centroids(
    df: DataFrame, vec_col: str, k: int, seed: int = 42, max_iter: int = 20
) -> np.ndarray:
    """K-means centroids (k × d) over the corpus vector column (MLlib)."""
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    feat = df.select(array_to_vector(F.col(vec_col).cast("array<double>")).alias("features"))
    model = KMeans(k=k, seed=seed, maxIter=max_iter).fit(feat)
    return np.asarray(model.clusterCenters(), dtype=np.float64)


def assign_clusters(df: DataFrame, vec_col: str, centroids: np.ndarray) -> DataFrame:
    """Add cluster_id = argmin L2 distance to centroid (map-side, Arrow batch)."""
    C = centroids

    def assign(batches):
        from milvus_spark.operators.knn import _score_block

        for pdf in batches:
            if len(pdf) == 0:
                continue
            V = np.asarray([np.asarray(v, dtype=np.float64) for v in pdf[vec_col]])
            # O(n·k) matmul distances — the broadcast-subtraction tensor
            # ((n,k,d)) was O(n·k·d) memory and OOMed builds at large nlist
            d = _score_block(V, C, "L2")  # (k, n) distances, queries=centroids
            out = pdf.drop(columns=[vec_col])
            out["cluster_id"] = d.argmin(axis=0).astype(np.int32)
            out[vec_col] = pdf[vec_col]
            yield out

    fields = [f"{name} {dt}" for name, dt in df.dtypes if name != vec_col]
    vec_dt = dict(df.dtypes)[vec_col]
    schema = ", ".join(fields + ["cluster_id int", f"{vec_col} {vec_dt}"])
    return df.mapInPandas(assign, schema=schema)


def write_clustered(
    df: DataFrame, vec_col: str, centroids: np.ndarray, path: str
) -> None:
    """Clustering compaction: rewrite the corpus partitioned by cluster_id."""
    assign_clusters(df, vec_col, centroids).write.mode("overwrite").partitionBy(
        "cluster_id"
    ).parquet(path)


def ivf_search(
    spark: SparkSession,
    clustered_path: str,
    centroids: np.ndarray,
    queries: Sequence[tuple[int, Sequence[float]]],
    vec_col: str,
    pk_col: str,
    metric: str = "COSINE",
    k: int = 10,
    nprobe: int = 8,
    round_to: int = 4,
    matches: Optional[DataFrame] = None,
    excluded: Optional[Sequence[int]] = None,
    probe_q: Optional[np.ndarray] = None,
) -> DataFrame:
    """ANN top-k probing ``nprobe`` clusters per query; exact scoring within.

    The probe-list filter lands on the partition column → parquet partition
    pruning skips all non-probed cluster directories at the scan.

    ``matches`` (optional, one long pk column) is the FilterBits →
    VectorSearch mode on the IVF layout: the scalar filter runs
    Catalyst-side on the base table, and the surviving pk ids semi-join
    the probed candidate rows BEFORE scoring — only ids move, the probed
    partitions are still the only ones scanned, and AQE broadcasts the id
    list when the filter is selective. Recall contract matches the
    reference: a filtered probe can return fewer than k hits when the
    filter thins the probed cells (widen nprobe, same as Milvus).

    ``probe_q`` (optional, nq × d_centroid) overrides the representation
    used for CENTROID ranking only — the binary IVF family
    (BIN_IVF_FLAT) clusters in unpacked-bit space while storing and
    scoring packed bytes, so its probe geometry (L2 over bits = Hamming)
    differs from the stored query layout."""
    asc = metric_ascending(metric)
    qids = np.asarray([int(q[0]) for q in queries], dtype=np.int64)
    Q = np.asarray([list(map(float, q[1])) for q in queries], dtype=np.float64)

    # Rank centroids per query driver-side (nq × k_centroids — tiny).
    # Probes use L2 against the centroids — the ASSIGNMENT geometry — not the
    # search metric: rows were placed in cells by L2, so cells must be probed
    # by L2 or recall craters. For COSINE, cluster normalized vectors
    # (spherical k-means — l2_normalize below) so L2 cells ≡ cosine cells.
    Qp = probe_q if probe_q is not None else Q
    if probe_q is None and metric.upper() == "COSINE":
        # centroids live on the unit sphere (spherical k-means) — the query
        # must too, or ||q-c||^2 ranking degenerates to centroid-norm order
        # for small/large-magnitude queries and the wrong cells get probed
        n = np.linalg.norm(Q, axis=1, keepdims=True)
        n[n == 0] = 1.0
        Qp = Q / n
    D = _score_block(centroids, Qp, "L2")
    order = np.argsort(D, axis=1)
    probes = order[:, :nprobe]  # (nq, nprobe)

    # closure-mask probe dispatch (r12 — the RaBitQ estimator's shape): a
    # tiny cluster_id -> [query index] map rides the task closure instead
    # of a broadcast (qid, cluster_id) join. The join duplicated every
    # candidate row once per query probing its cluster — x(nq*nprobe/nlist)
    # shuffle/scan bytes at scale — and scored each (batch, qid) group with
    # a 1-row matmul; the closure map reads each corpus row ONCE and scores
    # all probing queries of a cluster batch in one BLAS call.
    probe_lists: dict[int, list[int]] = {}
    for i in range(len(qids)):
        for c in probes[i]:
            probe_lists.setdefault(int(c), []).append(i)

    corpus = spark.read.parquet(clustered_path)
    # prune scan to the union of probed clusters (partition filter)
    cand = corpus.filter(F.col("cluster_id").isin(sorted(probe_lists)))
    if matches is not None:
        mt = matches.select(F.col(matches.columns[0]).cast("long").alias(pk_col))
        cand = cand.join(mt, pk_col, "left_semi")
    if excluded:
        # the persisted delete bitset (sealed artifacts never rewrite on
        # delete): tombstoned pks drop from the candidates before scoring;
        # [pk, bound] entries mask only epochs below the bound (upserts)
        from milvus_spark.operators.bitset import apply_delete_bitset

        cand = apply_delete_bitset(cand, pk_col, excluded)

    sign = 1.0 if asc else -1.0
    kk, met, rt = int(k), metric, round_to

    def score(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            frames = []
            for cid, grp in pdf.groupby("cluster_id"):
                qis = probe_lists.get(int(cid))
                if not qis:
                    continue
                V = np.asarray([np.asarray(v, dtype=np.float64) for v in grp[vec_col]])
                ids = grp[pk_col].to_numpy()
                S = _score_block(V, Q[qis], met)  # (len(qis), n)
                for row, qi in enumerate(qis):
                    s = round_half_up(S[row], rt)
                    idx = np.lexsort((ids, sign * s))[: min(kk, len(ids))]
                    frames.append(
                        pd.DataFrame(
                            {"qid": int(qids[qi]), pk_col: ids[idx], "score": s[idx]}
                        )
                    )
            if frames:
                yield pd.concat(frames)

    partial = cand.select("cluster_id", pk_col, vec_col).mapInPandas(
        score, schema=f"qid long, {pk_col} long, score double"
    )
    orderby = [F.col("score").asc() if asc else F.col("score").desc(), F.col(pk_col).asc()]
    w = W.partitionBy("qid").orderBy(*orderby)
    return (
        partial.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
        .select("qid", pk_col, "score", "rank")
    )
