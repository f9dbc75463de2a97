"""RTREE spatial index (r9 — RTreeIndex.cpp analog): grid-cell
partitioned geometry artifact, bbox-driven directory pruning, exact
compiled-predicate verify, the shared epoch/version-mask lifecycle, and
the cap fallback."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from milvus_spark.operators.geo import (
    build_rtree,
    rtree_cells_for_bbox,
    rtree_query_bbox,
)


def _points(spark, sf_dir):
    e = spark.read.parquet(f"{sf_dir}/events.parquet")
    wkt = F.concat(
        F.lit("POINT ("),
        F.round(F.col("value"), 3).cast("string"),
        F.lit(" "),
        (F.col("user_id") % 100).cast("string"),
        F.lit(")"),
    )
    return e.select("event_id", wkt.alias("geom"))


def test_rtree_bbox_and_cells():
    assert rtree_query_bbox("st_dwithin", "POINT", (50, 50), 12.5) == (
        37.5, 62.5, 37.5, 62.5
    )
    poly = [(10, 20), (60, 20), (60, 45), (10, 45)]
    assert rtree_query_bbox("st_within", "POLYGON", poly) == (10, 60, 20, 45)
    cells = rtree_cells_for_bbox((10, 60, 20, 45), 8.0)
    assert "1_2" in cells and f"{60 // 8}_{45 // 8}" in cells
    # cap: a window covering too many cells returns None (scan fallback)
    assert rtree_cells_for_bbox((0, 1e6, 0, 1e6), 8.0) is None


def test_rtree_read_prunes_cells(spark, sf_dir, tmp_path):
    """100 TB posture pin: a GIS query lists only the bbox's cell
    directories — the cell filter is a PartitionFilter."""
    import re

    p = _points(spark, sf_dir)
    art = build_rtree(p, "geom", "event_id", cell_size=8.0)
    path = str(tmp_path / "cells")
    art.write.partitionBy("cell").parquet(path)
    stored = spark.read.parquet(path)
    cells = rtree_cells_for_bbox((10, 60, 20, 45), 8.0)
    q = stored.filter(F.col("cell").isin(cells))
    plan = q._jdf.queryExecution().executedPlan().toString()
    # the cell predicate must be a PARTITION filter (directory prune),
    # not a data filter — and non-empty (IN / INSET per set size)
    m = re.search(r"PartitionFilters: \[cell#\d+ IN", plan)
    assert m is not None, plan[:600]


def test_client_rtree_lifecycle(spark, sf_dir, tmp_path):
    """create_index(RTREE) → st_within/st_dwithin/st_intersects dispatch
    equals the scan path with the pruned plan pinned; sealed+growing on
    post-build writes; refresh appends an epoch; a delete folds into the
    version mask; an upsert that MOVES a point serves its new location;
    an unboundable window falls back to the scan."""
    from milvus_spark.client import MilvusSparkClient
    from milvus_spark.plans.expr import compile_expr

    client = MilvusSparkClient(spark, root=str(tmp_path))
    p = _points(spark, sf_dir)
    client.create_collection("rt", pk_field="event_id")
    client.insert("rt", p.filter(F.col("event_id") % 3 != 0))
    client.create_index("rt", "geom", "RTREE", {"cell_size": 8.0})

    # sf0.001's y domain (user_id %% 100) spans only 0..14 — windows sized
    # to it so every predicate has matches
    flt_w = "st_within(geom, 'POLYGON((10 2, 120 2, 120 12, 10 12, 10 2))')"
    flt_d = "st_dwithin(geom, 'POINT (50 8)', 20)"
    flt_i = "st_intersects(geom, 'POLYGON((30 4, 150 4, 150 13, 30 13, 30 4))')"

    def ids(flt):
        return {r.event_id for r in client.query("rt", filter=flt).collect()}

    def scan_ids(flt):
        base = client._read("rt")
        return {
            r.event_id
            for r in base.filter(compile_expr(flt, base.schema))
            .select("event_id")
            .collect()
        }

    def plan(flt):
        return (
            client.query("rt", filter=flt)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )

    import re

    def pruned(pl):
        return re.search(r"PartitionFilters: \[cell#\d+ IN", pl) is not None

    for flt in (flt_w, flt_d, flt_i):
        assert ids(flt) == scan_ids(flt) and ids(flt), flt
        assert pruned(plan(flt)), flt
    # sealed + growing: post-build writes, no refresh
    client.insert("rt", p.filter(F.col("event_id") % 3 == 0))
    pw = plan(flt_w)
    assert pruned(pw) and "GreaterThan(_ts" in pw
    assert ids(flt_w) == scan_ids(flt_w)
    # refresh appends epoch 1
    entry = client.refresh_index("rt", "geom", "RTREE")
    assert entry["cur_epoch"] == 1
    assert ids(flt_d) == scan_ids(flt_d)
    # delete an indexed matching point -> version mask
    victim = int(sorted(ids(flt_w))[0])
    client.delete("rt", ids=[victim])
    entry = client.refresh_index("rt", "geom", "RTREE")
    assert [victim, 2] in [list(map(int, x)) for x in entry["masked_pks"]]
    got = ids(flt_w)
    assert victim not in got and got == scan_ids(flt_w)
    # upsert MOVES a point into the window: old cell's copy masks below
    # the new epoch, the new location serves
    outside = int(
        sorted(
            {r.event_id for r in p.filter("event_id % 3 != 0").collect()}
            - scan_ids(flt_w)
        )[0]
    )
    client.delete("rt", ids=[outside])
    client.insert(
        "rt",
        spark.createDataFrame(
            [[outside, "POINT (35 7)"]], "event_id long, geom string"
        ),
    )
    client.refresh_index("rt", "geom", "RTREE")
    got = ids(flt_w)
    assert outside in got and got == scan_ids(flt_w)
    # unboundable window: bbox covers more cells than the cap -> fallback
    big = "st_within(geom, 'POLYGON((-99999 -99999, 99999 -99999, 99999 99999, -99999 99999, -99999 -99999))')"
    assert not pruned(plan(big)) and "cell#" not in plan(big)
    assert ids(big) == scan_ids(big)
    # refusal: RTREE needs a varchar (WKT) field
    with pytest.raises(ValueError, match="WKT varchar"):
        client.create_index("rt", "event_id", "RTREE")
    client.drop_collection("rt")
