"""GEOMETRY suite: ray-cast point-in-polygon vs a pure-Python reference,
plus a plan audit that all GIS predicates stay JVM-side (no UDFs)."""

from __future__ import annotations

from pyspark.sql import functions as F

from milvus_spark.suites.geo import _POLY, _poly_edges_col, st_contains_point

_EDGES = [(_POLY[i], _POLY[(i + 1) % len(_POLY)]) for i in range(len(_POLY))]
from tests.test_plans import plan_of


def _py_contains(x: float, y: float) -> bool:
    inside = False
    for (ax, ay), (bx, by) in _EDGES:
        if (ay > y) != (by > y) and x < (bx - ax) * (y - ay) / (by - ay) + ax:
            inside = not inside
    return inside


def test_ray_cast_matches_python_reference(spark):
    # grid over the polygon bbox plus points outside it, incl. the concave notch
    pts = [
        (float(x), float(y))
        for x in range(80, 421, 20)
        for y in range(0, 91, 10)
    ]
    df = spark.createDataFrame(pts, "x double, y double")
    got = {
        (r["x"], r["y"]): r["inside"]
        for r in df.select(
            "x", "y", st_contains_point(_poly_edges_col(), F.col("x"), F.col("y")).alias("inside")
        ).collect()
    }
    for x, y in pts:
        assert got[(x, y)] == _py_contains(x, y), (x, y)
    # sanity: the notch region above the reflex vertex is outside
    assert not _py_contains(250.0, 70.0)
    assert _py_contains(250.0, 20.0)


def test_geo_queries_are_jvm_only(spark, sf_dir):
    from milvus_spark.registry import QUERIES, load_suites

    load_suites()
    for name in [
        "geo_st_contains_poly",
        "geo_st_crosses_line",
        "geo_st_overlaps_touches",
        "geo_st_within",
        "geo_st_dwithin",
    ]:
        plan = plan_of(QUERIES[name](spark, sf_dir))
        assert "EvalPython" not in plan and "InPandas" not in plan, name
