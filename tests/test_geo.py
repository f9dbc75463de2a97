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


def test_wkb_codec_byte_level():
    """parse_wkb decodes POINT/POLYGON in both byte orders; malformed input
    fails loudly (the ingest contract for GEOMETRY, Types.h:24)."""
    import struct

    import pytest

    from milvus_spark.operators.geo import parse_geom_literal, parse_wkb

    le = b"\x01" + struct.pack("<I", 1) + struct.pack("<dd", 12.5, 30)
    be = b"\x00" + struct.pack(">I", 1) + struct.pack(">dd", -3.25, 7)
    assert parse_wkb(le) == "POINT (12.5 30)"
    assert parse_wkb(be) == "POINT (-3.25 7)"
    assert parse_wkb(le.hex()) == "POINT (12.5 30)"
    poly = (
        b"\x01"
        + struct.pack("<I", 3)
        + struct.pack("<I", 1)
        + struct.pack("<I", 4)
        + struct.pack("<" + "d" * 8, 0, 0, 10, 0, 10, 10, 0, 0)
    )
    assert parse_wkb(poly) == "POLYGON ((0 0, 10 0, 10 10, 0 0))"
    for bad in [b"", b"\x02" + le[1:], le[:15], b"\x01" + struct.pack("<I", 9) + b"\x00" * 16]:
        with pytest.raises(ValueError):
            parse_wkb(bad)
    # literal dispatch: WKT text and WKB hex resolve to the same geometry
    assert parse_geom_literal("POINT (12.5 30)") == parse_geom_literal(le.hex())


def test_wkb_literal_in_filter_language(spark, sf_dir):
    """A WKB-hex literal inside st_* compiles to the same predicate as the
    WKT literal (proxy accepts both encodings on the wire)."""
    import struct

    from milvus_spark.plans.expr import compile_expr
    from milvus_spark.registry import QUERIES, load_suites

    load_suites()
    p = QUERIES["geo_st_dwithin"]  # any suite exposing _points-shaped frame
    from milvus_spark.suites.geo import _points

    pts = _points(spark, sf_dir)
    wkb_hex = (b"\x01" + struct.pack("<I", 1) + struct.pack("<dd", 250.0, 30.0)).hex()
    a = pts.filter(
        compile_expr('st_dwithin(geom, "POINT (250 30)", 25)', pts.schema)
    ).count()
    b = pts.filter(
        compile_expr(f'st_dwithin(geom, "{wkb_hex}", 25)', pts.schema)
    ).count()
    assert a == b > 0


def test_wkb_column_roundtrip_spark(spark):
    """Column-level encode/decode: mixed endianness falls back to the
    general decoder; nulls stay null."""
    import struct

    from pyspark.sql import functions as F

    from milvus_spark.operators.geo import wkb_decode_wkt, wkb_point_encode

    df = spark.createDataFrame(
        [(1, 1.5, 2.0), (2, -7.25, 99.0)], "id long, x double, y double"
    )
    out = (
        df.withColumn("wkb", wkb_point_encode(F.col("x"), F.col("y")))
        .withColumn("wkt", wkb_decode_wkt(F.col("wkb")))
        .orderBy("id")
        .collect()
    )
    assert out[0].wkt == "POINT (1.5 2)" and out[1].wkt == "POINT (-7.25 99)"
    be = b"\x00" + struct.pack(">I", 1) + struct.pack(">dd", 5.0, 6.5)
    mixed = spark.createDataFrame([(be,), (None,)], "wkb binary")
    got = [r.wkt for r in mixed.select(wkb_decode_wkt(F.col("wkb")).alias("wkt")).collect()]
    assert got == ["POINT (5 6.5)", None]
