"""Shared GEOMETRY primitives: WKT parse/extract + point-in-polygon.

Reference parity (file:line into /root/reference):
  - GEOMETRY type (WKT): Types.h:24; GIS filter functions Plan.g4:124-132,
    GISFunctionFilterExpr plan.proto:196,
    internal/core/src/exec/expression/GISFunctionFilterExpr.cpp.

Geometry literals in filter strings are parsed at COMPILE time (driver-side
Python, once per query); per-row work is pure Catalyst expressions — regexp
coordinate extraction and crossing-number arithmetic, no UDF, so the bbox
range predicates remain pushdown/RTree-prunable.
"""

from __future__ import annotations

import re

from pyspark.sql import Column
from pyspark.sql import functions as F

# number with optional scientific notation; optional space after POINT —
# the extraction surface must accept everything parse_wkt accepts, or valid
# stored WKT silently extracts to NULL and vanishes from results
_NUM = r"[-+]?[0-9]*\.?[0-9]+(?:[eE][-+]?[0-9]+)?"
WKT_POINT_VALID_RE = rf"^POINT ?\({_NUM} {_NUM}\)$"
_X_RE = rf"POINT ?\(({_NUM}) {_NUM}\)"
_Y_RE = rf"POINT ?\({_NUM} ({_NUM})\)"


def wkt_x(geom: Column) -> Column:
    # try_cast: malformed WKT yields NULL (filtered by 3VL), not an ANSI error
    return F.regexp_extract(geom, _X_RE, 1).try_cast("double")


def wkt_y(geom: Column) -> Column:
    return F.regexp_extract(geom, _Y_RE, 1).try_cast("double")


def parse_wkt(s: str) -> tuple[str, object]:
    """Parse a POINT/POLYGON WKT literal → ("POINT", (x, y)) or
    ("POLYGON", [(x, y), ...]) (outer ring, closing vertex dropped)."""
    t = s.strip()
    m = re.fullmatch(r"POINT\s*\(\s*([-0-9.eE]+)\s+([-0-9.eE]+)\s*\)", t, re.I)
    if m:
        return "POINT", (float(m.group(1)), float(m.group(2)))
    m = re.fullmatch(r"POLYGON\s*\(\s*\(\s*([^()]*?)\s*\)\s*(?:,.*)?\)", t, re.I | re.S)
    if m:
        if re.search(r"\)\s*,\s*\(", t):
            # inner ring(s) present — fail with intent, not a float() crash
            raise ValueError(f"polygon holes are not supported: {s!r}")
        pts = []
        for pair in m.group(1).split(","):
            xs, ys = pair.split()
            pts.append((float(xs), float(ys)))
        if len(pts) >= 2 and pts[0] == pts[-1]:
            pts = pts[:-1]
        if len(pts) < 3:
            raise ValueError(f"polygon needs >= 3 distinct vertices: {s!r}")
        return "POLYGON", pts
    raise ValueError(f"unsupported WKT literal: {s!r}")


def poly_edges_col(coords: list[tuple[float, float]]) -> Column:
    """Polygon ring as an array<struct> literal of edges."""
    edges = [(coords[i], coords[(i + 1) % len(coords)]) for i in range(len(coords))]
    return F.array(
        *[
            F.struct(
                F.lit(ax).alias("ax"),
                F.lit(ay).alias("ay"),
                F.lit(bx).alias("bx"),
                F.lit(by).alias("by"),
            )
            for (ax, ay), (bx, by) in edges
        ]
    )


def st_contains_point(poly_edges: Column, x: Column, y: Column) -> Column:
    """Crossing-number point-in-polygon (GISFunctionFilterExpr.cpp st_contains
    semantics for POINT arguments), as a pure Catalyst expression."""
    crossings = F.aggregate(
        poly_edges,
        F.lit(0),
        lambda acc, e: acc
        + F.when(
            ((e["ay"] > y) != (e["by"] > y))
            & (x < (e["bx"] - e["ax"]) * (y - e["ay"]) / (e["by"] - e["ay"]) + e["ax"]),
            F.lit(1),
        ).otherwise(F.lit(0)),
    )
    return crossings % 2 == 1


def point_on_boundary(poly_edges: Column, x: Column, y: Column, eps: float = 1e-9) -> Column:
    """Point lies on some polygon edge: collinear (cross product ~ 0) and
    inside the edge's bbox — the DE-9IM boundary test for POINT operands.

    The collinearity tolerance is RELATIVE: the cross product's float error
    scales with edge length × coordinate magnitude, so a fixed 1e-9 breaks
    for projected-meter coordinates (error ≫ eps) and for micro-scale ones
    (eps ≫ signal)."""
    def on_edge(e):
        cross = (e["bx"] - e["ax"]) * (y - e["ay"]) - (e["by"] - e["ay"]) * (x - e["ax"])
        scale = F.greatest(
            F.lit(1.0),
            F.abs(e["bx"] - e["ax"]) + F.abs(e["by"] - e["ay"]),
        ) * F.greatest(F.lit(1.0), F.abs(x), F.abs(y))
        inx = (x >= F.least(e["ax"], e["bx"])) & (x <= F.greatest(e["ax"], e["bx"]))
        iny = (y >= F.least(e["ay"], e["by"])) & (y <= F.greatest(e["ay"], e["by"]))
        return (F.abs(cross) <= eps * scale) & inx & iny

    return F.exists(poly_edges, on_edge)
