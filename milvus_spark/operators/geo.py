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

import numpy as np
import pandas as pd
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


def rtree_cell(x: Column, y: Column, cell_size: float) -> Column:
    """Grid-cell key for the RTREE index artifact: floor-quantized (x, y)
    as a 'cx_cy' string — the same arithmetic the dispatch replays
    driver-side, so a query bbox prunes whole cell DIRECTORIES at file
    listing (the R-tree node-skip analog in a columnar layout)."""
    return F.concat_ws(
        "_",
        F.floor(x / F.lit(cell_size)).cast("long"),
        F.floor(y / F.lit(cell_size)).cast("long"),
    )


def build_rtree(
    df, field: str, pk: str, cell_size: float = 8.0
):
    """(cell, <field>, id) — one row per row whose WKT parses to a POINT.
    The geometry string persists VERBATIM under its own column name, so
    dispatch re-runs the exact compiled GIS predicate on the pruned
    artifact (no semantics re-derivation). Unparseable/NULL geometry is
    unindexable by design: every GIS predicate is NULL on it."""
    g = F.col(field)
    x, y = wkt_x(g), wkt_y(g)
    return (
        df.filter(x.isNotNull() & y.isNotNull())
        .select(
            rtree_cell(x, y, cell_size).alias("cell"),
            g.alias(field),
            F.col(pk).cast("long").alias("id"),
        )
    )


def rtree_query_bbox(fn: str, kind: str, val, r=None):
    """Query-geometry bounding box (x0, x1, y0, y1) for an indexable GIS
    filter, or None when the shape can't bound candidates (e.g. a
    negated/unbounded predicate)."""
    if kind == "POINT":
        lx, ly = val
        pad = float(r) if r is not None else 0.0
        return lx - pad, lx + pad, ly - pad, ly + pad
    xs, ys = [p[0] for p in val], [p[1] for p in val]
    if fn == "st_dwithin":
        return None  # dwithin vs polygon literal is refused upstream
    return min(xs), max(xs), min(ys), max(ys)


def rtree_cells_for_bbox(
    bbox, cell_size: float, cap: int = 1024
):
    """Cell keys overlapping the bbox — the driver-side twin of
    rtree_cell. None when the bbox covers more than ``cap`` cells (the
    prune would enumerate too many directories; dispatch falls back to
    the scan, exactly an R-tree degenerating on a window covering the
    whole space)."""
    import math

    x0, x1, y0, y1 = bbox
    cx0, cx1 = math.floor(x0 / cell_size), math.floor(x1 / cell_size)
    cy0, cy1 = math.floor(y0 / cell_size), math.floor(y1 / cell_size)
    n = (cx1 - cx0 + 1) * (cy1 - cy0 + 1)
    if n <= 0 or n > cap:
        return None
    return [
        f"{cx}_{cy}"
        for cx in range(cx0, cx1 + 1)
        for cy in range(cy0, cy1 + 1)
    ]


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


# ------------------------------------------------------------------- WKB I/O
# The reference's GEOMETRY type accepts both WKT and WKB on the wire
# (Types.h:24 GEOMETRY; the proxy converts WKB input before storage). Here
# WKT stays the storage/compute format; WKB is an ingest/interchange codec:
# literals decode driver-side at compile time, columns decode through an
# Arrow-batched pandas UDF (numpy-vectorized fast path for the dominant
# little-endian point layout — never per-row Python in the hot loop).

_WKB_POINT = 1
_WKB_POLYGON = 3


def parse_wkb(b) -> str:
    """Decode a WKB value (bytes or hex string) → WKT text.

    Supports POINT and POLYGON (outer ring only, matching parse_wkt's
    surface), both byte orders. Raises ValueError on malformed input —
    ingest should fail loudly, not store garbage."""
    import struct

    if isinstance(b, str):
        b = bytes.fromhex(b)
    if len(b) < 5:
        raise ValueError("WKB too short")
    bo = "<" if b[0] == 1 else (">" if b[0] == 0 else None)
    if bo is None:
        raise ValueError(f"bad WKB byte-order flag {b[0]!r}")
    (gtype,) = struct.unpack_from(bo + "I", b, 1)
    if gtype == _WKB_POINT:
        if len(b) != 21:
            raise ValueError(f"WKB point must be 21 bytes, got {len(b)}")
        x, y = struct.unpack_from(bo + "dd", b, 5)
        return f"POINT ({_fmt_coord(x)} {_fmt_coord(y)})"
    if gtype == _WKB_POLYGON:
        (nrings,) = struct.unpack_from(bo + "I", b, 5)
        if nrings < 1:
            raise ValueError("WKB polygon with no rings")
        off = 9
        rings = []
        for _ in range(nrings):
            (npts,) = struct.unpack_from(bo + "I", b, off)
            off += 4
            pts = struct.unpack_from(bo + "d" * (2 * npts), b, off)
            off += 16 * npts
            ring = ", ".join(
                f"{_fmt_coord(pts[2 * i])} {_fmt_coord(pts[2 * i + 1])}"
                for i in range(npts)
            )
            rings.append(f"({ring})")
        return f"POLYGON ({', '.join(rings)})"
    raise ValueError(f"unsupported WKB geometry type {gtype}")


def _fmt_coord(v: float) -> str:
    """Canonical coordinate text: integral values print without '.0' (the
    compact WKT the suites/storage use), everything else via repr (shortest
    round-trip form)."""
    return str(int(v)) if float(v).is_integer() else repr(float(v))


def parse_geom_literal(s: str) -> tuple[str, object]:
    """Parse a geometry literal that may be WKT text or WKB hex."""
    t = s.strip()
    if re.fullmatch(r"(?:00|01)[0-9a-fA-F]{8,}", t):
        return parse_wkt(parse_wkb(t))
    return parse_wkt(t)


def wkb_point_encode(x: "Column", y: "Column") -> "Column":
    """(x, y) double columns → 21-byte little-endian WKB POINT (binary).

    numpy-vectorized inside an Arrow-batched pandas UDF: the doubles are
    reinterpreted as bytes with a view, no per-row struct packing."""
    @F.pandas_udf("binary")
    def _enc(xs: pd.Series, ys: pd.Series) -> pd.Series:
        n = len(xs)
        if xs.isna().any() or ys.isna().any():
            # fail loudly — a NULL coordinate would otherwise encode as a
            # valid-looking 'POINT (nan nan)' blob (the ingest contract)
            raise ValueError("wkb_point_encode: NULL coordinate in batch")
        buf = np.zeros((n, 21), dtype=np.uint8)
        buf[:, 0] = 1  # little-endian
        buf[:, 1] = _WKB_POINT  # type word 01 00 00 00
        buf[:, 5:13] = (
            np.ascontiguousarray(xs.to_numpy(np.float64)).view(np.uint8).reshape(n, 8)
        )
        buf[:, 13:21] = (
            np.ascontiguousarray(ys.to_numpy(np.float64)).view(np.uint8).reshape(n, 8)
        )
        return pd.Series(list(buf.tobytes()[i * 21 : (i + 1) * 21] for i in range(n)))

    return _enc(x, y)


def wkb_decode_wkt(col: "Column") -> "Column":
    """WKB binary column → WKT string column (NULL on malformed input).

    Fast path: when a batch is all 21-byte little-endian points (the
    dominant shape), decode is one numpy reshape + two float64 views;
    otherwise fall back to per-row parse_wkb (still Arrow-batched)."""
    @F.pandas_udf("string")
    def _dec(bs: pd.Series) -> pd.Series:
        vals = bs.tolist()
        if vals and all(
            v is not None
            and len(v) == 21
            and v[0] == 1
            and bytes(v[1:5]) == b"\x01\x00\x00\x00"  # type word must be POINT
            for v in vals
        ):
            arr = np.frombuffer(b"".join(vals), dtype=np.uint8).reshape(len(vals), 21)
            xs = arr[:, 5:13].copy().view(np.float64).ravel()
            ys = arr[:, 13:21].copy().view(np.float64).ravel()
            return pd.Series(
                [f"POINT ({_fmt_coord(x)} {_fmt_coord(y)})" for x, y in zip(xs, ys)]
            )
        out = []
        for v in vals:
            if v is None:
                out.append(None)
                continue
            try:
                out.append(parse_wkb(bytes(v)))
            except ValueError:
                out.append(None)
        return pd.Series(out, dtype=object)

    return _dec(col)
