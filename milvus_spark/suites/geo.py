"""GEOMETRY operators over WKT columns (GIS filter functions).

Reference parity (file:line into /root/reference):
  - GEOMETRY type (WKT/WKB): Types.h:24 (GEOMETRY 24).
  - st_equals/touches/overlaps/crosses/contains/intersects/within/dwithin/
    isvalid: Plan.g4:42-44, GISFunctionFilterExpr plan.proto:196,
    internal/core/src/exec/expression/GISFunctionFilterExpr.cpp (617);
    RTree index internal/core/src/index/RTreeIndex.cpp.

The test tables carry no geometry column, so points are derived
deterministically from ``events`` (x = value, y = user_id % 100) and encoded
as WKT — exercising the real storage format. Point-vs-point and
point-vs-rectangle predicates (dwithin / within / intersects-bbox) are pure
column math after a regexp parse of the WKT — all JVM-side; no UDF. Complex
polygon predicates at scale would use the same shape with a shapely pandas
UDF plus a bbox pre-filter (the RTree analog: min/max pruning on x/y).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from milvus_spark.operators.geo import st_contains_point, wkt_x, wkt_y
from milvus_spark.registry import register
from milvus_spark.session import load_table


def _points(spark: SparkSession, sf: str) -> DataFrame:
    e = load_table(spark, sf, "events")
    wkt = F.concat(
        F.lit("POINT ("),
        F.round(F.col("value"), 3).cast("string"),
        F.lit(" "),
        (F.col("user_id") % 100).cast("string"),
        F.lit(")"),
    )
    return e.select("event_id", wkt.alias("geom"))


_SQL_PT = """
    pts AS (
      SELECT event_id,
             'POINT (' || round(value, 3)::VARCHAR || ' ' || (user_id % 100)::VARCHAR || ')' AS geom,
             round(value, 3) AS x, CAST(user_id % 100 AS DOUBLE) AS y
      FROM events
    )
"""


# --- st_within: point inside rectangle ----------------------------------------
@register(
    "geo_st_within",
    oracle=f"""
    WITH {_SQL_PT}
    SELECT event_id, geom
    FROM pts
    WHERE x >= 10 AND x <= 60 AND y >= 20 AND y <= 45
    """,
)
def geo_st_within(spark: SparkSession, sf: str) -> DataFrame:
    """st_within(geom, 'POLYGON((10 20, 60 20, 60 45, 10 45, 10 20))') —
    rectangle containment compiled to range predicates (RTree-prunable)."""
    p = _points(spark, sf)
    x, y = wkt_x(F.col("geom")), wkt_y(F.col("geom"))
    return p.filter((x >= 10) & (x <= 60) & (y >= 20) & (y <= 45)).select("event_id", "geom")


# --- st_dwithin: distance to a fixed point ------------------------------------
@register(
    "geo_st_dwithin",
    oracle=f"""
    WITH {_SQL_PT}
    SELECT event_id, round(sqrt((x - 50)^2 + (y - 50)^2), 4) AS dist
    FROM pts
    WHERE sqrt((x - 50)^2 + (y - 50)^2) < 12.5
    """,
)
def geo_st_dwithin(spark: SparkSession, sf: str) -> DataFrame:
    """st_dwithin(geom, 'POINT (50 50)', 12.5)."""
    p = _points(spark, sf)
    x, y = wkt_x(F.col("geom")), wkt_y(F.col("geom"))
    d = F.sqrt(F.pow(x - 50, F.lit(2)) + F.pow(y - 50, F.lit(2)))
    return p.filter(d < 12.5).select("event_id", F.round(d, 4).alias("dist"))


# --- st_isvalid + st_equals ----------------------------------------------------
@register(
    "geo_st_equals_count",
    oracle=f"""
    WITH {_SQL_PT}
    SELECT CAST(count(*) AS BIGINT) AS n_valid,
           CAST(sum(CASE WHEN geom = 'POINT (50.0 50)' THEN 1 ELSE 0 END) AS BIGINT) AS n_eq
    FROM pts
    WHERE regexp_matches(geom, '^POINT \\([-0-9.]+ [-0-9.]+\\)$')
    """,
)
def geo_st_equals_count(spark: SparkSession, sf: str) -> DataFrame:
    """st_isvalid(geom) count + st_equals(geom, fixed point) count."""
    p = _points(spark, sf)
    valid = F.col("geom").rlike(r"^POINT \([-0-9.]+ [-0-9.]+\)$")
    return p.filter(valid).agg(
        F.count(F.lit(1)).alias("n_valid"),
        F.sum(F.when(F.col("geom") == "POINT (50.0 50)", 1).otherwise(0)).alias("n_eq"),
    )

# --- st_contains / st_intersects: concave polygon, ray casting -----------------
# Concave pentagon (notch at (250, 40)). Stored as an edge array literal; the
# crossing-number test runs entirely JVM-side via F.aggregate over the edges —
# no UDF, no shuffle, and the polygon bbox pre-filter is a plain range
# predicate that parquet min/max pruning can use (the RTree analog,
# internal/core/src/index/RTreeIndex.cpp).
_POLY = [(100.0, 10.0), (400.0, 10.0), (400.0, 80.0), (250.0, 40.0), (100.0, 80.0)]


def _poly_edges_col() -> Column:
    from milvus_spark.operators.geo import poly_edges_col

    return poly_edges_col(_POLY)


_SQL_EDGES = """
    edges AS (
      SELECT * FROM (VALUES
        (100.0, 10.0, 400.0, 10.0),
        (400.0, 10.0, 400.0, 80.0),
        (400.0, 80.0, 250.0, 40.0),
        (250.0, 40.0, 100.0, 80.0),
        (100.0, 80.0, 100.0, 10.0)
      ) AS t(ax, ay, bx, by)
    )
"""


@register(
    "geo_st_contains_poly",
    oracle=f"""
    WITH {_SQL_PT}, {_SQL_EDGES}
    SELECT p.event_id, p.geom
    FROM pts p
    WHERE (SELECT count(*) FROM edges e
           WHERE ((e.ay > p.y) != (e.by > p.y))
             AND p.x < (e.bx - e.ax) * (p.y - e.ay) / (e.by - e.ay) + e.ax) % 2 = 1
    """,
)
def geo_st_contains_poly(spark: SparkSession, sf: str) -> DataFrame:
    """st_contains('POLYGON((100 10,400 10,400 80,250 40,100 80,100 10))', geom)
    over a concave polygon — crossing-number test, fully JVM-side."""
    p = _points(spark, sf)
    x, y = wkt_x(F.col("geom")), wkt_y(F.col("geom"))
    # bbox pre-filter: cheap range predicate Catalyst pushes to the scan;
    # the exact ray-cast runs only on bbox survivors.
    bbox = (x >= 100) & (x <= 400) & (y >= 10) & (y <= 80)
    return (
        p.filter(bbox & st_contains_point(_poly_edges_col(), x, y))
        .select("event_id", "geom")
    )


# --- st_crosses: segment vs line -----------------------------------------------
@register(
    "geo_st_crosses_line",
    oracle=f"""
    WITH {_SQL_PT}
    SELECT event_id, x AS x1, x + 20 AS x2
    FROM pts
    WHERE (x - 100) * (x + 20 - 100) < 0
    """,
)
def geo_st_crosses_line(spark: SparkSession, sf: str) -> DataFrame:
    """st_crosses(LINESTRING(x y, x+20 y-10), LINESTRING(100 -1e3, 100 1e3)):
    a segment crosses a vertical line iff its endpoints' signed offsets to the
    line have opposite signs (interiors intersect in a point, DE-9IM 0*T)."""
    p = _points(spark, sf)
    x = wkt_x(F.col("geom"))
    x2 = x + 20
    return (
        p.filter((x - 100) * (x2 - 100) < 0)
        .select("event_id", x.alias("x1"), x2.alias("x2"))
    )


# --- st_overlaps + st_touches: bbox vs fixed rectangle -------------------------
@register(
    "geo_st_overlaps_touches",
    oracle=f"""
    WITH {_SQL_PT},
    boxes AS (
      SELECT event_id, CAST(floor(x) AS BIGINT) AS xi, CAST(y AS BIGINT) AS yi FROM pts
    )
    SELECT
      CAST(sum(CASE WHEN xi < 280 AND xi + 10 > 260 AND yi < 45 AND yi + 10 > 20
                     AND NOT (xi >= 260 AND xi + 10 <= 280 AND yi >= 20 AND yi + 10 <= 45)
               THEN 1 ELSE 0 END) AS BIGINT) AS n_overlaps,
      CAST(sum(CASE WHEN ((xi + 10 = 260 OR xi = 280) AND yi <= 45 AND yi + 10 >= 20)
                      OR ((yi + 10 = 20 OR yi = 45) AND xi <= 280 AND xi + 10 >= 260)
               THEN 1 ELSE 0 END) AS BIGINT) AS n_touches
    FROM boxes
    """,
)
def geo_st_overlaps_touches(spark: SparkSession, sf: str) -> DataFrame:
    """st_overlaps / st_touches between a per-event integer bbox
    [floor(x), floor(x)+10] x [y, y+10] and the fixed rect [260,280]x[20,45].
    DE-9IM: overlaps = interiors intersect, neither contains the other;
    touches = boundaries meet, interiors disjoint. Pure interval arithmetic."""
    p = _points(spark, sf)
    xi = F.floor(wkt_x(F.col("geom"))).cast("long")
    yi = wkt_y(F.col("geom")).cast("long")
    interiors = (xi < 280) & (xi + 10 > 260) & (yi < 45) & (yi + 10 > 20)
    a_in_b = (xi >= 260) & (xi + 10 <= 280) & (yi >= 20) & (yi + 10 <= 45)
    overlaps = interiors & ~a_in_b
    touches = (((xi + 10 == 260) | (xi == 280)) & (yi <= 45) & (yi + 10 >= 20)) | (
        ((yi + 10 == 20) | (yi == 45)) & (xi <= 280) & (xi + 10 >= 260)
    )
    return p.agg(
        F.sum(F.when(overlaps, 1).otherwise(0)).alias("n_overlaps"),
        F.sum(F.when(touches, 1).otherwise(0)).alias("n_touches"),
    )


# --- pairwise st_dwithin self-join with grid pruning (RTree-at-scale analog) --
_R = 2.0


@register(
    "geo_grid_join_dwithin",
    oracle=f"""
    WITH {_SQL_PT}
    SELECT a.event_id AS a_id, b.event_id AS b_id,
           round(sqrt((a.x - b.x)^2 + (a.y - b.y)^2), 4) AS dist
    FROM pts a JOIN pts b
      ON b.x BETWEEN a.x - {_R} AND a.x + {_R}
     AND b.y BETWEEN a.y - {_R} AND a.y + {_R}
     AND a.event_id < b.event_id
    WHERE sqrt((a.x - b.x)^2 + (a.y - b.y)^2) < {_R}
    """,
)
def geo_grid_join_dwithin(spark: SparkSession, sf: str) -> DataFrame:
    """All point pairs within distance r — the pairwise spatial join that an
    RTree index serves in the reference (index/RTreeIndex.cpp; GISFunction
    st_dwithin). Scale shape: each point gets a home grid cell of side r;
    one side is replicated to its 3x3 neighbor cells (bounded 9x fan-out)
    and equi-joined on the cell key, so the O(n^2) cross join becomes a
    shuffle on cell ids with per-cell-density work — the data-parallel
    equivalent of an RTree range probe. Exact distance then filters
    candidates, so the result is EXACT (the oracle is a brute-force band
    join). At 100 TB the corpus would be written partitionBy(cell) so the
    equi-join co-locates without a shuffle."""
    p = _points(spark, sf)
    x, y = wkt_x(F.col("geom")), wkt_y(F.col("geom"))
    # parse the WKT exactly ONCE: both join sides reuse the cached parsed
    # projection (40 B/row), so the regex never re-runs inside the join's
    # pushed filters/projections. At 100 TB the same idea is persisting
    # the parsed (id, x, y, cell) projection to parquet partitionBy(cell)
    # and equi-joining co-located — parse cost paid once either way.
    base = (
        p.select(
            "event_id", x.alias("x"), y.alias("y"),
            F.floor(x / _R).cast("long").alias("cx"),
            F.floor(y / _R).cast("long").alias("cy"),
        )
        # spread cells across tasks: a single dense input file would
        # otherwise probe every candidate pair in ONE task (the per-cell
        # work is the quadratic part — parallelism must follow cells, not
        # input splits)
        .repartition(spark.sparkContext.defaultParallelism, "cx", "cy")
        .cache()
    )
    nbr = base.select(
        F.col("event_id").alias("a_id"), F.col("x").alias("ax"), F.col("y").alias("ay"),
        F.explode(
            F.array(*[
                F.struct(
                    (F.col("cx") + dx).alias("jx"), (F.col("cy") + dy).alias("jy")
                )
                for dx in (-1, 0, 1) for dy in (-1, 0, 1)
            ])
        ).alias("cell"),
    ).select("a_id", "ax", "ay", F.col("cell.jx").alias("jx"), F.col("cell.jy").alias("jy"))
    pairs = nbr.join(
        base.select(
            F.col("event_id").alias("b_id"), F.col("x").alias("bx"),
            F.col("y").alias("by"), "cx", "cy",
        ),
        (F.col("jx") == F.col("cx")) & (F.col("jy") == F.col("cy"))
        & (F.col("a_id") < F.col("b_id")),
    )
    dist = F.sqrt(
        F.pow(F.col("ax") - F.col("bx"), F.lit(2)) + F.pow(F.col("ay") - F.col("by"), F.lit(2))
    )
    return pairs.filter(dist < _R).select(
        "a_id", "b_id", F.round(dist, 4).alias("dist")
    )


# --- GIS functions through the FILTER LANGUAGE ---------------------------------
@register(
    "geo_expr_language",
    oracle=f"""
    WITH {_SQL_PT}
    SELECT event_id, geom
    FROM pts
    WHERE regexp_matches(geom, '^POINT \\([-0-9.]+ [-0-9.]+\\)$')
      AND (SELECT count(*) FROM (VALUES
            (100.0, 10.0, 400.0, 10.0),
            (400.0, 10.0, 400.0, 80.0),
            (400.0, 80.0, 250.0, 40.0),
            (250.0, 40.0, 100.0, 80.0),
            (100.0, 80.0, 100.0, 10.0)
          ) AS e(ax, ay, bx, by)
          WHERE ((e.ay > y) != (e.by > y))
            AND x < (e.bx - e.ax) * (y - e.ay) / (e.by - e.ay) + e.ax) % 2 = 1
      AND NOT EXISTS (SELECT 1 FROM (VALUES
            (100.0, 10.0, 400.0, 10.0),
            (400.0, 10.0, 400.0, 80.0),
            (400.0, 80.0, 250.0, 40.0),
            (250.0, 40.0, 100.0, 80.0),
            (100.0, 80.0, 100.0, 10.0)
          ) AS b(ax, ay, bx, by)
          WHERE abs((b.bx - b.ax) * (y - b.ay) - (b.by - b.ay) * (x - b.ax)) <= 1e-9
            AND x >= least(b.ax, b.bx) AND x <= greatest(b.ax, b.bx)
            AND y >= least(b.ay, b.by) AND y <= greatest(b.ay, b.by))
      AND NOT sqrt((x - 250)^2 + (y - 30)^2) < 5
    """,
)
def geo_expr_language(spark: SparkSession, sf: str) -> DataFrame:
    """The same GIS predicates, but compiled FROM THE FILTER STRING — the
    user-facing surface (Plan.g4:124-132 st_* inside boolean exprs, AND/NOT
    composition via GISConjunctExpr.cpp). The expression compiler parses the
    WKT literals once, emits bbox range predicates plus the crossing-number
    test as Catalyst columns — identical plan to the hand-built suite
    queries, so the language adds zero execution cost."""
    from milvus_spark.plans.expr import compile_expr

    p = _points(spark, sf)
    cond = compile_expr(
        "st_isvalid(geom) and "
        'st_within(geom, "POLYGON((100 10, 400 10, 400 80, 250 40, 100 80, 100 10))") '
        'and not st_dwithin(geom, "POINT (250 30)", 5)',
        p.schema,
    )
    return p.filter(cond).select("event_id", "geom")


# --- WKB ingest roundtrip -----------------------------------------------------
@register(
    "geo_wkb_roundtrip",
    oracle="""
    SELECT event_id,
           round(value, 3) AS x_rt,
           CAST(user_id % 100 AS DOUBLE) AS y_rt,
           CAST(21 AS BIGINT) AS wkb_len,
           '01' AS wkb_bo
    FROM events
    """,
)
def geo_wkb_roundtrip(spark: SparkSession, sf: str) -> DataFrame:
    """WKB codec roundtrip (GEOMETRY accepts WKT and WKB: Types.h:24).

    Coordinates → 21-byte little-endian WKB POINT (numpy-vectorized pandas
    UDF) → decoded back to WKT → coordinates re-extracted JVM-side. IEEE
    doubles survive bytes→repr→parse exactly, so the oracle is simply the
    source coordinates — any codec asymmetry (endianness, offset, float
    formatting) breaks the hash. wkb_len/wkb_bo pin the physical layout."""
    from milvus_spark.operators.geo import (
        wkb_decode_wkt,
        wkb_point_encode,
        wkt_x,
        wkt_y,
    )

    e = load_table(spark, sf, "events")
    pts = e.select(
        "event_id",
        F.round("value", 3).alias("x"),
        (F.col("user_id") % 100).cast("double").alias("y"),
    )
    wkb = pts.withColumn("wkb", wkb_point_encode(F.col("x"), F.col("y")))
    dec = wkb.withColumn("wkt", wkb_decode_wkt(F.col("wkb")))
    return dec.select(
        "event_id",
        wkt_x(F.col("wkt")).alias("x_rt"),
        wkt_y(F.col("wkt")).alias("y_rt"),
        F.length("wkb").cast("long").alias("wkb_len"),
        F.lower(F.hex(F.substring("wkb", 1, 1))).alias("wkb_bo"),
    )


# --- spatial kNN: nearest points to a query location --------------------------
@register(
    "geo_knn_nearest",
    oracle=f"""
    WITH {_SQL_PT},
    scored AS (
      SELECT event_id, geom,
             round(sqrt((x - 30)^2 + (y - 70)^2), 4) + 0 AS dist
      FROM pts
    )
    SELECT event_id, geom, dist, rank FROM (
      SELECT event_id, geom, dist,
             CAST(row_number() OVER (ORDER BY dist, event_id) AS BIGINT) AS rank
      FROM scored
    ) WHERE rank <= 15
    """,
)
def geo_knn_nearest(spark: SparkSession, sf: str) -> DataFrame:
    """Spatial kNN: the 15 nearest points to POINT(30 70) — the geo twin
    of vector top-k (an RTree nearest-neighbor walk in the reference; here
    the same distributed TakeOrdered shape as every other top-k: per-batch
    candidates, ONE bounded merge, no global sort). Ties break on event_id
    over the ROUNDED distance, matching the oracle."""
    p = _points(spark, sf)
    x, y = wkt_x(F.col("geom")), wkt_y(F.col("geom"))
    dist = F.round(F.sqrt((x - 30) * (x - 30) + (y - 70) * (y - 70)), 4) + F.lit(0.0)
    scored = p.select("event_id", "geom", dist.alias("dist"))
    top = scored.orderBy(F.col("dist").asc(), F.col("event_id").asc()).limit(15)
    from pyspark.sql import Window as W

    w = W.partitionBy(F.lit(0)).orderBy(F.col("dist").asc(), F.col("event_id").asc())
    return top.withColumn("rank", F.row_number().over(w).cast("long")).select(
        "event_id", "geom", "dist", "rank"
    )


# --- aggregate geometry: per-user centroid of event points --------------------
@register(
    "geo_centroid_agg",
    oracle=f"""
    WITH {_SQL_PT},
    j AS (
      SELECT p.event_id, p.x, p.y, e.user_id
      FROM pts p JOIN events e USING (event_id)
    )
    SELECT user_id,
           CAST(count(*) AS BIGINT) AS n_points,
           'POINT (' || (round(avg(x), 4) + 0)::VARCHAR || ' '
                     || (round(avg(y), 4) + 0)::VARCHAR || ')' AS centroid
    FROM j
    WHERE user_id < 40
    GROUP BY user_id
    """,
)
def geo_centroid_agg(spark: SparkSession, sf: str) -> DataFrame:
    """ST_Centroid as an AGGREGATE per group: each user's event-point cloud
    collapses to its centroid, emitted as WKT (the same storage format the
    predicates parse). Map-side partial agg on the user key — aggregate
    geometry at 100 TB is just avg()."""
    e = load_table(spark, sf, "events")
    p = _points(spark, sf).join(e.select("event_id", "user_id"), "event_id")
    x, y = wkt_x(F.col("geom")), wkt_y(F.col("geom"))
    agg = (
        p.filter(F.col("user_id") < 40)
        .select("user_id", x.alias("x"), y.alias("y"))
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_points"),
            (F.round(F.avg("x"), 4) + F.lit(0.0)).alias("cx"),
            (F.round(F.avg("y"), 4) + F.lit(0.0)).alias("cy"),
        )
    )
    wkt = F.concat(
        F.lit("POINT ("), F.col("cx").cast("string"), F.lit(" "),
        F.col("cy").cast("string"), F.lit(")"),
    )
    return agg.select("user_id", "n_points", wkt.alias("centroid"))
