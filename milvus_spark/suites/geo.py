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

from milvus_spark.registry import register
from milvus_spark.session import load_table

_X_RE = r"POINT \(([-0-9.]+) [-0-9.]+\)"
_Y_RE = r"POINT \([-0-9.]+ ([-0-9.]+)\)"


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


def wkt_x(geom: Column) -> Column:
    return F.regexp_extract(geom, _X_RE, 1).cast("double")


def wkt_y(geom: Column) -> Column:
    return F.regexp_extract(geom, _Y_RE, 1).cast("double")


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
