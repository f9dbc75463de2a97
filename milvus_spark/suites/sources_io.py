"""Bulk-import suite: file-based load parity with the reference's
importutilv2 readers (internal/util/importutilv2/{json,csv,parquet,numpy}/,
internal/proxy/task_import.go).

The registered query round-trips a deterministic slice of ``orders`` through
JSON and CSV files written to a scratch dir, imports both back through
sources/bulk_import.py (schema cast + CSV array convention), and returns the
union — which must hash-match the slice selected directly from the parquet
table. Parquet and numpy readers are covered by tests/test_sources.py.
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from milvus_spark.registry import register
from milvus_spark.scratch import mkdtemp as scratch_mkdtemp
from milvus_spark.session import load_table

_SCRATCH = "/root/repo/_scratch"

_SCHEMA = T.StructType(
    [
        T.StructField("o_orderkey", T.LongType()),
        T.StructField("o_custkey", T.LongType()),
        T.StructField("o_orderstatus", T.StringType()),
        T.StructField("o_totalprice", T.DoubleType()),
    ]
)


@register(
    "src_bulk_import",
    oracle="""
    SELECT o_orderkey, o_custkey, o_orderstatus,
           round(o_totalprice, 2) AS o_totalprice
    FROM orders WHERE o_orderkey % 10 = 3
    """,
)
def src_bulk_import(spark: SparkSession, sf: str) -> DataFrame:
    """JSON + CSV bulk import round-trip (importutilv2/{json,csv}/). Half the
    slice travels as JSON lines, half as headered CSV; both are imported with
    an explicit schema cast (proxy-side validation analog) and unioned. At
    cluster scale this is a plain distributed ``spark.read`` — no driver-side
    row handling anywhere."""
    from milvus_spark.sources.bulk_import import read_csv, read_json

    os.makedirs(_SCRATCH, exist_ok=True)
    base = scratch_mkdtemp("imp_")
    o = load_table(spark, sf, "orders").select(
        "o_orderkey", "o_custkey", "o_orderstatus",
        F.round("o_totalprice", 2).alias("o_totalprice"),
    )
    json_dir = os.path.join(base, "json")
    csv_dir = os.path.join(base, "csv")
    o.filter(F.col("o_orderkey") % 20 == 3).write.mode("overwrite").json(json_dir)
    o.filter(F.col("o_orderkey") % 20 == 13).write.option("header", "true").mode(
        "overwrite"
    ).csv(csv_dir)
    return read_json(spark, json_dir, _SCHEMA).unionByName(
        read_csv(spark, csv_dir, _SCHEMA)
    )
