"""Stateful-streaming suite: materialize an insert/upsert/delete WAL through
the ``applyInPandasWithState`` operator and compare the final visible state
against pure SQL over ``orders``.

WAL timeline (deterministic, derived from orders; arrival order irrelevant —
resolution is by MVCC ts, see streaming/stateful.py):
  ts=1  insert every order with o_orderkey % 3 == 0 (payload = totalprice)
  ts=2  upsert the subset o_orderkey % 30 == 0 with doubled totalprice
  ts=3  delete the subset o_orderkey % 21 == 0

Final visible: pk % 3 == 0 AND pk % 21 != 0; price doubled where pk % 30 == 0.

Reference parity: the querynode ingest pipeline + delete buffer + MVCC
resolution (internal/querynodev2/pipeline/, delegator/deletebuffer/,
segcore/DeletedRecord.h:69) — re-expressed as keyed state in Spark's state
store, sharded by pk like Milvus's shard channels.
"""

from __future__ import annotations

import os
import shutil
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from milvus_spark.registry import register
from milvus_spark.session import load_table
from milvus_spark.streaming.stateful import materialize_wal, read_final_state

_SCRATCH = "/root/repo/_scratch"


def _write_wal(spark: SparkSession, sf: str, root: str) -> str:
    """Three WAL files (one micro-batch each) derived from orders."""
    o = load_table(spark, sf, "orders").filter(F.col("o_orderkey") % 3 == 0)
    wal = os.path.join(root, "wal")

    def rec(df: DataFrame, op: str, ts: int, price_col) -> DataFrame:
        payload = (
            F.lit(None).cast("string")
            if price_col is None
            else F.to_json(F.struct(price_col.alias("price")))
        )
        return df.select(
            F.col("o_orderkey").alias("pk"),
            F.lit(op).alias("op"),
            F.lit(ts).cast("bigint").alias("ts"),
            payload.alias("payload"),
        )

    rec(o, "insert", 1, F.col("o_totalprice")).write.parquet(
        os.path.join(wal, "b1.parquet")
    )
    rec(
        o.filter(F.col("o_orderkey") % 30 == 0), "upsert", 2, F.col("o_totalprice") * 2
    ).write.parquet(os.path.join(wal, "b2.parquet"))
    rec(o.filter(F.col("o_orderkey") % 21 == 0), "delete", 3, None).write.parquet(
        os.path.join(wal, "b3.parquet")
    )
    return wal


def run_wal_pipeline(spark: SparkSession, sf: str) -> DataFrame:
    """Build WAL → stateful stream → final-state DataFrame (pk, price)."""
    os.makedirs(_SCRATCH, exist_ok=True)
    root = tempfile.mkdtemp(prefix="stateful_", dir=_SCRATCH)
    shutil.rmtree(root)
    os.makedirs(root)
    wal = _write_wal(spark, sf, root)
    out = os.path.join(root, "state")
    materialize_wal(spark, wal + "/*", out, os.path.join(root, "ckpt"))
    final = read_final_state(spark, out)
    return final.select(
        F.col("pk").alias("o_orderkey"),
        F.round(F.get_json_object("payload", "$.price").cast("double"), 4).alias(
            "price"
        ),
    )


@register(
    "stream_upsert_state",
    oracle="""
    SELECT o_orderkey,
           round(CASE WHEN o_orderkey % 30 = 0 THEN o_totalprice * 2
                      ELSE o_totalprice END, 4) AS price
    FROM orders
    WHERE o_orderkey % 3 = 0 AND o_orderkey % 21 <> 0
    """,
)
def stream_upsert_state(spark: SparkSession, sf: str) -> DataFrame:
    return run_wal_pipeline(spark, sf)
