"""Streaming ingest: WAL drop-dir → micro-batch segments → MVCC reads, plus
watermarked windowed aggregation over the events stream."""

from __future__ import annotations

import os
import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from milvus_spark.operators.lifecycle import Collection
from milvus_spark.streaming.ingest import run_available_now, stream_ingest, windowed_counts


@pytest.fixture()
def scratch():
    d = tempfile.mkdtemp(prefix="stream_", dir="/root/repo/_scratch")
    yield d
    shutil.rmtree(d, ignore_errors=True)


def test_stream_ingest_into_collection(spark, sf_dir, scratch):
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    src = os.path.join(scratch, "wal")
    os.makedirs(src)
    # two WAL "messages" (files) land before the stream drains
    orders.filter("o_orderkey % 2 = 0").write.parquet(os.path.join(src, "f1.parquet"))
    orders.filter("o_orderkey % 2 = 1").write.parquet(os.path.join(src, "f2.parquet"))

    coll = Collection(spark, os.path.join(scratch, "coll"), pk="o_orderkey")
    schema = orders.schema.simpleString()[7:-1].replace(":", " ").replace(",", ", ")
    q = stream_ingest(
        spark, src + "/*", schema, coll,
        checkpoint=os.path.join(scratch, "ckpt"),
    )
    run_available_now(q)  # Strong-consistency barrier

    assert coll.count() == orders.count()
    # MVCC: _ts stamped per micro-batch, monotonically from 1
    ts_vals = sorted(r[0] for r in coll.read().select("_ts").distinct().collect())
    assert ts_vals[0] >= 1


def test_windowed_counts_batch_equiv(spark, sf_dir):
    """Watermark/window semantics validated on the events table (batch mode:
    same API, deterministic result)."""
    from milvus_spark.session import load_table

    e = load_table(spark, sf_dir, "events")
    win = (
        e.groupBy(F.window("ts", "1 day"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    total = win.agg(F.sum("n")).collect()[0][0]
    assert total == e.count()
