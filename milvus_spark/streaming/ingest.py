"""Structured-Streaming ingest into a Collection: the WAL / growing-segment
lifecycle re-expressed on Spark.

Reference parity (file:line into /root/reference):
  - Per-shard WAL with timetick ordering: internal/streamingnode/server/wal/,
    docs/developer_guides/chap04_message_stream.md → here the stream source
    (file drop-dir, or Kafka in production) is the WAL; micro-batch id is the
    timetick.
  - Growing segments appended by the querynode pipeline
    (internal/querynodev2/pipeline/{filter_node,insert_node}.go) → each
    micro-batch appends a parquet segment stamped ``_ts = batch_id + base``.
  - GuaranteeTs / consistency levels (docs/developer_guides/
    how-guarantee-ts-works.md:48-71): Strong = read after the stream has
    consumed up to the write's ts → here ``collection.read(as_of=ts)`` after
    ``awaitTermination``/``processAllAvailable``; Bounded/Eventually = read
    whatever segments exist (no wait).
  - Flush/seal by size (component_param.go:5605-5630) → compaction job
    (Collection.compact) folds small micro-batch segments, the same
    growing → sealed transition.

Windowed/watermarked aggregation over the ingest stream (late-data handling)
is exposed via ``windowed_counts`` — Milvus itself has no windowed compute
(SURVEY §2.6); this is the Spark-native extension point.
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from milvus_spark.operators.lifecycle import TS_COL, Collection


def stream_ingest(
    spark: SparkSession,
    source_dir: str,
    schema: str,
    collection: Collection,
    base_ts: int = 0,
    checkpoint: Optional[str] = None,
    fmt: str = "parquet",
    available_now: bool = True,
):
    """Tail a drop-directory into the collection; one segment per micro-batch.

    ``available_now=True`` drains everything currently in the source and
    terminates (the Strong-consistency barrier ``run_available_now`` waits
    on); ``False`` keeps tailing until the caller stops the query.

    The sink is IDEMPOTENT under foreachBatch's at-least-once retries: a
    batch writes to a staging dir keyed by batch_id and its files move into
    the segment dir under batch-prefixed names, replacing any partial copy a
    crashed attempt left — a replayed micro-batch overwrites itself instead
    of appending duplicate rows (the WAL redelivery / segment dedup rule).
    """
    import glob
    import os
    import shutil

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        ts = base_ts + int(batch_id) + 1
        staging = os.path.join(collection.path, "_ingest_staging", f"b{batch_id}")
        w = batch_df.withColumn(TS_COL, F.lit(int(ts)).cast("long")).write.mode(
            "overwrite"
        )
        if collection.partition_key:
            # keep the hive layout Collection.append uses — a flat file at
            # the segment root would mix directory depths and break
            # partition discovery on the next read
            w = w.partitionBy(collection.partition_key)
        w.parquet(staging)
        os.makedirs(collection.seg_dir, exist_ok=True)
        prefix = f"ingest-b{batch_id}-"
        for old in glob.glob(
            os.path.join(collection.seg_dir, "**", prefix + "*"), recursive=True
        ):
            os.remove(old)  # a previous (partial) attempt of this batch
        for i, f in enumerate(
            sorted(
                glob.glob(
                    os.path.join(staging, "**", "part-*.parquet"), recursive=True
                )
            )
        ):
            # preserve the hive leaf dirs (key=value/...) under seg_dir
            rel_dir = os.path.relpath(os.path.dirname(f), staging)
            dst_dir = (
                collection.seg_dir
                if rel_dir == "."
                else os.path.join(collection.seg_dir, rel_dir)
            )
            os.makedirs(dst_dir, exist_ok=True)
            os.replace(f, os.path.join(dst_dir, f"{prefix}{i}.parquet"))
        shutil.rmtree(staging, ignore_errors=True)

    reader = spark.readStream.format(fmt).schema(schema)
    src = reader.load(source_dir)
    writer = src.writeStream.foreachBatch(sink)
    if checkpoint:
        writer = writer.option("checkpointLocation", checkpoint)
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def run_available_now(query) -> None:
    """Drain everything currently in the source, then stop (Strong-consistency
    barrier: after this returns, reads see all pre-existing writes)."""
    query.awaitTermination()


def windowed_counts(
    stream_df: DataFrame,
    ts_col: str,
    window: str = "1 minute",
    watermark: str = "2 minutes",
    keys: Optional[list[str]] = None,
) -> DataFrame:
    """Tumbling-window counts with a late-data watermark over an event stream."""
    keys = keys or []
    return (
        stream_df.withWatermark(ts_col, watermark)
        .groupBy(F.window(F.col(ts_col), window), *keys)
        .agg(F.count(F.lit(1)).alias("n"))
    )
