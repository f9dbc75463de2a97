"""Stateful streaming: per-pk latest-state materialization over an
insert/upsert/delete WAL, via ``applyInPandasWithState``.

This is the Spark-native re-expression of the reference's online mutable
state (SURVEY §2.6 "Stateful ops"):

  - growing-segment per-pk latest rows appended by the querynode pipeline
    (/root/reference/internal/querynodev2/pipeline/{filter_node,insert_node,
    delete_node}.go),
  - the delete buffer that holds (pk, ts) tombstones until they are folded
    into segments (/root/reference/internal/querynodev2/delegator/
    deletebuffer/delete_buffer.go),
  - MVCC resolution: the visible row for a pk is the one with the highest
    timestamp that is not shadowed by a later delete
    (/root/reference/internal/core/src/segcore/DeletedRecord.h:69,
    internal/core/src/exec/operator/MvccNode.cpp:56).

Design for scale: state is keyed by pk and lives in Spark's state store
(HDFS/RocksDB-backed per partition on a real cluster), so the operator
shards horizontally with the shuffle partitioning of the groupBy — the same
shape as Milvus hashing pks to shard channels. Arrival order across
micro-batches does NOT matter: resolution is by the event's ``ts`` (MVCC),
not processing order, so WAL replay / file-source reordering is safe.
"""

from __future__ import annotations

from typing import Iterator, Tuple

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.window import Window

# Input WAL record: (pk, op, ts, payload-json). op ∈ {insert, upsert, delete}.
WAL_SCHEMA = "pk bigint, op string, ts bigint, payload string"
_OUT_SCHEMA = "pk bigint, ts bigint, alive boolean, payload string"
_STATE_SCHEMA = "ts bigint, alive boolean, payload string"


def _fold_latest(
    key: Tuple,
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    """Keep the max-ts record per pk; equal-ts insert/delete ties resolve
    deterministically with the INSERT winning — the same rule as the batch
    read path (lifecycle.py: a tombstone kills only rows with _ts strictly
    below it, which is what makes upsert's delete-then-insert at one ts
    atomic). Arrival order must never decide state (order independence)."""
    if state.exists:
        ts, alive, payload = state.get
    else:
        ts, alive, payload = -1, False, None
    for pdf in pdfs:
        if pdf.empty:
            continue
        # order by (ts, op-priority): delete sorts BELOW insert/upsert at the
        # same ts, so the last row after a stable sort is the winner under
        # the insert-beats-equal-ts-delete rule
        pdf = pdf.assign(_del=(pdf["op"] == "delete").astype(int))
        pdf = pdf.sort_values(["ts", "_del"], ascending=[True, False], kind="mergesort")
        top = pdf.iloc[-1]
        if int(top["ts"]) > ts or (
            int(top["ts"]) == ts and not alive and top["op"] != "delete"
        ):
            ts = int(top["ts"])
            alive = top["op"] != "delete"
            payload = None if top["payload"] is None else str(top["payload"])
    state.update((ts, alive, payload))
    yield pd.DataFrame(
        [{"pk": key[0], "ts": ts, "alive": alive, "payload": payload}]
    )


def latest_state(wal_stream: DataFrame) -> DataFrame:
    """WAL stream (WAL_SCHEMA) → update-mode stream of current state per pk."""
    return wal_stream.groupBy("pk").applyInPandasWithState(
        _fold_latest,
        outputStructType=_OUT_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def materialize_wal(
    spark: SparkSession,
    wal_glob: str,
    out_dir: str,
    checkpoint: str,
    max_files_per_trigger: int = 1,
) -> None:
    """Drain the WAL directory through the stateful operator; append every
    state update to ``out_dir`` (the sealed-segment analog of the growing
    state). availableNow = Strong-consistency barrier."""
    src = (
        spark.readStream.schema(WAL_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(wal_glob)
    )
    q = (
        latest_state(src)
        .writeStream.outputMode("update")
        .foreachBatch(
            lambda batch, _bid: batch.write.mode("append").parquet(out_dir)
        )
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def read_final_state(spark: SparkSession, out_dir: str) -> DataFrame:
    """Visible rows after the stream: max-ts update per pk, deletes dropped."""
    w = Window.partitionBy("pk").orderBy(F.col("ts").desc())
    return (
        spark.read.parquet(out_dir)
        .withColumn("_rn", F.row_number().over(w))
        .filter((F.col("_rn") == 1) & F.col("alive"))
        .drop("_rn")
    )


def dedup_wal_stream(wal_stream: DataFrame, ts_col: str, watermark: str) -> DataFrame:
    """Exactly-once pk dedup of a WAL stream within a watermark window —
    the insert-path pk dedupe (auto-id uniqueness) of the reference's proxy,
    bounded-state on Spark via dropDuplicatesWithinWatermark.

    ``ts_col`` may be the WAL's bigint tick: watermarking needs a timestamp
    event-time column, so a non-timestamp tick is mapped through
    timestamp_seconds (monotone — ordering and watermark math carry over)."""
    dt = dict(wal_stream.dtypes).get(ts_col)
    if dt not in ("timestamp", "timestamp_ntz"):
        ev = "_wal_event_time"
        return (
            wal_stream.withColumn(ev, F.timestamp_seconds(F.col(ts_col)))
            .withWatermark(ev, watermark)
            .dropDuplicatesWithinWatermark(["pk"])
            .drop(ev)
        )
    return wal_stream.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(
        ["pk"]
    )
