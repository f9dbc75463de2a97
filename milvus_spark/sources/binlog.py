"""Binlog-format bulk import: read (and, for fixtures, write) the
reference's native insert-binlog files.

Reference parity (file:line into /root/reference — format re-implemented
from the published layout, no code reused):
  - File layout: magic int32 0xfffabc, then a descriptor event, then data
    events (internal/storage/binlog_writer.go:50-51,132-135).
  - Event header {Timestamp u64, TypeCode i8, EventLength i32,
    NextPosition i32}, little-endian, packed
    (internal/storage/event_header.go:29-34, event_writer.go:30 int8 type
    code, pkg/common Endian = binary.LittleEndian).
  - Descriptor event data: fix part {CollectionID, PartitionID, SegmentID,
    FieldID i64; StartTimestamp, EndTimestamp u64; PayloadDataType i32},
    then PostHeaderLengths [8]u8 (descriptor fix part is 52 bytes), ExtraLength i32, ExtraBytes json
    (internal/storage/event_data.go:50-58,173-187).
  - Insert event data: {StartTimestamp, EndTimestamp} u64
    (event_data.go:223-244); EventLength spans header+data
    (event_writer.go:150-151), NextPosition is absolute.
  - Payload: a single-column Parquet blob, column name "val"
    (internal/storage/payload_writer.go:1057-1062); FloatVector is
    FixedSizeBinary(dim*4) of little-endian f32 (payload_writer.go:1145).
  - Import dir layout: one directory per field id holding that column's
    log files; rows align by position across fields
    (internal/util/importutilv2/binlog/util.go:78-95).

Spark mapping / 100 TB posture: the unit of work is a SEGMENT (all field
dirs under one segment prefix — the reference's bounded ~1 GB unit). The
driver only LISTS segment directories; parsing runs distributed via
``mapInPandas`` over the segment list, one task per segment, each emitting
complete rows (columns zipped positionally). No per-row Python: payloads
decode through pyarrow/numpy batch ops.
"""

from __future__ import annotations

import glob
import io
import json
import os
import struct

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

MAGIC = 0xFFFABC
_HDR = struct.Struct("<Qbii")  # ts, type code, event length, next position
_DESC_FIX = struct.Struct("<qqqqQQi")
_EVENT_FIX = struct.Struct("<QQ")  # insert/delete event: start ts, end ts

DESCRIPTOR_EVENT = 0
INSERT_EVENT = 1

# schemapb.DataType values (pkg/proto/schema.proto)
DT_BOOL, DT_INT8, DT_INT16, DT_INT32, DT_INT64 = 1, 2, 3, 4, 5
DT_FLOAT, DT_DOUBLE = 10, 11
DT_STRING, DT_VARCHAR, DT_ARRAY, DT_JSON = 20, 21, 22, 23
DT_FLOAT_VECTOR = 101

ROWID_FIELD = 0  # common.RowIDField
TS_FIELD = 1  # common.TimeStampField


# ------------------------------------------------------------------- writer
def _payload_parquet(values, data_type: int, dim: int = 0) -> bytes:
    """Encode one event's values as the single-column 'val' parquet blob."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    if data_type == DT_FLOAT_VECTOR:
        flat = np.asarray(
            [np.asarray(v, dtype="<f4").tobytes() for v in values], dtype=object
        )
        arr = pa.array(flat, type=pa.binary(dim * 4))
    elif data_type in (DT_INT8, DT_INT16, DT_INT32):
        arr = pa.array(values, type={DT_INT8: pa.int8(), DT_INT16: pa.int16(), DT_INT32: pa.int32()}[data_type])
    elif data_type == DT_INT64:
        arr = pa.array(values, type=pa.int64())
    elif data_type == DT_BOOL:
        arr = pa.array(values, type=pa.bool_())
    elif data_type == DT_FLOAT:
        arr = pa.array(values, type=pa.float32())
    elif data_type == DT_DOUBLE:
        arr = pa.array(values, type=pa.float64())
    elif data_type in (DT_STRING, DT_VARCHAR):
        arr = pa.array(values, type=pa.string())
    elif data_type == DT_JSON:
        arr = pa.array([v.encode() if isinstance(v, str) else v for v in values], type=pa.binary())
    else:
        raise ValueError(f"unsupported binlog payload type {data_type}")
    buf = io.BytesIO()
    pq.write_table(pa.table({"val": arr}), buf)
    return buf.getvalue()


def _event(type_code: int, ts: int, payload: bytes, offset: int) -> bytes:
    """One data event: header + {start,end} ts fix part + parquet payload."""
    length = _HDR.size + _EVENT_FIX.size + len(payload)
    hdr = _HDR.pack(ts, type_code, length, offset + length)
    return hdr + _EVENT_FIX.pack(ts, ts) + payload


def write_field_binlog(
    path: str,
    field_id: int,
    data_type: int,
    values,
    *,
    dim: int = 0,
    collection_id: int = 0,
    partition_id: int = 0,
    segment_id: int = 0,
    ts: int = 1,
) -> None:
    """Write one column's insert binlog file in the reference layout."""
    payload = _payload_parquet(values, data_type, dim)
    # per-event-type fix-part sizes (event_data.go:427-431): descriptor 52,
    # every data event 16 ("only start/end timestamp yet")
    post_header_lengths = bytes([_DESC_FIX.size] + [_EVENT_FIX.size] * 7)
    extras = json.dumps({"original_size": str(len(payload))}).encode()
    desc_len = _HDR.size + _DESC_FIX.size + len(post_header_lengths) + 4 + len(extras)
    out = bytearray(struct.pack("<i", MAGIC))
    out += _HDR.pack(ts, DESCRIPTOR_EVENT, desc_len, 4 + desc_len)
    out += _DESC_FIX.pack(
        collection_id, partition_id, segment_id, field_id, ts, ts, data_type
    )
    out += post_header_lengths
    out += struct.pack("<i", len(extras)) + extras
    out += _event(INSERT_EVENT, ts, payload, len(out))
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with open(path, "wb") as f:
        f.write(bytes(out))


# ------------------------------------------------------------------- reader
def parse_field_binlog(data: bytes):
    """Parse one binlog file → (field_id, data_type, pyarrow.Table).

    Walks the event chain via EventLength; concatenates every insert
    event's parquet payload (a file may hold several)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    if len(data) < 4 + _HDR.size:
        raise ValueError("binlog too short")
    (magic,) = struct.unpack_from("<i", data, 0)
    if magic != MAGIC:
        raise ValueError(f"bad binlog magic {magic:#x}")
    pos = 4
    _, code, length, _ = _HDR.unpack_from(data, pos)
    if code != DESCRIPTOR_EVENT:
        raise ValueError("binlog must start with a descriptor event")
    dpos = pos + _HDR.size
    coll, part, seg, field_id, _, _, data_type = _DESC_FIX.unpack_from(data, dpos)
    pos += length
    tables = []
    while pos < len(data):
        _, code, length, _ = _HDR.unpack_from(data, pos)
        if length <= 0:
            raise ValueError("corrupt event length")
        if code == INSERT_EVENT:
            payload = data[pos + _HDR.size + _EVENT_FIX.size : pos + length]
            tables.append(pq.read_table(io.BytesIO(payload)))
        pos += length
    if not tables:
        raise ValueError("no insert events in binlog")
    return field_id, data_type, pa.concat_tables(tables)


def _decode_column(table, data_type: int):
    """payload table → pandas Series of Spark-friendly values."""
    import numpy as np

    col = table.column("val")
    if data_type == DT_FLOAT_VECTOR:
        vals = col.to_pylist()
        return [None if v is None else np.frombuffer(v, dtype="<f4").tolist() for v in vals]
    if data_type == DT_JSON:
        return [None if v is None else bytes(v).decode() for v in col.to_pylist()]
    return col.to_pylist()


_SPARK_TYPES = {
    DT_BOOL: T.BooleanType(),
    DT_INT8: T.ByteType(),
    DT_INT16: T.ShortType(),
    DT_INT32: T.IntegerType(),
    DT_INT64: T.LongType(),
    DT_FLOAT: T.FloatType(),
    DT_DOUBLE: T.DoubleType(),
    DT_STRING: T.StringType(),
    DT_VARCHAR: T.StringType(),
    DT_JSON: T.StringType(),
    DT_FLOAT_VECTOR: T.ArrayType(T.FloatType()),
}


def read_insert_binlogs(
    spark: SparkSession,
    prefix: str,
    field_names: dict[int, str],
    *,
    include_system: bool = False,
    parallelism: int | None = None,
) -> DataFrame:
    """Distributed read of an insert-binlog prefix (``<prefix>/<fieldID>/…``
    per segment, importutilv2/binlog/util.go:78-95).

    The driver lists segment groups only; each Spark task parses one
    segment's field files and emits complete rows (columns align by
    position — the reference's column-per-binlog layout). System fields
    (row id 0 / timestamp 1) are dropped unless ``include_system``."""
    import pandas as pd

    files = glob.glob(os.path.join(prefix, "*", "*"))
    by_field: dict[int, list[str]] = {}
    for f in files:
        try:
            fid = int(os.path.basename(os.path.dirname(f)))
        except ValueError:
            continue
        by_field.setdefault(fid, []).append(f)

    def _log_key(p: str):
        # log IDs are numeric and differ across fields (binlog/util.go);
        # a lexicographic sort would misalign batches once widths differ
        # ('100' < '99'), silently zipping rows from different batches
        b = os.path.basename(p)
        return (0, int(b), b) if b.isdigit() else (1, 0, b)

    for fs in by_field.values():
        fs.sort(key=_log_key)
    if not by_field:
        raise ValueError(f"no binlog files under {prefix!r}")
    want = {
        fid: name
        for fid, name in field_names.items()
        if include_system or fid not in (ROWID_FIELD, TS_FIELD)
    }
    missing = set(want) - set(by_field)
    if missing:
        raise ValueError(f"binlog prefix missing field dirs {sorted(missing)}")

    # one row per (field, log index): a segment writes log files in the same
    # order for every field, so the i-th log of each field zips positionally
    nlogs = {fid: len(fs) for fid, fs in by_field.items() if fid in want}
    if len(set(nlogs.values())) != 1:
        raise ValueError(f"field log counts diverge: {nlogs}")
    n = next(iter(nlogs.values()))

    # probe one file per field for the payload type → build the schema
    dtypes: dict[int, int] = {}
    for fid in want:
        with open(by_field[fid][0], "rb") as fh:
            got_fid, dt, _ = parse_field_binlog(fh.read())
        if got_fid != fid:
            raise ValueError(f"field id mismatch: dir {fid} vs descriptor {got_fid}")
        dtypes[fid] = dt
    fids = sorted(want)
    schema = T.StructType(
        [T.StructField(want[fid], _SPARK_TYPES[dtypes[fid]], True) for fid in fids]
    )

    seg_rows = [(i, json.dumps({str(f): by_field[f][i] for f in fids})) for i in range(n)]
    seg_df = spark.createDataFrame(seg_rows, "log_idx long, paths string")
    if parallelism:
        seg_df = seg_df.repartition(parallelism)

    def parse(batches):
        for pdf in batches:
            for paths_json in pdf["paths"]:
                paths = json.loads(paths_json)
                cols = {}
                for fid in fids:
                    with open(paths[str(fid)], "rb") as fh:
                        _, dt, tbl = parse_field_binlog(fh.read())
                    cols[want[fid]] = _decode_column(tbl, dt)
                lens = {k: len(v) for k, v in cols.items()}
                if len(set(lens.values())) != 1:
                    raise ValueError(f"column row counts diverge: {lens}")
                yield pd.DataFrame(cols, columns=[want[f] for f in fids])

    return seg_df.mapInPandas(parse, schema)


# ------------------------------------------------------------ delta (delete)
DELETE_EVENT = 2


def write_delta_binlog(path: str, pks, ts_list, *, pk_type: int = DT_INT64,
                       ts: int = 1, **ids) -> None:
    """Write a delta (delete) binlog: DeleteEventType events whose payload
    is one JSON DeleteLog per tombstone — {"pk": …, "ts": …, "pkType": …}
    (internal/storage/delta_data.go:142-156)."""
    rows = [
        json.dumps({"pk": pk, "ts": int(t), "pkType": pk_type}, separators=(",", ":"))
        for pk, t in zip(pks, ts_list)
    ]
    payload = _payload_parquet(rows, DT_VARCHAR)
    post_header_lengths = bytes([_DESC_FIX.size] + [_EVENT_FIX.size] * 7)
    extras = json.dumps({"original_size": str(len(payload))}).encode()
    desc_len = _HDR.size + _DESC_FIX.size + len(post_header_lengths) + 4 + len(extras)
    out = bytearray(struct.pack("<i", MAGIC))
    out += _HDR.pack(ts, DESCRIPTOR_EVENT, desc_len, 4 + desc_len)
    out += _DESC_FIX.pack(
        ids.get("collection_id", 0), ids.get("partition_id", 0),
        ids.get("segment_id", 0), -1, ts, ts, DT_VARCHAR,
    )
    out += post_header_lengths
    out += struct.pack("<i", len(extras)) + extras
    out += _event(DELETE_EVENT, ts, payload, len(out))
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with open(path, "wb") as f:
        f.write(bytes(out))


def parse_delta_binlog(data: bytes):
    """One delta binlog file → list of (pk, ts) tombstones."""
    import pyarrow.parquet as pq

    if len(data) < 4 + _HDR.size:
        raise ValueError("binlog too short")
    (magic,) = struct.unpack_from("<i", data, 0)
    if magic != MAGIC:
        raise ValueError(f"bad binlog magic {magic:#x}")
    pos = 4
    _, code, length, _ = _HDR.unpack_from(data, pos)
    if code != DESCRIPTOR_EVENT:
        raise ValueError("binlog must start with a descriptor event")
    pos += length
    out = []
    while pos < len(data):
        _, code, length, _ = _HDR.unpack_from(data, pos)
        if length <= 0:
            raise ValueError("corrupt event length")
        if code == DELETE_EVENT:
            payload = data[pos + _HDR.size + _EVENT_FIX.size : pos + length]
            for s in pq.read_table(io.BytesIO(payload)).column("val").to_pylist():
                d = json.loads(s)
                out.append((d["pk"], int(d["ts"])))
        pos += length
    return out


def read_delta_binlogs(spark: SparkSession, prefix: str) -> DataFrame:
    """Distributed read of an L0/delta prefix → (pk, ts) tombstone frame
    (importutilv2/binlog/l0_reader.go). One task per log file."""
    import pandas as pd

    files = sorted(glob.glob(os.path.join(prefix, "**", "*"), recursive=True))
    files = [f for f in files if os.path.isfile(f)]
    if not files:
        raise ValueError(f"no delta binlogs under {prefix!r}")
    fdf = spark.createDataFrame([(f,) for f in files], "path string")

    def parse(batches):
        for pdf in batches:
            for p in pdf["path"]:
                with open(p, "rb") as fh:
                    rows = parse_delta_binlog(fh.read())
                yield pd.DataFrame(
                    {"pk": [r[0] for r in rows], "ts": [r[1] for r in rows]}
                )

    return fdf.mapInPandas(parse, "pk long, ts long")
