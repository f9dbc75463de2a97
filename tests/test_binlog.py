"""Binlog codec: byte-level layout pins + reader behavior.

Layout constants mirror the reference (binlog_writer.go:50 magic,
event_header.go header shape, event_data.go descriptor fix part).
"""

from __future__ import annotations

import os
import struct

import pytest

from milvus_spark.sources.binlog import (
    DT_FLOAT_VECTOR,
    DT_INT64,
    DT_VARCHAR,
    MAGIC,
    parse_field_binlog,
    read_insert_binlogs,
    write_field_binlog,
)


def test_binlog_byte_layout(tmp_path):
    p = str(tmp_path / "100" / "0")
    write_field_binlog(p, 100, DT_INT64, [1, 2, 3], collection_id=7, segment_id=9, ts=5)
    data = open(p, "rb").read()
    # magic int32 LE 0xfffabc (binlog_writer.go:50-51)
    assert struct.unpack_from("<i", data, 0)[0] == MAGIC
    # descriptor header: ts u64, type i8 (=0), length i32, next i32
    ts, code, length, nxt = struct.unpack_from("<Qbii", data, 4)
    assert (ts, code) == (5, 0) and nxt == 4 + length
    # fix part starts right after the 17-byte header
    coll, part, seg, fid, st, et, dt = struct.unpack_from("<qqqqQQi", data, 4 + 17)
    assert (coll, seg, fid, dt) == (7, 9, 100, DT_INT64)
    # post-header lengths: descriptor fix part 52 (4 i64 + 2 u64 + i32),
    # data events 16 (event_data.go:427-431)
    phl = data[4 + 17 + 52 : 4 + 17 + 52 + 8]
    assert list(phl) == [52] + [16] * 7
    # second event is an insert event whose chain lands exactly at EOF
    _, code2, len2, nxt2 = struct.unpack_from("<Qbii", data, nxt)
    assert code2 == 1 and nxt2 == nxt + len2 == len(data)


def test_binlog_parse_roundtrip(tmp_path):
    p = str(tmp_path / "101" / "0")
    write_field_binlog(p, 101, DT_VARCHAR, ["a", None, "c"])
    fid, dt, tbl = parse_field_binlog(open(p, "rb").read())
    assert (fid, dt) == (101, DT_VARCHAR)
    assert tbl.column("val").to_pylist() == ["a", None, "c"]

    v = str(tmp_path / "102" / "0")
    write_field_binlog(v, 102, DT_FLOAT_VECTOR, [[1.0, 2.0], [3.5, -4.0]], dim=2)
    fid, dt, tbl = parse_field_binlog(open(v, "rb").read())
    assert dt == DT_FLOAT_VECTOR
    import numpy as np

    got = [np.frombuffer(b, "<f4").tolist() for b in tbl.column("val").to_pylist()]
    assert got == [[1.0, 2.0], [3.5, -4.0]]


def test_binlog_parse_errors(tmp_path):
    with pytest.raises(ValueError, match="too short"):
        parse_field_binlog(b"\x01\x02")
    with pytest.raises(ValueError, match="magic"):
        parse_field_binlog(b"\x00" * 64)
    p = str(tmp_path / "100" / "0")
    write_field_binlog(p, 100, DT_INT64, [1])
    data = bytearray(open(p, "rb").read())
    data[4 + 8] = 1  # descriptor's type code byte -> insert
    with pytest.raises(ValueError, match="descriptor"):
        parse_field_binlog(bytes(data))


def test_binlog_distributed_read(spark, tmp_path):
    base = str(tmp_path / "seg")
    write_field_binlog(os.path.join(base, "0", "0"), 0, DT_INT64, [10, 11])
    write_field_binlog(os.path.join(base, "1", "0"), 1, DT_INT64, [5, 5])
    write_field_binlog(os.path.join(base, "100", "0"), 100, DT_INT64, [1, 2])
    write_field_binlog(os.path.join(base, "101", "0"), 101, DT_VARCHAR, ["x", "y"])
    names = {0: "row_id", 1: "ts", 100: "pk", 101: "name"}
    # system fields dropped by default (row id 0 / timestamp 1)
    df = read_insert_binlogs(spark, base, names)
    assert df.columns == ["pk", "name"]
    assert sorted((r.pk, r.name) for r in df.collect()) == [(1, "x"), (2, "y")]
    withsys = read_insert_binlogs(spark, base, names, include_system=True)
    assert set(withsys.columns) == {"row_id", "ts", "pk", "name"}
    # missing field dir fails loudly
    with pytest.raises(ValueError, match="missing field dirs"):
        read_insert_binlogs(spark, base, {999: "nope"})


def test_binlog_numeric_log_id_ordering(spark, tmp_path):
    """Log files zip in NUMERIC id order (binlog/util.go sorts numerically):
    ids of differing digit widths ('99' vs '100') must not misalign the
    positional column zip."""
    base = str(tmp_path / "seg")
    # field 100 logs {99, 100}; field 101 logs {101, 102} — lexicographic
    # sort would pair 100's batch with 101's first batch
    write_field_binlog(os.path.join(base, "100", "99"), 100, DT_INT64, [1, 2])
    write_field_binlog(os.path.join(base, "100", "100"), 100, DT_INT64, [3, 4])
    write_field_binlog(os.path.join(base, "101", "101"), 101, DT_VARCHAR, ["a", "b"])
    write_field_binlog(os.path.join(base, "101", "102"), 101, DT_VARCHAR, ["c", "d"])
    df = read_insert_binlogs(spark, base, {100: "pk", 101: "name"})
    got = sorted((r.pk, r.name) for r in df.collect())
    assert got == [(1, "a"), (2, "b"), (3, "c"), (4, "d")]


def test_delta_binlog_roundtrip(spark, tmp_path):
    """Delta (delete) binlogs: DeleteEventType events carrying JSON
    DeleteLog rows (delta_data.go:142-156) round-trip through the
    distributed reader."""
    from milvus_spark.sources.binlog import (
        parse_delta_binlog,
        read_delta_binlogs,
        write_delta_binlog,
    )

    p = str(tmp_path / "delta" / "0")
    write_delta_binlog(p, [7, 9, 11], [100, 101, 102])
    assert parse_delta_binlog(open(p, "rb").read()) == [
        (7, 100), (9, 101), (11, 102)
    ]
    df = read_delta_binlogs(spark, str(tmp_path / "delta"))
    assert sorted((r.pk, r.ts) for r in df.collect()) == [
        (7, 100), (9, 101), (11, 102)
    ]
    import pytest as _pytest

    with _pytest.raises(ValueError, match="no delta binlogs"):
        read_delta_binlogs(spark, str(tmp_path / "nope"))
