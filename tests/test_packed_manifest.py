"""Storage-v2 packed manifest reader (sources/packed_manifest.py) —
structure from explore_ffi.go / manifest_commit.go, documented JSON encoding."""

from __future__ import annotations

import os

import pytest

from milvus_spark.sources.packed_manifest import (
    normalize_file_infos,
    read_manifest,
    read_packed_table,
    resolve_files,
    write_manifest,
)


def _write_parquet(path, table):
    import pyarrow.parquet as pq

    os.makedirs(os.path.dirname(path), exist_ok=True)
    pq.write_table(table, path)


def test_normalize_sorts_and_filters():
    # the explore_ffi.go:63-85 invariant: lex order + format extension
    paths = ["b.parquet", "a.parquet", "_SUCCESS", "c.PARQUET", "x.crc"]
    assert normalize_file_infos(paths, "parquet") == [
        "a.parquet", "b.parquet", "c.PARQUET"
    ]
    # unknown format: no extension filtering, still sorted
    assert normalize_file_infos(["b", "a"], "lance-table") == ["a", "b"]


def test_single_group_is_plain_scan_with_pushdown(spark, tmp_path):
    import pyarrow as pa

    base = str(tmp_path / "pk1")
    for i, vals in enumerate(([1, 2], [3, 4])):
        _write_parquet(
            f"{base}/f{i}.parquet", pa.table({"id": vals, "v": [x * 10 for x in vals]})
        )
    mpath = f"{base}/manifest.json"
    write_manifest(
        mpath,
        [{"columns": ["id", "v"], "files": [
            {"path": "f0.parquet", "start_index": 0, "end_index": 2},
            {"path": "f1.parquet", "start_index": 2, "end_index": 4},
            {"path": "notes.txt", "start_index": 0, "end_index": -1},
        ]}],
    )
    assert [os.path.basename(p) for p in resolve_files(mpath)] == [
        "f0.parquet", "f1.parquet"
    ]
    df = read_packed_table(spark, mpath)
    assert sorted(r.id for r in df.collect()) == [1, 2, 3, 4]
    # single-group reads stay a native parquet scan → filters push down
    plan = df.filter(df.id == 3)._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters: [IsNotNull(id), EqualTo(id,3)]" in plan


def test_vertical_groups_zip_and_validate(spark, tmp_path):
    import pyarrow as pa

    base = str(tmp_path / "pk2")
    _write_parquet(f"{base}/g0/f0.parquet", pa.table({"id": [1, 2]}))
    _write_parquet(f"{base}/g0/f1.parquet", pa.table({"id": [3]}))
    _write_parquet(f"{base}/g1/f0.parquet", pa.table({"name": ["a", "b"]}))
    _write_parquet(f"{base}/g1/f1.parquet", pa.table({"name": ["c"]}))
    mpath = f"{base}/manifest.json"

    def groups(g1cols="name"):
        return [
            {"columns": ["id"], "files": [
                {"path": "g0/f0.parquet", "start_index": 0, "end_index": 2},
                {"path": "g0/f1.parquet", "start_index": 2, "end_index": 3},
            ]},
            {"columns": [g1cols], "files": [
                {"path": "g1/f0.parquet", "start_index": 0, "end_index": 2},
                {"path": "g1/f1.parquet", "start_index": 2, "end_index": 3},
            ]},
        ]

    write_manifest(mpath, groups())
    got = {(r.id, r.name) for r in read_packed_table(spark, mpath).collect()}
    assert got == {(1, "a"), (2, "b"), (3, "c")}

    # fragment-count divergence is an error, not silent misalignment
    g = groups()
    g[1]["files"] = g[1]["files"][:1]
    write_manifest(mpath, g)
    with pytest.raises(Exception, match="fragment counts diverge"):
        read_packed_table(spark, mpath)

    # duplicate column across groups is an error
    _write_parquet(f"{base}/g1b/f0.parquet", pa.table({"id": [9, 9]}))
    _write_parquet(f"{base}/g1b/f1.parquet", pa.table({"id": [9]}))
    g = groups()
    for fm in g[1]["files"]:
        fm["path"] = fm["path"].replace("g1/", "g1b/")
    write_manifest(mpath, g)
    with pytest.raises(Exception, match="appears in two column groups"):
        read_packed_table(spark, mpath)

    # row-count mismatch inside an aligned fragment pair fails the task
    _write_parquet(f"{base}/g1/f1.parquet", pa.table({"name": ["c", "d"]}))
    write_manifest(mpath, groups())
    with pytest.raises(Exception, match="disagree on row count"):
        read_packed_table(spark, mpath).collect()


def test_manifest_validation(tmp_path):
    mpath = str(tmp_path / "m.json")
    write_manifest(mpath, [{"columns": ["x"], "files": []}])
    import json

    doc = json.load(open(mpath))
    doc["version"] = 99
    json.dump(doc, open(mpath, "w"))
    with pytest.raises(ValueError, match="unsupported manifest version"):
        read_manifest(mpath)
    doc["version"] = 1
    doc["column_groups"] = []
    json.dump(doc, open(mpath, "w"))
    with pytest.raises(ValueError, match="no column groups"):
        read_manifest(mpath)


def test_delta_logs_require_pk(spark, tmp_path):
    import pyarrow as pa

    from milvus_spark.sources.binlog import write_delta_binlog

    base = str(tmp_path / "pk3")
    _write_parquet(f"{base}/f0.parquet", pa.table({"id": [1, 2, 3]}))
    write_delta_binlog(f"{base}/_delta/0", [2], [1])
    mpath = f"{base}/manifest.json"
    write_manifest(
        mpath,
        [{"columns": ["id"], "files": [
            {"path": "f0.parquet", "start_index": 0, "end_index": 3}]}],
        delta_logs=["_delta"],
    )
    with pytest.raises(ValueError, match="pk_field is required"):
        read_packed_table(spark, mpath)
    got = sorted(r.id for r in read_packed_table(spark, mpath, pk_field="id").collect())
    assert got == [1, 3]
