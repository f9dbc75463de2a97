"""Storage-v2 "packed" manifest: resolve a packed/external table's file
list from its committed manifest and read it as a DataFrame.

Reference parity (file:line into /root/reference — structure re-expressed
from the published Go surface, no code reused; the on-disk loon encoding
lives in the external milvus-storage C++ library, so this module persists
the SAME logical structure as documented JSON):
  - Manifest structure: column_groups → files, each file carrying a path
    and start/end row index (LoonManifest walk in
    internal/storagev2/packed/explore_ffi.go:425-447;
    ReadFileInfosFromManifestPath flattens them to FileInfos).
  - Commit payload: new column-group files + delta-log entries + stat
    entries applied atomically
    (internal/storagev2/packed/manifest_commit.go:47-75 ManifestUpdates).
  - Normalization invariant: every consumer must see the file list sorted
    lexicographically by path and filtered to the requested format's
    extension, or different processes slice different index windows over
    the same manifest (NormalizeFileInfos, explore_ffi.go:63-85 — the
    documented "stray `_SUCCESS`/`.crc` file" index-drift bug).
  - External-table path: the resolved file list feeds a plain scan
    (exttable_test.go; DataNode reads fileIndexBegin/End windows).

Spark mapping / 100 TB posture:
  - A SINGLE column group (the external-table shape) resolves to a list of
    parquet files and reads via ``spark.read.parquet(*files)`` — a plain
    distributed scan, so predicate pushdown / column pruning / partition
    sizing all still apply.
  - MULTIPLE column groups are the packed writer's vertical split: group
    g's i-th fragment holds the same rows as group h's i-th fragment, so
    aligned fragments zip positionally in ONE ``mapInPandas`` task per
    fragment index (the reference's packed reader is likewise
    per-fragment); fragments are the bounded ~1 GB unit, so tasks stay
    uniform and the driver only ever handles the file LIST.
  - delta_logs apply as a broadcast anti-join on the primary key — the
    same fold the L0 import performs.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

FORMAT_EXTENSIONS = {"parquet": ".parquet", "vortex": ".vortex"}

MANIFEST_VERSION = 1


def write_manifest(
    path: str,
    column_groups: list[dict],
    *,
    delta_logs: list[str] | None = None,
    stats: list[dict] | None = None,
    fmt: str = "parquet",
) -> None:
    """Commit a manifest: ``column_groups`` is a list of
    ``{"columns": [...], "files": [{"path", "start_index", "end_index"}]}``
    (paths relative to the manifest's directory or absolute). The write is
    atomic (tmp + rename), mirroring the reference's single-shot
    CommitManifestUpdates transaction."""
    doc = {
        "version": MANIFEST_VERSION,
        "format": fmt,
        "column_groups": column_groups,
        "delta_logs": list(delta_logs or []),
        "stats": list(stats or []),
    }
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    tmp = path + ".tmp"
    with open(tmp, "w") as f:
        json.dump(doc, f, indent=1, sort_keys=True)
    os.replace(tmp, path)


def read_manifest(path: str) -> dict:
    with open(path) as f:
        doc = json.load(f)
    if doc.get("version") != MANIFEST_VERSION:
        raise ValueError(f"unsupported manifest version {doc.get('version')!r}")
    if not doc.get("column_groups"):
        raise ValueError("manifest has no column groups")
    return doc


def normalize_file_infos(paths: list[str], fmt: str) -> list[str]:
    """NormalizeFileInfos (explore_ffi.go:63-85): lexicographic sort by
    path, then filter to the format's extension. Mandatory before any
    index-based slicing so every consumer observes the same ordering."""
    out = sorted(paths)
    ext = FORMAT_EXTENSIONS.get(fmt)
    if ext is not None:
        out = [p for p in out if p.lower().endswith(ext)]
    return out


def resolve_files(manifest_path: str, doc: dict | None = None) -> list[str]:
    """Flatten the manifest to its normalized file list (the
    ReadFileInfosFromManifestPath + NormalizeFileInfos pipeline) —
    what an external-table consumer slices fileIndex windows over."""
    doc = doc or read_manifest(manifest_path)
    base = os.path.dirname(os.path.abspath(manifest_path))
    paths = [
        p if os.path.isabs(p) else os.path.join(base, p)
        for cg in doc["column_groups"]
        for fmeta in cg["files"]
        for p in [fmeta["path"]]
    ]
    return normalize_file_infos(paths, doc.get("format", "parquet"))


def read_packed_table(
    spark: SparkSession,
    manifest_path: str,
    *,
    pk_field: str | None = None,
) -> DataFrame:
    """Read a packed table through its manifest. Single column group →
    plain distributed parquet scan (full pushdown); multiple groups →
    positional zip of aligned fragments, one task each. ``pk_field``
    enables delta-log (tombstone) application."""
    doc = read_manifest(manifest_path)
    base = os.path.dirname(os.path.abspath(manifest_path))

    def _abs(p: str) -> str:
        return p if os.path.isabs(p) else os.path.join(base, p)

    groups = doc["column_groups"]
    fmt = doc.get("format", "parquet")
    if len(groups) == 1:
        files = resolve_files(manifest_path, doc)
        if not files:
            raise ValueError("manifest resolves to no data files")
        df = spark.read.parquet(*files)
    else:
        df = _read_vertical_groups(spark, groups, _abs, fmt)
    dlogs = [_abs(p) for p in doc.get("delta_logs", [])]
    if dlogs:
        if pk_field is None:
            raise ValueError("manifest has delta_logs; pk_field is required")
        from milvus_spark.sources.binlog import read_delta_binlogs

        tombs = None
        for d in dlogs:
            t = read_delta_binlogs(spark, d).select(F.col("pk").alias("__del_pk"))
            tombs = t if tombs is None else tombs.unionByName(t)
        df = df.join(
            F.broadcast(tombs.distinct()),
            df[pk_field] == F.col("__del_pk"),
            "left_anti",
        )
    return df


def _read_vertical_groups(spark, groups, _abs, fmt: str):
    """Zip N column groups positionally: fragment i of every group holds
    the same rows, so each Spark task reads one aligned fragment tuple.
    Files inside each group follow the normalized (lex) order —
    the cross-process determinism invariant."""
    import pandas as pd
    import pyarrow.parquet as pq

    from pyspark.sql.pandas.types import from_arrow_type
    from pyspark.sql import types as T

    per_group: list[list[str]] = []
    for cg in groups:
        files = normalize_file_infos([_abs(f["path"]) for f in cg["files"]], fmt)
        if not files:
            raise ValueError("column group resolves to no data files")
        per_group.append(files)
    counts = {len(fs) for fs in per_group}
    if len(counts) != 1:
        raise ValueError(f"column-group fragment counts diverge: {sorted(counts)}")
    n = counts.pop()

    # schema: probe each group's first fragment footer (metadata only)
    fields: list[T.StructField] = []
    seen: set[str] = set()
    for fs in per_group:
        sch = pq.read_schema(fs[0])
        for name in sch.names:
            if name in seen:
                raise ValueError(f"column {name!r} appears in two column groups")
            seen.add(name)
            fields.append(T.StructField(name, from_arrow_type(sch.field(name).type), True))
    schema = T.StructType(fields)
    names = [f.name for f in fields]

    frag_rows = [
        (i, json.dumps([fs[i] for fs in per_group])) for i in range(n)
    ]
    fdf = spark.createDataFrame(frag_rows, "frag long, paths string")

    def parse(batches):
        for pdf in batches:
            for paths_json in pdf["paths"]:
                paths = json.loads(paths_json)
                parts = [pq.read_table(p).to_pandas() for p in paths]
                lens = {len(p) for p in parts}
                if len(lens) != 1:
                    raise ValueError(
                        f"aligned fragments disagree on row count: {sorted(lens)}"
                    )
                merged = pd.concat(
                    [p.reset_index(drop=True) for p in parts], axis=1
                )
                yield merged[names]

    return fdf.mapInPandas(parse, schema)
