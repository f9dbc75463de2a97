"""Bulk import: file-based load of JSON / CSV / Parquet / Numpy into a
collection, with schema cast + ingest validation.

Reference parity (file:line into /root/reference):
  - Importers per format: internal/util/importutilv2/{json,numpy,parquet,csv}/
    (+ binlog, which is reference-internal storage — parquet covers it here).
  - Import task orchestration: internal/proxy/task_import.go.
  - Ingest validation (vector dim 2..32768, varchar max_length):
    internal/proxy/util.go:433-448.

Spark mapping: `spark.read.{json,csv,parquet}` with an explicit target schema
cast — scans stay distributed and pushdown-friendly. Numpy (one .npy per
column, the Milvus layout) has no distributed reader; columns are loaded
driver-side and parallelized — bounded use (numpy import is a small-batch
path in practice; large data arrives as parquet).
"""

from __future__ import annotations

import os
from typing import Optional

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

MAX_VECTOR_DIM = 32768
MIN_VECTOR_DIM = 2


def _cast_to_schema(df: DataFrame, schema: T.StructType) -> DataFrame:
    cols = []
    for f in schema.fields:
        if f.name not in df.columns:
            raise ValueError(f"import missing column {f.name}")
        cols.append(F.col(f.name).cast(f.dataType).alias(f.name))
    return df.select(*cols)


def read_json(spark: SparkSession, path: str, schema: T.StructType) -> DataFrame:
    return _cast_to_schema(spark.read.json(path), schema)


def read_csv(spark: SparkSession, path: str, schema: T.StructType, header: bool = True) -> DataFrame:
    df = spark.read.option("header", str(header).lower()).csv(path)
    # CSV can't carry arrays natively: vector columns arrive as
    # "v1;v2;..." strings and are split here (importutilv2/csv convention
    # of a scalar-text encoding).
    missing = [f.name for f in schema.fields if f.name not in df.columns]
    if missing:
        # same uniform error contract as the JSON/parquet readers
        raise ValueError(f"import missing column(s) {missing}")
    out = []
    for f in schema.fields:
        c = F.col(f.name)
        if isinstance(f.dataType, T.ArrayType):
            c = F.split(c, ";")
        out.append(c.cast(f.dataType).alias(f.name))
    return df.select(*out)


def read_parquet(spark: SparkSession, path: str, schema: Optional[T.StructType] = None) -> DataFrame:
    df = spark.read.parquet(path)
    return _cast_to_schema(df, schema) if schema is not None else df


def read_numpy(spark: SparkSession, dir_path: str, schema: T.StructType) -> DataFrame:
    """Milvus numpy layout: one ``<field>.npy`` per column, equal row counts."""
    import numpy as np
    import pandas as pd

    data = {}
    n = None
    for f in schema.fields:
        p = os.path.join(dir_path, f"{f.name}.npy")
        if not os.path.exists(p):
            raise ValueError(f"import missing numpy file {p}")
        arr = np.load(p)
        if n is None:
            n = len(arr)
        elif len(arr) != n:
            raise ValueError(f"column {f.name} has {len(arr)} rows, expected {n}")
        data[f.name] = list(arr)
    pdf = pd.DataFrame(data)
    return spark.createDataFrame(pdf, schema=schema)


def validate_ingest(
    df: DataFrame,
    vector_field: Optional[str] = None,
    dim: Optional[int] = None,
    varchar_limits: Optional[dict[str, int]] = None,
) -> DataFrame:
    """Proxy-style ingest validation; raises on the first violated constraint.

    All constraints are counted in ONE aggregation pass over the frame —
    a count() per check would rescan the whole import k+1 times."""
    checks: list[tuple[str, Column]] = []
    if vector_field and dim is not None:
        if not (MIN_VECTOR_DIM <= dim <= MAX_VECTOR_DIM):
            raise ValueError(f"vector dim {dim} outside [{MIN_VECTOR_DIM}, {MAX_VECTOR_DIM}]")
        v = F.col(vector_field)
        # size(NULL) is NULL, so a bare size != dim would let NULL vectors
        # sail through — a null vector field is itself a violation
        checks.append(
            (
                f"rows with null or wrong-dim vector in {vector_field}",
                v.isNull() | (F.size(v) != dim),
            )
        )
    for col, limit in (varchar_limits or {}).items():
        checks.append(
            (f"rows exceed max_length {limit} in {col}", F.length(F.col(col)) > limit)
        )
    if not checks:
        return df
    counts = df.agg(
        *[
            F.sum(F.when(cond, 1).otherwise(0)).alias(f"_c{i}")
            for i, (_, cond) in enumerate(checks)
        ]
    ).first()
    for i, (msg, _) in enumerate(checks):
        bad = counts[f"_c{i}"] or 0
        if bad:
            raise ValueError(f"{bad} {msg}")
    return df
