"""Local emulation of the driver's t2 correctness gate.

Runs every registered query at sf0.01 on Spark AND its DuckDB oracle,
compares row count, column names, and an order-insensitive value hash
(columns sorted by name, rows sorted by stringified values). Strict on
purpose — if this passes, any reasonable driver comparison passes.

Usage: python scripts/check.py [name_filter ...]
"""

from __future__ import annotations

import hashlib
import sys
import time
from pathlib import Path

import duckdb
import pandas as pd

_REPO = str(Path(__file__).resolve().parent.parent)
sys.path.insert(0, _REPO)

SF_DIR = "/root/testdata/sf0.01"
TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    out = pd.DataFrame()
    for c in df.columns:
        s = df[c]
        out[c] = s.map(_cell)
    if len(out):
        out = out.sort_values(by=list(out.columns), kind="mergesort").reset_index(drop=True)
    return out


def _cell(v) -> str:
    import datetime
    import numpy as np

    if v is None:
        return "NULL"
    if isinstance(v, float) and v != v:
        return "NULL"
    if isinstance(v, (np.floating, float)):
        f = float(v)
        if f != f:
            return "NULL"
        # 12 significant digits: stricter than any reasonable driver compare,
        # still tolerant of final-ulp summation-order noise
        return format(f, ".12g")
    if isinstance(v, (np.integer, int)) and not isinstance(v, bool):
        return str(int(v))
    if isinstance(v, (pd.Timestamp, datetime.datetime)):
        ts = pd.Timestamp(v)
        if ts.tzinfo is not None:
            ts = ts.tz_convert("UTC").tz_localize(None)
        return ts.isoformat()
    if isinstance(v, (list, tuple, np.ndarray)):
        return "[" + ",".join(_cell(x) for x in v) + "]"
    if isinstance(v, (np.bool_, bool)):
        return str(bool(v))
    return str(v)


def value_hash(df: pd.DataFrame) -> str:
    h = hashlib.sha256()
    for row in df.itertuples(index=False):
        h.update(("|".join(row) + "\n").encode())
    return h.hexdigest()


def main() -> int:
    filters = sys.argv[1:]
    import os

    import __spark_entry__ as entrymod
    from milvus_spark.session import get_spark

    spark = get_spark("check", shuffle_partitions=8)
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    names = [n for n in qs if not filters or any(f in n for f in filters)]
    ok = bad = 0
    for name in names:
        t0 = time.time()
        try:
            sdf = qs[name](spark, SF_DIR).toPandas()
        except Exception as e:
            print(f"FAIL {name}: spark error: {e}")
            bad += 1
            continue
        if name not in oracles:
            print(f"  ok {name}: rows-only ({len(sdf)} rows, no oracle) [{time.time()-t0:.1f}s]")
            ok += 1
            continue
        try:
            odf = con.execute(oracles[name]).fetchdf()
        except Exception as e:
            print(f"FAIL {name}: duckdb error: {e}")
            bad += 1
            continue
        ns, no = normalize(sdf), normalize(odf)
        problems = []
        if len(ns) != len(no):
            problems.append(f"rowcount spark={len(ns)} oracle={len(no)}")
        if list(ns.columns) != list(no.columns):
            problems.append(f"schema spark={list(ns.columns)} oracle={list(no.columns)}")
        elif value_hash(ns) != value_hash(no):
            problems.append("value-hash mismatch")
            merged = ns.merge(no, indicator=True, how="outer")
            diff = merged[merged["_merge"] != "both"]
            problems.append(f"first diffs:\n{diff.head(6)}")
        if problems:
            print(f"FAIL {name}: " + "; ".join(problems))
            bad += 1
        else:
            print(f"  ok {name}: {len(ns)} rows hash-match [{time.time()-t0:.1f}s]")
            ok += 1
    print(f"\n{ok} ok, {bad} fail / {len(names)} queries")
    # every query was fully materialized above (toPandas), so the scratch
    # dirs THIS process created are dead — reclaim exactly those (pid-token
    # ownership; concurrent sessions' dirs are never touched)
    from milvus_spark.scratch import cleanup_own

    cleanup_own()
    return 1 if bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
