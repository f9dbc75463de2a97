"""Differential fuzzing of the filter-expression compiler: random predicate
ASTs rendered both as Milvus expr strings (compiled by plans/expr.py on Spark)
and as SQL (run by DuckDB) must select identical row sets — the
filtering_case_matrix.py methodology, generated instead of enumerated."""

from __future__ import annotations

import random

import duckdb
import pytest

from milvus_spark.plans.expr import compile_expr

COLS = {
    "l_orderkey": "int",
    "l_linenumber": "int",
    "l_quantity": "num",
    "l_discount": "num",
    "l_tax": "num",
    "l_returnflag": "str",
    "l_linestatus": "str",
}
STR_VALS = ["A", "N", "R", "O", "F"]
NUM_CONST = [0, 1, 5, 10, 25, 45, 0.02, 0.05, 0.08, 2.5]
INT_CONST = [0, 1, 2, 3, 7, 100, 1000]


def gen_pred(rng: random.Random, depth: int = 0) -> tuple[str, str]:
    """Returns (milvus_expr, duckdb_sql)."""
    if depth < 2 and rng.random() < 0.45:
        op = rng.choice(["and", "or", "not"])
        a_m, a_s = gen_pred(rng, depth + 1)
        if op == "not":
            return f"not ({a_m})", f"NOT ({a_s})"
        b_m, b_s = gen_pred(rng, depth + 1)
        mop = rng.choice(["&&", "and"]) if op == "and" else rng.choice(["||", "or"])
        return f"({a_m}) {mop} ({b_m})", f"({a_s}) {'AND' if op == 'and' else 'OR'} ({b_s})"

    kind = rng.random()
    col = rng.choice(list(COLS))
    typ = COLS[col]
    if typ == "str":
        if kind < 0.4:
            v = rng.choice(STR_VALS)
            op = rng.choice(["==", "!="])
            return f'{col} {op} "{v}"', f"{col} {'=' if op == '==' else '<>'} '{v}'"
        if kind < 0.7:
            vs = rng.sample(STR_VALS, k=rng.randint(1, 3))
            neg = rng.random() < 0.3
            lst_m = "[" + ", ".join(f'"{v}"' for v in vs) + "]"
            lst_s = "(" + ", ".join(f"'{v}'" for v in vs) + ")"
            return (
                f"{col} {'not in' if neg else 'in'} {lst_m}",
                f"{col} {'NOT IN' if neg else 'IN'} {lst_s}",
            )
        v = rng.choice(STR_VALS)
        return f'starts_with({col}, "{v}")', f"starts_with({col}, '{v}')"
    # numeric
    if kind < 0.35:
        c = rng.choice(NUM_CONST if typ == "num" else INT_CONST)
        op = rng.choice(["<", "<=", ">", ">=", "==", "!="])
        sop = "=" if op == "==" else ("<>" if op == "!=" else op)
        return f"{col} {op} {c}", f"{col} {sop} {c}"
    if kind < 0.55 and typ == "int":
        m = rng.choice([2, 3, 7])
        r = rng.randint(0, m - 1)
        off = rng.choice([0, 1, 5])
        return (
            f"({col} + {off}) % {m} == {r}",
            f"({col} + {off}) % {m} = {r}",
        )
    if kind < 0.75:
        lo = rng.choice([1, 5, 10])
        hi = lo + rng.choice([5, 20, 40])
        return f"{lo} <= {col} <= {hi}", f"{col} >= {lo} AND {col} <= {hi}"
    if typ == "int":
        vs = rng.sample(INT_CONST, k=3)
        return (
            f"{col} in [{', '.join(map(str, vs))}]",
            f"{col} IN ({', '.join(map(str, vs))})",
        )
    c2 = rng.choice([c for c, t in COLS.items() if t == "num" and c != col])
    op = rng.choice(["<", ">", "<=", ">="])
    return f"{col} {op} {c2}", f"{col} {op} {c2}"


@pytest.fixture(scope="module")
def engines(spark, sf_dir):
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    li = li.cache()
    con = duckdb.connect()
    con.execute(f"CREATE VIEW lineitem AS SELECT * FROM read_parquet('{sf_dir}/lineitem.parquet')")
    return li, con


def test_fuzz_100_predicates(engines):
    li, con = engines
    rng = random.Random(20260813)
    failures = []
    for i in range(100):
        m, s = gen_pred(rng)
        try:
            got = sorted(
                (r[0], r[1])
                for r in li.filter(compile_expr(m, li.schema))
                .select("l_orderkey", "l_linenumber")
                .collect()
            )
        except Exception as exc:  # compile or execution error is a failure
            failures.append((m, s, f"spark error: {exc}"))
            continue
        want = sorted(
            (int(a), int(b))
            for a, b in con.execute(
                f"SELECT l_orderkey, l_linenumber FROM lineitem WHERE {s}"
            ).fetchall()
        )
        if got != want:
            failures.append((m, s, f"rows spark={len(got)} duckdb={len(want)}"))
    assert not failures, failures[:5]


# --- fuzz corpus 2: events — JSON paths, LIKE/regex, exists, 3VL --------------
def gen_event_pred(rng: random.Random, depth: int = 0) -> tuple[str, str]:
    if depth < 2 and rng.random() < 0.4:
        op = rng.choice(["and", "or", "not"])
        a_m, a_s = gen_event_pred(rng, depth + 1)
        if op == "not":
            return f"not ({a_m})", f"NOT ({a_s})"
        b_m, b_s = gen_event_pred(rng, depth + 1)
        return (
            f"({a_m}) {'&&' if op == 'and' else '||'} ({b_m})",
            f"({a_s}) {'AND' if op == 'and' else 'OR'} ({b_s})",
        )
    kind = rng.random()
    if kind < 0.25:  # JSON path compare (missing key → NULL, 3VL both sides)
        key = rng.choice(["k", "k", "k", "missing"])
        c = rng.choice([10, 50, 69, 90])
        op = rng.choice(["<", "<=", ">", ">=", "==", "!="])
        sop = "=" if op == "==" else ("<>" if op == "!=" else op)
        return (
            f'props["{key}"] {op} {c}',
            f"CAST(json_extract_string(props, '$.{key}') AS BIGINT) {sop} {c}",
        )
    if kind < 0.35:  # JSON key existence
        key = rng.choice(["k", "missing"])
        return (
            f'exists props["{key}"]',
            f"json_extract_string(props, '$.{key}') IS NOT NULL",
        )
    if kind < 0.55:  # LIKE: prefix / postfix / inner match
        pat = rng.choice(["c%", "%k", "%ie%", "err%", "%ror", "%lic%", "view"])
        neg = rng.random() < 0.3
        return (
            f'{"not " if neg else ""}event_type like "{pat}"',
            f"event_type {'NOT LIKE' if neg else 'LIKE'} '{pat}'",
        )
    if kind < 0.65:  # regex partial match
        pat = rng.choice(["^c", "k$", "e.r", "o+"])
        op = rng.random() < 0.7
        return (
            f'event_type {"=~" if op else "!~"} "{pat}"',
            f"{'' if op else 'NOT '}regexp_matches(event_type, '{pat}')",
        )
    if kind < 0.8:
        c = rng.choice([1.0, 5.5, 12.31, 50.0, 99.9])
        op = rng.choice(["<", "<=", ">", ">=" ])
        return f"value {op} {c}", f"value {op} {c}"
    if kind < 0.9:
        vs = rng.sample(["click", "view", "error", "purchase", "scroll"], k=rng.randint(1, 3))
        neg = rng.random() < 0.3
        lst_m = "[" + ", ".join(f'"{v}"' for v in vs) + "]"
        lst_s = "(" + ", ".join(f"'{v}'" for v in vs) + ")"
        return (
            f"event_type {'not in' if neg else 'in'} {lst_m}",
            f"event_type {'NOT IN' if neg else 'IN'} {lst_s}",
        )
    m = rng.choice([3, 7, 11])
    r = rng.randint(0, m - 1)
    return f"user_id % {m} == {r}", f"user_id % {m} = {r}"


@pytest.fixture(scope="module")
def event_engines(spark, sf_dir):
    from milvus_spark.session import load_table

    e = load_table(spark, sf_dir, "events").cache()
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM read_parquet('{sf_dir}/events.parquet')"
    )
    return e, con


def test_fuzz_100_event_predicates(event_engines):
    e, con = event_engines
    rng = random.Random(20260814)
    failures = []
    for _ in range(100):
        m, s = gen_event_pred(rng)
        try:
            got = sorted(
                r[0]
                for r in e.filter(compile_expr(m, e.schema)).select("event_id").collect()
            )
        except Exception as exc:
            failures.append((m, s, f"spark error: {exc}"))
            continue
        want = sorted(
            int(a) for (a,) in con.execute(
                f"SELECT event_id FROM events WHERE {s}"
            ).fetchall()
        )
        if got != want:
            failures.append((m, s, f"rows spark={len(got)} duckdb={len(want)}"))
    assert not failures, failures[:5]


# --- differential fuzz: sloppy phrase match vs a pure-Python oracle ------------
def _py_phrase(tokens: list[str], words: list[str], slop: int) -> bool:
    """Reference: ordered positions p1<...<pn with pn - p1 <= n-1+slop."""
    n = len(words)
    pos = [[i for i, t in enumerate(tokens) if t == w] for w in words]

    def rec(k: int, start: int, prev: int) -> bool:
        if k == n:
            return True
        return any(
            q > prev and q - start <= n - 1 + slop and rec(k + 1, start, q)
            for q in pos[k]
        )

    return any(rec(1, s, s) for s in pos[0])


def test_phrase_match_fuzz_vs_python(spark):
    import random

    from pyspark.sql import functions as F

    from milvus_spark.plans.expr import compile_expr

    rng = random.Random(17)
    vocab = ["a", "b", "c", "d", "e"]
    rows = [
        (i, " ".join(rng.choice(vocab) for _ in range(rng.randint(0, 14))))
        for i in range(300)
    ]
    df = spark.createDataFrame(rows, ["pk", "t"]).cache()
    toks = {pk: [w for w in t.split() if w] for pk, t in rows}
    for trial in range(12):
        n = rng.randint(1, 4)
        words = [rng.choice(vocab) for _ in range(n)]
        slop = rng.randint(0, 3)
        expr = f'phrase_match(t, "{" ".join(words)}", {slop})'
        got = {r.pk for r in df.filter(compile_expr(expr, df.schema)).collect()}
        want = {pk for pk, _ in rows if _py_phrase(toks[pk], words, slop)}
        assert got == want, (words, slop, got ^ want)


def test_cjk_analyzer_fuzz_vs_python(spark):
    """cjk_bigram vs a pure-Python reference over random mixed-script text."""
    import random
    import re as _re

    from pyspark.sql import functions as F

    from milvus_spark.operators.text import CJK_CLASS, cjk_bigram_tokens

    def py_cjk(text: str) -> list[str]:
        latin = [w for w in _re.split(r"[^a-z0-9]+", _re.sub(CJK_CLASS + "+", " ", text).lower()) if w]
        runs = _re.findall("(" + CJK_CLASS + "+)", text)
        big = []
        for r in runs:
            if len(r) == 1:
                big.append(r)
            else:
                big.extend(r[i : i + 2] for i in range(len(r) - 1))
        return latin + big

    rng = random.Random(23)
    cjk_chars = [chr(0x4E00 + i) for i in range(40)] + [chr(0x30A2 + i) for i in range(10)]
    latin_words = ["spark", "Join", "agg42", "x"]
    rows = []
    for i in range(200):
        parts = []
        for _ in range(rng.randint(0, 6)):
            if rng.random() < 0.5:
                parts.append("".join(rng.choice(cjk_chars) for _ in range(rng.randint(1, 5))))
            else:
                parts.append(rng.choice(latin_words))
        sep = rng.choice([" ", ", ", ""])
        rows.append((i, sep.join(parts)))
    df = spark.createDataFrame(rows, ["pk", "t"])
    got = {
        r.pk: sorted(r.toks)
        for r in df.select("pk", cjk_bigram_tokens(F.col("t")).alias("toks")).collect()
    }
    for pk, t in rows:
        assert got[pk] == sorted(py_cjk(t)), (pk, t, got[pk], sorted(py_cjk(t)))
