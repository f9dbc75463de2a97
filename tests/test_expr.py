"""Expression-compiler matrix: every Milvus filter form compiled and checked
against a hand-written equivalent (the reference's differential methodology —
tests/python_client/milvus_client/expressions/filtering_case_matrix.py:
equivalence oracles, operand-order permutations, 3VL cases)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from milvus_spark.plans.expr import ExprError, apply_filter, compile_expr


@pytest.fixture(scope="module")
def orders(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/orders.parquet")


@pytest.fixture(scope="module")
def events(spark, sf_dir):
    from milvus_spark.session import load_table

    return load_table(spark, sf_dir, "events")


def ids_for(df, cond, pk):
    return sorted(r[0] for r in df.filter(cond).select(pk).collect())


CASES = [
    # (milvus expr, equivalent spark SQL condition)
    ("o_totalprice > 100000", "o_totalprice > 100000"),
    ("o_totalprice >= 100000 and o_orderstatus == 'F'", "o_totalprice >= 100000 AND o_orderstatus = 'F'"),
    ("o_orderstatus == \"O\" || o_orderstatus == \"F\"", "o_orderstatus IN ('O','F')"),
    ("o_orderstatus in ['O', 'P']", "o_orderstatus IN ('O','P')"),
    ("o_orderstatus not in ['O', 'P']", "o_orderstatus NOT IN ('O','P')"),
    ("10000 < o_totalprice < 50000", "o_totalprice > 10000 AND o_totalprice < 50000"),
    ("not (o_orderstatus == 'F')", "NOT (o_orderstatus = 'F')"),
    ("(o_orderkey + 5) % 7 == 0", "(o_orderkey + 5) % 7 = 0"),
    ("o_orderkey % 2 == 0 && o_totalprice < 20000", "o_orderkey % 2 = 0 AND o_totalprice < 20000"),
    ("o_orderkey & 7 == 3", "(o_orderkey & (CAST(7=3 AS INT))) = 1"),  # C-prec: parse only
    ("(o_orderkey & 7) == 3", "(o_orderkey & 7) = 3"),
    ("(o_orderkey << 1) > 25000", "shiftleft(o_orderkey, 1) > 25000"),
    ("o_orderpriority like \"1-%\"", "o_orderpriority LIKE '1-%'"),
    ("o_orderpriority =~ \"^1-.*\"", "o_orderpriority RLIKE '^1-.*'"),
    ("starts_with(o_orderpriority, '1')", "o_orderpriority LIKE '1%'"),
    ("empty(o_orderpriority)", "o_orderpriority = ''"),
    ("o_orderkey ** 2 < 1000000", "power(o_orderkey, 2) < 1000000"),
    ("-o_orderkey < -100", "o_orderkey > 100"),
]


@pytest.mark.parametrize("mexpr,sqlcond", CASES, ids=[c[0][:40] for c in CASES])
def test_expr_matches_sql(orders, mexpr, sqlcond):
    if mexpr == "o_orderkey & 7 == 3":
        # precedence-only case: must parse, result compares == tighter than &
        compile_expr(mexpr, orders.schema)
        return
    got = ids_for(orders, compile_expr(mexpr, orders.schema), "o_orderkey")
    want = ids_for(orders, F.expr(sqlcond), "o_orderkey")
    assert got == want, mexpr


JSON_CASES = [
    ('props["k"] > 50', "CAST(get_json_object(props, '$.k') AS DOUBLE) > 50"),
    ('props["k"] == 42', "CAST(get_json_object(props, '$.k') AS DOUBLE) = 42"),
    ('props["k"] in [1, 2, 3]', "CAST(get_json_object(props, '$.k') AS DOUBLE) IN (1,2,3)"),
    ('exists props["k"]', "get_json_object(props, '$.k') IS NOT NULL"),
    ('exists props["nope"]', "get_json_object(props, '$.nope') IS NOT NULL"),
    ('props["nope"] is null', "get_json_object(props, '$.nope') IS NULL"),
    ('props["k"] is not null', "get_json_object(props, '$.k') IS NOT NULL"),
]


@pytest.mark.parametrize("mexpr,sqlcond", JSON_CASES, ids=[c[0][:40] for c in JSON_CASES])
def test_json_expr(events, mexpr, sqlcond):
    got = ids_for(events, compile_expr(mexpr, events.schema), "event_id")
    want = ids_for(events, F.expr(sqlcond), "event_id")
    assert got == want, mexpr


def test_equivalence_oracles(orders):
    """De Morgan / distributivity / OR-vs-IN — same result sets."""
    pairs = [
        ("not (o_orderstatus == 'F' and o_totalprice > 1000)",
         "not (o_orderstatus == 'F') or not (o_totalprice > 1000)"),
        ("o_orderstatus == 'O' or o_orderstatus == 'P'", "o_orderstatus in ['O','P']"),
        ("o_orderkey > 100 and (o_orderstatus == 'F' or o_orderstatus == 'O')",
         "(o_orderkey > 100 and o_orderstatus == 'F') or (o_orderkey > 100 and o_orderstatus == 'O')"),
    ]
    for e1, e2 in pairs:
        a = ids_for(orders, compile_expr(e1, orders.schema), "o_orderkey")
        b = ids_for(orders, compile_expr(e2, orders.schema), "o_orderkey")
        assert a == b, (e1, e2)


def test_template_params(orders):
    c = compile_expr("o_totalprice > {lo} and o_orderstatus == {st}",
                     orders.schema, params={"lo": 150000, "st": "O"})
    got = ids_for(orders, c, "o_orderkey")
    want = ids_for(orders, F.expr("o_totalprice > 150000 AND o_orderstatus = 'O'"), "o_orderkey")
    assert got == want


def test_text_and_phrase_match(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    n1 = docs.filter(compile_expr('text_match(text, "spark merge", 2)', docs.schema)).count()
    n2 = docs.filter(
        F.expr("size(array_intersect(array_distinct(filter(split(lower(text), '[^a-z0-9]+'), x -> x != '')), array('spark','merge'))) >= 2")
    ).count()
    assert n1 == n2 and n1 > 0
    ph = docs.filter(compile_expr('phrase_match(text, "merge batch", 1)', docs.schema)).count()
    assert ph >= 0  # shape check; exact parity covered by fts_phrase_match oracle


def test_text_match_fuzzy(spark, sf_dir):
    """Parser matrix + semantics for text_match_fuzzy — mirrors the
    reference's cases (plan_parser_v2_test.go:919-1026, Plan.g4:24-25)."""
    import pyspark.sql.types as T

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")

    # valid distances 0/1/2; MAX_EDIT_DISTANCE is case-insensitive (EqualFold)
    for d in (0, 1, 2):
        c = compile_expr(f'text_match_fuzzy(text, "spark", max_edit_distance={d})', docs.schema)
        assert docs.filter(c).count() > 0
    compile_expr('text_match_fuzzy(text, "q", MAX_EDIT_DISTANCE=1)', docs.schema)

    # d=0 is exactly a term match
    n0 = docs.filter(
        compile_expr('text_match_fuzzy(text, "spark", max_edit_distance=0)', docs.schema)
    ).count()
    nt = docs.filter(compile_expr('text_match(text, "spark")', docs.schema)).count()
    assert n0 == nt

    # transposition counts as ONE edit: "saprk" matches "spark" at d=1,
    # though plain levenshtein("saprk", "spark") == 2
    n_trans = docs.filter(
        compile_expr('text_match_fuzzy(text, "saprk", max_edit_distance=1)', docs.schema)
    ).count()
    assert n_trans >= n0 > 0

    # multi-token query ORs the per-token fuzzy matches (index_reader_text.rs:310)
    n_multi = docs.filter(
        compile_expr('text_match_fuzzy(text, "spark merge", max_edit_distance=1)', docs.schema)
    ).count()
    n_one = docs.filter(
        compile_expr('text_match_fuzzy(text, "merge", max_edit_distance=1)', docs.schema)
    ).count()
    assert n_multi >= max(n_one, n0)

    # invalid forms (parser_visitor.go:1004-1026 + grammar-required option)
    sch = docs.schema
    for bad in [
        'text_match_fuzzy(text, "q")',  # missing grammar-required option
        'text_match_fuzzy(text, "q", fuzziness=1)',  # wrong option name
        'text_match_fuzzy(text, "q", max_edit_distance=3)',  # > 2
        'text_match_fuzzy(text, "q", max_edit_distance=1.5)',  # non-integer
        'text_match_fuzzy(text, "q", max_edit_distance=9223372036854775808)',
        'text_match_fuzzy(text)',  # arity
    ]:
        with pytest.raises(ExprError):
            compile_expr(bad, sch)
    # non-string field rejected (plan_parser_v2_test.go:992 BoolField case)
    sch2 = T.StructType([T.StructField("b", T.BooleanType())])
    with pytest.raises(Exception):
        compile_expr('text_match_fuzzy(b, "q", max_edit_distance=1)', sch2)
    # named args are rejected on functions that take none
    with pytest.raises(ExprError):
        compile_expr('text_match(text, "q", min_should_match=1)', sch)


def test_apply_filter_none(orders):
    assert apply_filter(orders, None).count() == orders.count()


def test_errors():
    import pyspark.sql.types as T

    sch = T.StructType([T.StructField("a", T.LongType())])
    for bad in ["a >", "a in 5", "a like 5", "{missing}", "a ==", "foo(a)"]:
        with pytest.raises(ExprError):
            compile_expr(bad, sch)


def test_nested_json_path_and_array_subscript(spark):
    """JSONIdentifier chains (Plan.g4:158; ColumnInfo.nested_path
    plan.proto:110): nested object paths and array subscripts (0-indexed,
    Milvus convention) compile to get_json_object $.a.b[i] paths."""
    from pyspark.sql import Row

    df = spark.createDataFrame(
        [
            Row(id=1, props='{"a": {"b": 2}, "arr": [5, 6]}'),
            Row(id=2, props='{"a": {"b": 0}}'),
        ]
    )
    cases = [
        ('props["a"]["b"] > 1', {1}),
        ('props["arr"][0] == 5', {1}),
        ('props["arr"][1] == 6', {1}),
        ('props["arr"][2] is null', {1, 2}),  # out of range / missing → null
        ('exists props["a"]["b"]', {1, 2}),
        ('not (props["a"]["b"] > 1)', {2}),  # 3VL: missing arr row excluded
    ]
    from milvus_spark.plans.expr import compile_expr

    for expr_s, want in cases:
        got = {r["id"] for r in df.filter(compile_expr(expr_s, df.schema)).collect()}
        assert got == want, expr_s


def test_dynamic_field_rewrite(spark):
    """Identifiers absent from the schema resolve into the dynamic $meta
    JSON column with typed-compare casts; schema names stay direct."""
    from pyspark.sql import functions as F

    from milvus_spark.plans.expr import compile_expr

    df = spark.createDataFrame(
        [(1, '{"color": "red", "weight": 12}'), (2, '{"color": "blue", "weight": 3}'),
         (3, '{"weight": 7}')],
        ["pk", "$meta"],
    )
    # string compare on dynamic key
    got = df.filter(compile_expr('color == "red"', df.schema, dynamic_field="$meta"))
    assert [r.pk for r in got.collect()] == [1]
    # numeric typed compare on dynamic key, mixed with schema field
    got = df.filter(compile_expr("weight >= 7 and pk >= 1", df.schema, dynamic_field="$meta"))
    assert sorted(r.pk for r in got.collect()) == [1, 3]
    # missing dynamic key is NULL -> filtered out under 3VL
    got = df.filter(compile_expr('color != "red"', df.schema, dynamic_field="$meta"))
    assert [r.pk for r in got.collect()] == [2]
    # exists() on a dynamic key
    got = df.filter(compile_expr('exists color', df.schema, dynamic_field="$meta"))
    assert sorted(r.pk for r in got.collect()) == [1, 2]


def test_gis_functions_in_filter_language(spark):
    """st_* calls compile from filter strings over POINT WKT columns
    (Plan.g4:124-132; GISFunctionFilterExpr.cpp POINT semantics)."""
    from milvus_spark.plans.expr import ExprError, compile_expr

    df = spark.createDataFrame(
        [
            (1, "POINT (5 5)"),      # inside the square
            (2, "POINT (10 5)"),     # on the right edge
            (3, "POINT (20 20)"),    # outside
            (4, "POINT (0 0)"),      # corner (boundary)
            (5, "not-a-geom"),
        ],
        ["pk", "geom"],
    )
    sq = '"POLYGON((0 0, 10 0, 10 10, 0 10, 0 0))"'

    def run(expr):
        return sorted(r.pk for r in df.filter(compile_expr(expr, df.schema)).collect())

    assert run(f"st_within(geom, {sq})") == [1]
    assert run(f"st_intersects(geom, {sq})") == [1, 2, 4]
    assert run(f"st_touches(geom, {sq})") == [2, 4]
    assert run("st_isvalid(geom)") == [1, 2, 3, 4]
    assert run('st_equals(geom, "POINT (20 20)")') == [3]
    assert run('st_dwithin(geom, "POINT (5 6)", 1.5)') == [1]
    assert run(f"st_crosses(geom, {sq})") == []
    assert run(f"st_overlaps(geom, {sq})") == []
    # uppercase grammar variant + boolean composition
    assert run(f"ST_WITHIN(geom, {sq}) or st_equals(geom, \"POINT (20 20)\")") == [1, 3]

    import pytest as _pytest

    with _pytest.raises(ExprError):
        compile_expr(f"st_contains(geom, {sq})", df.schema)


def test_phrase_match_nterm_slop(spark):
    """phrase_match generalizes to n terms with slop: ordered window
    pn - p1 <= n-1+slop (2-term semantics preserved)."""
    from milvus_spark.plans.expr import compile_expr

    df = spark.createDataFrame(
        [
            (1, "shuffle hash join"),            # consecutive
            (2, "shuffle the hash based join"),  # window 4 <= 2+2
            (3, "shuffle a b c hash join"),      # window 5 > 4
            (4, "join hash shuffle"),            # wrong order
            (5, "shuffle hash"),                 # missing term
        ],
        ["pk", "t"],
    )

    def run(expr):
        return sorted(r.pk for r in df.filter(compile_expr(expr, df.schema)).collect())

    assert run('phrase_match(t, "shuffle hash join", 0)') == [1]
    assert run('phrase_match(t, "shuffle hash join", 2)') == [1, 2]
    assert run('phrase_match(t, "shuffle hash join", 3)') == [1, 2, 3]
    assert run('phrase_match(t, "shuffle join", 1)') == [1]  # 2-term unchanged


def test_json_mixed_type_in_buckets(spark):
    """Mixed-type JSON IN canonicalization (#51489/#51567): literals
    bucket by stored JSON type; no cross-type coercion; bool equality is
    type-guarded; missing key stays 3VL-unknown."""
    from milvus_spark.plans.expr import compile_expr

    df = spark.createDataFrame(
        [
            (1, '{"v": 1}'),       # number 1
            (2, '{"v": "1"}'),     # string "1"
            (3, '{"v": true}'),    # bool true
            (4, '{"v": 2}'),
            (5, '{"v": "2"}'),
            (6, '{"v": false}'),
            (7, "{}"),             # missing key
        ],
        "id long, js string",
    )

    def ids(expr):
        cond = compile_expr(expr, df.schema)
        return sorted(r.id for r in df.filter(cond).collect())

    # number bucket only
    assert ids('js["v"] in [1]') == [1]
    # string bucket only
    assert ids('js["v"] in ["1"]') == [2]
    # bool bucket only
    assert ids('js["v"] in [true]') == [3]
    # mixed union = per-bucket union, no coercion leakage
    assert ids('js["v"] in [1, "2", true]') == [1, 3, 5]
    # not in: complement within existing-key rows (missing key is UNKNOWN)
    assert ids('js["v"] not in [1, "2", true]') == [2, 4, 6]
    # typed bool equality: only the BOOLEAN row matches
    assert ids('js["v"] == true') == [3]
    assert ids('js["v"] != true') == [6]


def test_expr_review_fixes(spark):
    """Regression bundle: negative IN literals, typed json_contains,
    JSON-vs-JSON numeric compare, dotted JSON keys, escape sequences,
    non-literal regex rejection."""
    from milvus_spark.plans.expr import ExprError, compile_expr
    import pytest as _pytest

    df = spark.createDataFrame(
        [
            (1, -1, '{"a": 10, "b": 9, "nums": [1.0, 2.5], "x.y": 7}', "line1\nline2"),
            (2, 2, '{"a": 1, "b": 1.0, "nums": [3], "x.y": 1}', "plain"),
        ],
        "id long, v long, js string, s string",
    )

    def ids(expr):
        return sorted(r.id for r in df.filter(compile_expr(expr, df.schema)).collect())

    # negative literals in IN lists and function args
    assert ids("v in [-1, 5]") == [1]
    assert ids("v not in [-1]") == [2]
    # typed json_contains: numeric membership matches stored 1.0
    assert ids('json_contains(js["nums"], 1)') == [1]
    assert ids('json_contains_any(js["nums"], [3, 9])') == [2]
    assert ids('json_contains_all(js["nums"], [1, 2.5])') == [1]
    # JSON path vs JSON path compares numerically, not lexicographically
    assert ids('js["a"] > js["b"]') == [1]       # 10 > 9 (strings would say '10'<'9')
    assert ids('js["a"] == js["b"]') == [2]      # 1 == 1.0 numerically
    # dotted key addresses the literal top-level key
    assert ids('js["x.y"] == 7') == [1]
    # escape sequences interpret (\n is a newline, not the letter n)
    assert ids('s == "line1\\nline2"') == [1]
    # non-literal regex pattern is rejected, not silently always-true
    with _pytest.raises(ExprError, match="string literal"):
        compile_expr("s =~ js", df.schema)


# ---- struct-array element predicates: element_filter / MATCH_* ---------------
# Valid/invalid matrix mirrors the reference parser's ElementFilter and Match
# test lists (internal/parser/planparserv2/plan_parser_v2_test.go:3645-3830);
# counting semantics mirror the kernel (MatchExpr.cpp:43-113: only valid
# elements count, MATCH_ALL vacuously true on empty arrays).

@pytest.fixture(scope="module")
def structs(spark):
    return spark.createDataFrame(
        [
            (1, [(5, "a"), (150, "b")]),
            (2, [(1, "a")]),
            (3, []),
            (4, [(200, "x"), (300, "aaa")]),
            (5, None),
        ],
        "id long, struct_array array<struct<sub_int:long, sub_str:string>>",
    )


ELEM_CASES = [
    ("element_filter(struct_array, 2 > $[sub_int] > 1)", []),
    ("element_filter(struct_array, $[sub_int] > 1)", [1, 4]),
    ('element_filter(struct_array, $[sub_str] == "a" || $[sub_int] > 1)', [1, 2, 4]),
    ("element_filter(struct_array, !($[sub_int] < 0))", [1, 2, 4]),
    ("id > 1 && element_filter(struct_array, $[sub_int] > 1)", [4]),
    ("MATCH_ALL(struct_array, $[sub_int] > 1)", [1, 3, 4]),  # empty → vacuous true
    ('MATCH_ANY(struct_array, $[sub_str] == "aaa" && $[sub_int] > 100)', [4]),
    ("MATCH_LEAST(struct_array, $[sub_int] > 1, threshold=2)", [1, 4]),
    ("match_most(struct_array, $[sub_int] > 1, threshold=1)", [2, 3]),
    ("MATCH_EXACT(struct_array, $[sub_int] > 1, threshold=2)", [1, 4]),
    (
        'MATCH_ALL(struct_array, $[sub_int] > 1) || MATCH_ANY(struct_array, $[sub_str] == "test")',
        [1, 3, 4],
    ),
    ("MATCH_ANY(struct_array, $[sub_int] > 100) || id > 3", [1, 4, 5]),
    ("MATCH_ANY(struct_array, $[sub_int] in [1, 200])", [2, 4]),
    ("MATCH_ANY(struct_array, $[sub_str] is not null)", [1, 2, 4]),
]

ELEM_TEMPLATE_CASES = [
    # template params fill inside element predicates and threshold kwargs
    # (fill_expression_value.go composes with ElementFilter/Match)
    ("element_filter(struct_array, $[sub_int] > {thr})", {"thr": 100}, [1, 4]),
    ("MATCH_LEAST(struct_array, $[sub_int] > {thr}, threshold={n})", {"thr": 1, "n": 2}, [1, 4]),
]


@pytest.mark.parametrize("mexpr,params,want", ELEM_TEMPLATE_CASES, ids=[c[0][:48] for c in ELEM_TEMPLATE_CASES])
def test_element_match_template_params(structs, mexpr, params, want):
    got = sorted(
        r.id for r in structs.filter(compile_expr(mexpr, structs.schema, params)).collect()
    )
    assert got == want, mexpr


@pytest.mark.parametrize("mexpr,want", ELEM_CASES, ids=[c[0][:48] for c in ELEM_CASES])
def test_element_match_exprs(structs, mexpr, want):
    got = sorted(
        r.id for r in structs.filter(compile_expr(mexpr, structs.schema)).collect()
    )
    assert got == want, mexpr


ELEM_INVALID = [
    "$[sub_int] > 1",  # $[...] only inside element context
    "id > 0 && $[sub_int] > 1",
    "element_filter(struct_array, element_filter(struct_array, $[sub_int] > 1))",
    "element_filter(struct_array, $[nope] > 1)",  # unknown sub-field
    "element_filter(nope, $[sub_int] > 1)",  # unknown array field
    "element_filter(struct_array)",
    "element_filter()",
    'element_filter(struct_array, $[sub_int] > 1) || element_filter(struct_array, $[sub_str] == "t")',
    "element_filter(struct_array, $[sub_int] > 1) && id > 0",  # must be final conjunct
    "not element_filter(struct_array, $[sub_int] > 1)",
    "!element_filter(struct_array, $[sub_int] > 1)",
    "MATCH_ALL(struct_array, MATCH_ANY(struct_array, $[sub_int] > 1))",
    "MATCH_ALL(struct_array, id > 0)",  # element predicate references doc field
    "MATCH_ANY(struct_array, $[sub_int] > 1 && id > 0)",
    "MATCH_ALL(struct_array, $[sub_int] > id)",
    "MATCH_ALL(struct_array, true)",  # not element-level
    "MATCH_ANY(struct_array, $[sub_int] == $[sub_int])",  # elem-vs-elem compare
    "MATCH_ANY(struct_array, $[sub_int])",  # bare element column
    "MATCH_ANY(struct_array, empty($[sub_str]))",  # function calls unsupported
    "MATCH_LEAST(struct_array, $[sub_int] > 1)",  # missing threshold
    "MATCH_ALL(struct_array, $[sub_int] > 1, threshold=2)",  # spurious threshold
    "MATCH_LEAST(struct_array, $[sub_int] > 1, threshold=-1)",
    "MATCH_ALL(id, $[sub_int] > 1)",  # not an array-of-struct
]


@pytest.mark.parametrize("mexpr", ELEM_INVALID, ids=[e[:48] for e in ELEM_INVALID])
def test_element_match_invalid(structs, mexpr):
    with pytest.raises(ExprError):
        compile_expr(mexpr, structs.schema)


def test_element_match_null_masking(spark):
    """Invalid (null) elements are masked out before quantifier counting
    (MatchExpr.cpp:41-44); a null predicate result (null sub-field) is a
    non-match rather than 3VL-poisoning the whole quantifier."""
    df = spark.createDataFrame(
        [
            (1, [None, (7, "z")]),       # null element ignored → ALL over [(7,z)]
            (2, [(None, "n")]),          # null sub-field → pred null → non-match
            (3, [None]),                 # no valid elements → ALL vacuous, ANY false
        ],
        "id long, struct_array array<struct<sub_int:long, sub_str:string>>",
    )

    def ids(expr):
        return sorted(r.id for r in df.filter(compile_expr(expr, df.schema)).collect())

    assert ids("MATCH_ALL(struct_array, $[sub_int] > 1)") == [1, 3]
    assert ids("MATCH_ANY(struct_array, $[sub_int] > 1)") == [1]
    assert ids("element_filter(struct_array, $[sub_int] > 1)") == [1]
    assert ids("MATCH_EXACT(struct_array, $[sub_int] > 1, threshold=0)") == [2, 3]


def test_struct_subfield_projection(spark):
    """structA[sub_field] projects the sub-field across all elements as an
    array (PR #47172; struct_array_element_query.py:181-370): usable with
    the array_contains family, array_length, and after an element index.
    Out-of-bounds element access is NULL, not a runtime error."""
    df = spark.createDataFrame(
        [
            (1, [(5, "Red"), (150, "Blue")]),
            (2, [(1, "Red")]),
            (3, []),
            (4, [(5, "Green"), (101, "Blue")]),
        ],
        "id long, structA array<struct<int_val:long, color:string>>",
    )

    def ids(expr):
        return sorted(r.id for r in df.filter(compile_expr(expr, df.schema)).collect())

    assert ids("array_contains(structA[int_val], 5)") == [1, 4]
    assert ids('array_contains(structA[color], "Red")') == [1, 2]
    assert ids('array_contains_all(structA[color], ["Red", "Blue"])') == [1]
    assert ids("array_contains_any(structA[int_val], [101, 150])") == [1, 4]
    assert ids("array_length(structA[color]) == 2") == [1, 4]
    assert ids("structA[0][int_val] == 5") == [1, 4]  # empty array → NULL, no error
    assert ids(
        'array_contains(structA[int_val], 5) && element_filter(structA, $[color] == "Blue")'
    ) == [1, 4]
    with pytest.raises(ExprError, match="not found"):
        compile_expr("array_contains(structA[nope], 5)", df.schema)


def test_expr_review_fixes_round3(spark):
    """Regression bundle from the round-3 expression review: typed-bucket
    scalar JSON compares, escape preservation in regex/LIKE, json_contains
    with array elements, exists on stored-null keys, empty text_match,
    arity errors, random_sample validation."""
    df = spark.createDataFrame(
        [
            (1, '{"v": 1, "arr": [[1, 2], [3]], "n": null}', "abc123"),
            (2, '{"v": "1"}', "d123"),
            (3, '{"v": 7}', "100%"),
        ],
        "id long, js string, s string",
    )

    def ids(expr):
        return sorted(r.id for r in df.filter(compile_expr(expr, df.schema)).collect())

    # typed buckets: a numeric literal never matches a stored string (== and
    # range forms agree with the IN path)
    assert ids('js["v"] == 1') == [1]
    assert ids('js["v"] == "1"') == [2]
    assert ids('js["v"] > 0') == [1, 3]
    assert ids('0 < js["v"] < 5') == [1]
    # cross-type values are skipped for != too (typed buckets don't compare)
    assert ids('js["v"] != 1') == [3]
    # escapes: \d stays a regex class, \% a literal LIKE percent
    assert ids('s =~ "\\\\d{3}"') == [1, 2, 3]
    assert ids('s like "100\\\\%"') == [3]
    # array-element containment in a JSON array-of-arrays
    assert ids('json_contains(js["arr"], [1, 2])') == [1]
    assert ids('json_contains(js["arr"], [2, 1])') == []
    # a key stored as JSON null EXISTS; a missing key does not
    assert ids('exists js["n"]') == [1]
    assert ids('exists js["nope"]') == []
    # no-token text_match matches nothing (not an AnalysisException)
    assert ids('text_match(s, "!!!")') == []
    # arity and sample-range validation raise ExprError
    for bad in ["starts_with(s)", "empty()", "array_length()",
                "random_sample(2.5)", "random_sample(-1)"]:
        with pytest.raises(ExprError):
            compile_expr(bad, df.schema)
    # random_sample keeps roughly the requested fraction
    n = df.filter(compile_expr("random_sample(0.5)", df.schema)).count()
    assert 0 <= n <= 3


def test_element_pred_rejects_json_refs(spark):
    df = spark.createDataFrame(
        [(1, '{"k": 5}', [(10, "a")])],
        "id long, js string, sa array<struct<x:long, s:string>>",
    )
    with pytest.raises(ExprError, match="document field"):
        compile_expr('MATCH_ANY(sa, $[x] > js["k"])', df.schema)


def test_isolation_key_vs_column_not_a_pin(spark):
    from milvus_spark.plans.expr import validate_partition_key_isolation

    validate_partition_key_isolation('pk == 3 && other > 1', "pk")
    with pytest.raises(ExprError, match="not found"):
        validate_partition_key_isolation("pk == other_col", "pk")


def test_timestamptz_iso_interval_literals(spark, sf_dir):
    """Plan.g4:4-5 TimestamptzCompare grammar: iso/interval literals,
    both operand orders, calendar month arithmetic, validation errors."""
    from milvus_spark.session import load_table

    e = load_table(spark, sf_dir, "events")
    lang = e.filter(compile_expr(
        'ts + interval "P10D" > iso "2024-01-25T00:00:00Z" and ts <= iso "2024-01-20"',
        e.schema,
    )).count()
    api = e.filter(
        (F.col("ts") + F.expr("INTERVAL 10 DAY") > F.lit("2024-01-25").cast("timestamp"))
        & (F.col("ts") <= F.lit("2024-01-20").cast("timestamp"))
    ).count()
    assert lang == api > 0
    # reversed operand order (TimestamptzCompareReverse) and subtraction
    rev = e.filter(compile_expr('iso "2024-02-01" > ts - interval "PT12H"', e.schema)).count()
    fwd = e.filter(compile_expr('ts - interval "PT12H" < iso "2024-02-01"', e.schema)).count()
    assert rev == fwd
    # calendar month arithmetic is not a fixed-day shift: P1M from Jan 31
    # lands on Feb 29 (2024), not Mar 2
    one = spark.createDataFrame([("2024-01-31 00:00:00",)], "t string").select(
        F.col("t").cast("timestamp").alias("ts")
    )
    hit = one.filter(compile_expr('ts + interval "P1M" == iso "2024-02-29"', one.schema)).count()
    assert hit == 1
    # validation matrix
    for bad in [
        'interval "P1D" + ts > iso "2024-01-01"',   # interval on the left
        'value + interval "P1D" > iso "2024-01-01"',  # non-timestamptz field
        'ts > iso "garbage"',                        # bad timestamp text
        'ts + interval "1 day" > iso "2024-01-01"',  # non-ISO-8601 duration
    ]:
        with pytest.raises(ExprError):
            compile_expr(bad, e.schema)
    # a column literally named iso/interval is still addressable (soft keyword)
    import pyspark.sql.types as T

    sch = T.StructType([T.StructField("iso", T.LongType())])
    assert compile_expr("iso > 5", sch) is not None


def test_grammar_literal_forms(spark, sf_dir):
    """Plan.g4 literal forms: RawStringLiteral (no escape processing),
    trailing commas in array literals and call args, named
    minimum_should_match on text_match (textMatchOption)."""
    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    # raw string == verbatim regex
    a = ids_for(o, compile_expr('o_orderpriority =~ r"^1-.*"', o.schema), "o_orderkey")
    b = ids_for(o, F.col("o_orderpriority").rlike("^1-.*"), "o_orderkey")
    assert a == b
    # raw strings keep backslashes verbatim (\\d stays a regex class)
    assert compile_expr(r'o_orderpriority =~ r"^\d-"', o.schema) is not None
    # trailing commas
    t1 = ids_for(o, compile_expr('o_orderstatus in ["O", "F",]', o.schema), "o_orderkey")
    t2 = ids_for(o, compile_expr('o_orderstatus in ["O", "F"]', o.schema), "o_orderkey")
    assert t1 == t2
    assert compile_expr('starts_with(o_orderpriority, "1",)', o.schema) is not None
    # named minimum_should_match == positional form
    n1 = d.filter(
        compile_expr('text_match(text, "spark merge", minimum_should_match=2)', d.schema)
    ).count()
    n2 = d.filter(compile_expr('text_match(text, "spark merge", 2)', d.schema)).count()
    assert n1 == n2 > 0
    with pytest.raises(ExprError, match="minimum_should_match"):
        compile_expr('text_match(text, "q", msm=1)', d.schema)
    with pytest.raises(ExprError, match="both"):
        compile_expr('text_match(text, "q", 2, minimum_should_match=2)', d.schema)


def test_integer_radix_and_unicode_escapes(spark, sf_dir):
    """Plan.g4 IntegerConstant radix forms (hex/binary/octal) and \\uXXXX
    universal character names in string literals (utils.go:32)."""
    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    base = ids_for(o, compile_expr("o_custkey == 16", o.schema), "o_orderkey")
    for form in ("0x10", "0X10", "0b10000", "020"):
        assert ids_for(o, compile_expr(f"o_custkey == {form}", o.schema), "o_orderkey") == base, form
    d = spark.createDataFrame([("A",), ("B",)], "s string")
    assert d.filter(compile_expr('s == "\\u0041"', d.schema)).count() == 1


def _damerau(a: str, b: str) -> int:
    """Independent unrestricted Damerau-Levenshtein (Lowrance-Wagner) —
    deliberately NOT derived from _fuzzy_variants, so the equivalence test
    below is non-circular."""
    INF = len(a) + len(b)
    da: dict = {}
    d = [[0] * (len(b) + 2) for _ in range(len(a) + 2)]
    d[0][0] = INF
    for i in range(len(a) + 1):
        d[i + 1][0] = INF
        d[i + 1][1] = i
    for j in range(len(b) + 1):
        d[0][j + 1] = INF
        d[1][j + 1] = j
    for i in range(1, len(a) + 1):
        db = 0
        for j in range(1, len(b) + 1):
            k, l = da.get(b[j - 1], 0), db
            if a[i - 1] == b[j - 1]:
                cost, db = 0, j
            else:
                cost = 1
            d[i + 1][j + 1] = min(
                d[i][j] + cost,
                d[i + 1][j] + 1,
                d[i][j + 1] + 1,
                d[k][l] + (i - k - 1) + 1 + (j - l - 1),
            )
        da[a[i - 1]] = i
    return d[len(a) + 1][len(b) + 1]


def _plain_lev(a: str, b: str) -> int:
    prev = list(range(len(b) + 1))
    for i in range(1, len(a) + 1):
        cur = [i] + [0] * len(b)
        for j in range(1, len(b) + 1):
            cur[j] = min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (a[i - 1] != b[j - 1]))
        prev = cur
    return prev[len(b)]


def test_fuzzy_variants_equal_true_damerau_exhaustive():
    """The (variant, cost) expansion is EXACTLY the bounded Damerau
    predicate for d ≤ 2 — exhaustive over a 3-letter alphabet up to length
    5 on both sides, checked against the independent DP above (r4 advice:
    the previous expansion missed transpositions whose adjacency is
    created by a deletion, e.g. query 'axb' vs token 'ba' at d=2)."""
    import itertools

    from milvus_spark.plans.expr import _fuzzy_variants

    words = [""] + [
        "".join(p) for n in range(1, 6) for p in itertools.product("abc", repeat=n)
    ]
    for d in (1, 2):
        for q in words:
            vs = _fuzzy_variants(q, d)
            for t in words:
                pred = any(c + _plain_lev(v, t) <= d for v, c in vs)
                truth = _damerau(q, t) <= d
                assert pred == truth, f"d={d} q={q!r} t={t!r} dam={_damerau(q, t)}"


def test_fuzzy_delete_then_transpose_matches(spark):
    """End-to-end: the advisor's counterexample now matches in Spark."""
    from milvus_spark.plans.expr import compile_expr

    df = spark.createDataFrame([("ba",), ("zz",)], "text string")
    c = compile_expr('text_match_fuzzy(text, "axb", max_edit_distance=2)', df.schema)
    assert [r.text for r in df.filter(c).collect()] == ["ba"]
