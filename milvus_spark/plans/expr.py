"""Compiler for the Milvus boolean filter-expression language → pyspark Column.

The surface grammar is re-implemented from the reference's published ANTLR
grammar (internal/parser/planparserv2/Plan.g4:1-208) and its protobuf IR
(pkg/proto/plan.proto:312-337, 21 Expr variants); execution semantics follow
the C++ expression kernels (internal/core/src/exec/expression/*.cpp).
This file contains no reference code — it is a fresh recursive-descent /
Pratt parser emitting Catalyst Column expressions, so every filter enjoys
predicate pushdown, constant folding, and whole-stage codegen for free
(the reference hand-rolls SIMD kernels for the same ops).

Supported surface (→ Spark mapping):
  - comparisons  a > 5, a == "x", a != b   → Column comparison (CompareExpr
    covers column-vs-column: plan.proto:155)
  - range        1 < a <= 10               → fused between-style conjunction
  - term         a in [1,2], a not in [..] → isin (plan.proto:161)
  - arithmetic   (a + 5) % 2 == 0, a ** 2  → native arithmetic
    (BinaryArithOpEvalRangeExpr plan.proto:249)
  - bitwise      a & 3, a | b, a ^ 2, a << 1, ~a (ArithOpType 7-11)
  - logic        &&, ||, and, or, not, !   → & | ~ with SQL 3VL
  - null         a is null / is not null   → isNull/isNotNull (plan.proto:186)
  - like         a like "pref%"            → like (pattern_match.go rewrites
    are unnecessary — Catalyst's LikeSimplification does the same)
  - regex        a =~ "^x.*"  /  a !~ p    → rlike (OpType RegexMatch)
  - text         text_match(f, "w"), phrase_match(f, "a b", slop),
                 text_match_fuzzy(f, "w", max_edit_distance=d) (Plan.g4:24-25,
                 OpType 17, d ∈ [0,2], transpositions cost 1),
                 starts_with(a, b), empty(a) (CallExpr FunctionFactory.cpp:63-65)
  - json path    meta["a"]["b"] > 1, meta['k'] == "s", exists meta['k']
    → get_json_object with type-directed cast (ColumnInfo.nested_path
    plan.proto:110; missing key is NULL per coverage_matrix.md)
  - json/array   json_contains(c, v), json_contains_all/any(c, [..]),
                 array_contains*(c, v), array_length(c) == n
    (JSONContainsExpr plan.proto:168)
  - sampling     random_sample(0.1)        → deterministic hash sample
  - templates    {param} placeholders filled from a params dict
    (plan.proto:341 is_template, fill_expression_value.go)
"""

from __future__ import annotations

import re
from dataclasses import dataclass
from functools import reduce
from typing import Any, Optional

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


class ExprError(ValueError):
    pass


def _fuzzy_variants(term: str, d: int) -> list[tuple[str, int]]:
    """(variant, cost) expansion of a query term for fuzzy matching with
    transpositions counted as one edit (tantivy FuzzyTermQuery with
    transposition_cost_one, index_reader_text.rs:99).

    A doc token t matches iff min over variants of
    cost + levenshtein(variant, t) ≤ d. For d ≤ 2 this is EXACTLY the
    (unrestricted, Lowrance-Wagner) Damerau-Levenshtein predicate, because
    every way a transposition can compose with other edits is covered:
      cost 0: the term itself (covers all-plain-lev scripts, including the
              3-char rotation two OVERLAPPING swaps produce — that rotation
              is a delete+insert, i.e. plain lev 2);
      cost 1: each single adjacent swap (inserts/substitutions commute
              with a swap, so swap-variant + lev budget d−1 covers any
              swap ∘ {ins,sub,del-elsewhere} composition);
      cost 2: (a) each pair of non-overlapping adjacent swaps, and
              (b) each delete-then-swap-the-new-neighbors — the one
              composition a swap on the original term cannot express
              (deletion is the only adjacency-creating edit; e.g.
              'axb' → 'ba' is Damerau 2 via delete 'x', swap 'ab').
    Verified exhaustively against an independent Damerau DP in
    tests/test_expr.py (alphabet³, lengths ≤ 5, both d values). The
    variants are a compile-time literal set (the query is always a
    literal), so the same list embeds verbatim in the DuckDB oracle SQL."""
    out: dict[str, int] = {term: 0}

    def swaps(s: str):
        for i in range(len(s) - 1):
            if s[i] != s[i + 1]:
                yield i, s[:i] + s[i + 1] + s[i] + s[i + 2:]

    if d >= 1:
        for _, v in swaps(term):
            out.setdefault(v, 1)
    if d >= 2:
        for i, v1 in swaps(term):
            for j, v2 in swaps(v1):
                if abs(j - i) >= 2:
                    out.setdefault(v2, 2)
        for i in range(1, len(term) - 1):
            if term[i - 1] != term[i + 1]:
                v = term[: i - 1] + term[i + 1] + term[i - 1] + term[i + 2:]
                out.setdefault(v, 2)
    return sorted(out.items())


# ------------------------------------------------------------------ tokenizer
_TOKEN_RE = re.compile(
    r"""
    (?P<ws>\s+)
  | (?P<radix>0[xX][0-9a-fA-F]+|0[bB][01]+)
  | (?P<float>\d+\.\d*(?:[eE][+-]?\d+)?|\.\d+(?:[eE][+-]?\d+)?|\d+[eE][+-]?\d+)
  | (?P<int>\d+)
  | (?P<rawstr>[rR]"[^"]*"|[rR]'[^']*')
  | (?P<str>"(?:\\.|[^"\\])*"|'(?:\\.|[^'\\])*')
  | (?P<name>[A-Za-z_$][A-Za-z0-9_$]*)
  | (?P<tmpl>\{[A-Za-z_][A-Za-z0-9_]*\})
  | (?P<op>\*\*|<<|>>|<=|>=|==|!=|=~|!~|&&|\|\||[-+*/%()\[\],<>~!&|^=])
    """,
    re.VERBOSE,
)

_KEYWORDS = {"and", "or", "not", "in", "like", "is", "null", "true", "false", "exists"}


@dataclass
class Tok:
    kind: str  # 'float','int','str','name','tmpl','op','kw','end'
    text: str
    pos: int


def _tokenize(s: str) -> list[Tok]:
    out, i = [], 0
    while i < len(s):
        m = _TOKEN_RE.match(s, i)
        if not m:
            raise ExprError(f"unexpected character {s[i]!r} at {i} in {s!r}")
        i = m.end()
        kind = m.lastgroup
        if kind == "ws":
            continue
        text = m.group()
        if kind == "name" and text.lower() in _KEYWORDS:
            out.append(Tok("kw", text.lower(), m.start()))
        else:
            out.append(Tok(kind, text, m.start()))
    out.append(Tok("end", "", len(s)))
    return out


# ------------------------------------------------------------------ AST nodes
@dataclass
class Lit:
    value: Any  # python int/float/str/bool/None/list


@dataclass
class Field:
    name: str


@dataclass
class IsoLit:
    """``iso '2025-01-01T00:00:00Z'`` — a TIMESTAMPTZ literal
    (Plan.g4:4-5 ISO token; timestamptz.ValidateAndReturnUnixMicroTz)."""

    micros: int  # epoch microseconds, UTC


@dataclass
class IntervalLit:
    """``interval 'P1Y2M3DT4H5M6S'`` — an ISO-8601 duration
    (Plan.g4:4-5 INTERVAL token; parseISODuration utils.go:981-1012)."""

    years: int = 0
    months: int = 0
    days: int = 0
    hours: int = 0
    minutes: int = 0
    seconds: int = 0


_ISO_DURATION_RE = re.compile(
    r"^P(?:(\d+)Y)?(?:(\d+)M)?(?:(\d+)D)?"
    r"(?:T(?:(\d+)H)?(?:(\d+)M)?(?:(\d+)S)?)?$"
)


def _parse_iso_duration(s: str) -> IntervalLit:
    m = _ISO_DURATION_RE.match(s.strip())
    if not m:
        raise ExprError(f"invalid ISO 8601 duration: {s!r}")
    vals = [int(g) if g else 0 for g in m.groups()]
    return IntervalLit(*vals)


def _parse_iso_ts(s: str) -> int:
    """ISO timestamp text → epoch micros; a missing offset defaults to the
    session timezone (UTC here, matching spark.sql.session.timeZone)."""
    from datetime import datetime, timedelta, timezone

    t = s.strip().replace("Z", "+00:00").replace(" ", "T")
    try:
        dt = datetime.fromisoformat(t)
    except ValueError as e:
        raise ExprError(f"invalid ISO timestamp: {s!r}") from e
    if dt.tzinfo is None:
        dt = dt.replace(tzinfo=timezone.utc)
    return (dt - datetime(1970, 1, 1, tzinfo=timezone.utc)) // timedelta(
        microseconds=1
    )


@dataclass
class JsonPath:
    base: str
    path: list[Any]  # str keys / int indexes


@dataclass
class Un:
    op: str
    x: Any


@dataclass
class Bin:
    op: str
    a: Any
    b: Any


@dataclass
class Call:
    fn: str
    args: list[Any]
    kwargs: Optional[dict] = None


@dataclass
class Ident:
    """A bare-identifier subscript (``structA[int_val]``) — distinct from a
    quoted-string JSON key so the compiler can resolve it as a struct-array
    sub-field projection."""

    name: str


@dataclass
class ElemField:
    """``$[sub_field]`` — a struct-array element's sub-field, only meaningful
    inside an ``element_filter``/``MATCH_*`` element-level predicate
    (planparserv2 parser_visitor.go:1327-1333: ``$[f]`` outside ElementFilter
    context is a parse error)."""

    name: str


@dataclass
class IsNull:
    x: Any
    negated: bool


@dataclass
class InList:
    x: Any
    items: Any
    negated: bool


# ------------------------------------------------------------------ parser
# precedence (binding power), loosest → tightest; mirrors Plan.g4 ordering
_BIN_PREC = {
    "or": 1, "||": 1,
    "and": 2, "&&": 2,
    "|": 3, "^": 4, "&": 5,
    "==": 6, "!=": 6, "=~": 6, "!~": 6, "like": 6, "in": 6, "is": 6,
    "<": 7, "<=": 7, ">": 7, ">=": 7,
    "<<": 8, ">>": 8,
    "+": 9, "-": 9,
    "*": 10, "/": 10, "%": 10,
    "**": 12,
}
_COMPARE = {"<", "<=", ">", ">="}


class _Parser:
    def __init__(self, toks: list[Tok], params: dict[str, Any]):
        self.toks = toks
        self.i = 0
        self.params = params

    def peek(self) -> Tok:
        return self.toks[self.i]

    def next(self) -> Tok:
        t = self.toks[self.i]
        self.i += 1
        return t

    def expect(self, text: str) -> Tok:
        t = self.next()
        if t.text != text:
            raise ExprError(f"expected {text!r}, got {t.text!r} at {t.pos}")
        return t

    # Pratt loop
    def parse(self, min_bp: int = 0) -> Any:
        lhs = self.parse_prefix()
        while True:
            t = self.peek()
            op = t.text.lower() if t.kind in ("op", "kw") else None
            if op == "not" and self.toks[self.i + 1].text.lower() == "in":
                bp = _BIN_PREC["in"]
                if bp < min_bp:
                    break
                self.next()
                self.next()
                items = self.parse(bp + 1)
                lhs = InList(lhs, items, negated=True)
                continue
            if op not in _BIN_PREC:
                break
            bp = _BIN_PREC[op]
            if bp < min_bp:
                break
            self.next()
            if op == "in":
                items = self.parse(bp + 1)
                lhs = InList(lhs, items, negated=False)
            elif op == "is":
                neg = False
                if self.peek().text.lower() == "not":
                    self.next()
                    neg = True
                nxt = self.next()
                if nxt.text.lower() != "null":
                    raise ExprError(f"expected null after is at {nxt.pos}")
                lhs = IsNull(lhs, negated=neg)
            elif op in _COMPARE:
                rhs = self.parse(bp + 1)
                node = Bin(op, lhs, rhs)
                # chained range: a < b < c  →  (a < b) and (b < c)
                while self.peek().text in _COMPARE:
                    op2 = self.next().text
                    rhs2 = self.parse(bp + 1)
                    node = Bin("and", node, Bin(op2, rhs, rhs2))
                    rhs = rhs2
                lhs = node
            elif op == "**":  # right associative
                rhs = self.parse(bp)
                lhs = Bin(op, lhs, rhs)
            else:
                rhs = self.parse(bp + 1)
                lhs = Bin(op, lhs, rhs)
        return lhs

    def parse_prefix(self) -> Any:
        t = self.next()
        txt = t.text
        low = txt.lower()
        if t.kind == "op":
            if txt == "(":
                e = self.parse(0)
                self.expect(")")
                return e
            if txt == "[":
                items = []
                if self.peek().text != "]":
                    items.append(self.parse(3))
                    while self.peek().text == ",":
                        self.next()
                        if self.peek().text == "]":
                            break  # trailing comma (grammar: (',' expr)* ','?)
                        items.append(self.parse(3))
                self.expect("]")
                vals = []
                for it in items:
                    # fold signed numeric constants: -1 parses as Un('-', 1)
                    if (
                        isinstance(it, Un)
                        and it.op in ("-", "+")
                        and isinstance(it.x, Lit)
                        and isinstance(it.x.value, (int, float))
                    ):
                        it = Lit(-it.x.value if it.op == "-" else it.x.value)
                    if not isinstance(it, Lit):
                        raise ExprError("list literals must contain constants")
                    vals.append(it.value)
                return Lit(vals)
            if txt in ("-", "+", "~", "!"):
                return Un(txt, self.parse(11))
        if t.kind == "kw":
            if low == "not":
                return Un("not", self.parse(3))
            if low == "exists":
                return Call("exists", [self.parse(11)])
            if low in ("true", "false"):
                return Lit(low == "true")
            if low == "null":
                return Lit(None)
        if t.kind == "radix":
            # hex/binary integer constants (Plan.g4 IntegerConstant)
            return Lit(int(txt, 0))
        if t.kind == "int":
            # C-style octal: a leading zero with octal digits (Plan.g4
            # OctalConstant — '017' is 15); plain '0' and decimals as-is
            if len(txt) > 1 and txt[0] == "0" and all(c in "01234567" for c in txt[1:]):
                return Lit(int(txt, 8))
            return Lit(int(txt))
        if t.kind == "float":
            return Lit(float(txt))
        if t.kind == "str":
            return Lit(_unquote(txt))
        if t.kind == "rawstr":
            # RawStringLiteral (Plan.g4): no escape processing — backslashes
            # reach the regex/LIKE engine verbatim
            return Lit(txt[2:-1])
        if t.kind == "tmpl":
            key = txt[1:-1]
            if key not in self.params:
                raise ExprError(f"missing template param {key!r}")
            return Lit(self.params[key])
        if t.kind == "name":
            # timestamptz literals (Plan.g4:4-5): iso '<ts>' / interval '<dur>'
            # — contextual soft keywords, only consumed when a string
            # literal follows (a column literally named iso stays usable)
            if txt.lower() in ("iso", "interval") and self.peek().kind == "str":
                lit = _unquote(self.next().text)
                if txt.lower() == "iso":
                    return IsoLit(_parse_iso_ts(lit))
                return _parse_iso_duration(lit)
            # $[sub_field] — struct-array element sub-field reference
            if txt == "$" and self.peek().text == "[":
                self.next()
                sub = self.next()
                if sub.kind != "name":
                    raise ExprError(f"expected sub-field name in $[...] at {sub.pos}")
                self.expect("]")
                return ElemField(sub.text)
            # function call?
            if self.peek().text == "(":
                self.next()
                args: list[Any] = []
                kwargs: dict[str, Any] = {}
                while self.peek().text != ")":
                    if args or kwargs:
                        self.expect(",")
                        if self.peek().text == ")":
                            break  # trailing comma (grammar: ( expr (',' expr)* ','? )?)
                    # named argument (threshold=3)?
                    if (
                        self.peek().kind == "name"
                        and self.toks[self.i + 1].text == "="
                    ):
                        key = self.next().text.lower()
                        self.next()
                        kwargs[key] = self.parse(3)
                    else:
                        # full boolean binding power: predicate arguments
                        # (element_filter / MATCH_*) may contain &&/||;
                        # ',' is not an operator so args still split there
                        args.append(self.parse(0))
                self.expect(")")
                return Call(txt.lower(), args, kwargs or None)
            # subscripts → json path / array index / struct-array sub-field
            if self.peek().text == "[":
                path = []
                while self.peek().text == "[":
                    self.next()
                    sub = self.next()
                    if sub.kind == "str":
                        path.append(_unquote(sub.text))
                    elif sub.kind == "int":
                        path.append(int(sub.text))
                    elif sub.kind == "name":
                        # bare identifier: struct-array sub-field projection
                        # ``structA[int_val]`` (PR #47172 — the sub-field as
                        # an array of per-element values); resolved against
                        # the schema at compile time
                        path.append(Ident(sub.text))
                    else:
                        raise ExprError(f"bad subscript {sub.text!r} at {sub.pos}")
                    self.expect("]")
                return JsonPath(txt, path)
            return Field(txt)
        raise ExprError(f"unexpected token {txt!r} at {t.pos}")


_ESCAPES = {"n": "\n", "t": "\t", "r": "\r", "0": "\0"}


def _unquote(s: str) -> str:
    """Interpret standard escape sequences (\\n, \\t, \\r, \\0, \\\\, \\", \\');
    a backslash before ANY OTHER char is preserved verbatim — dropping it
    would corrupt regex classes (\\d → d) and LIKE escapes (\\% must reach
    Spark's LIKE, whose default escape char makes it a literal percent)."""
    body = s[1:-1]
    # \uXXXX universal character names unescape first (the reference's
    # unicodeEscapeRegex pass, utils.go:32)
    body = re.sub(
        r"\\u([0-9a-fA-F]{4})", lambda m: chr(int(m.group(1), 16)), body
    )

    def sub(m: "re.Match") -> str:
        c = m.group(1)
        if c in _ESCAPES:
            return _ESCAPES[c]
        if c in ("\\", '"', "'"):
            return c
        return "\\" + c

    return re.sub(r"\\(.)", sub, body)



def _json_path_str(path: list) -> str:
    """JSONPath string: plain identifiers dot-chain; keys with dots or
    other metacharacters use bracket quoting ($['a.b']) so they address
    the literal top-level key, not a nested chain."""
    out = "$"
    for p in path:
        if isinstance(p, Ident):
            p = p.name
        if isinstance(p, int):
            out += f"[{p}]"
        elif re.fullmatch(r"[A-Za-z_][A-Za-z0-9_]*", p):
            out += f".{p}"
        else:
            out += f"['{p}']"
    return out


# ------------------------------------------------------------------ compiler
class Compiler:
    """AST → pyspark Column, schema-aware (JSON vs ARRAY vs MAP subscripts)."""

    def __init__(self, schema: Optional[T.StructType] = None):
        self.schema = schema
        self.fields = {f.name: f.dataType for f in schema.fields} if schema else {}
        # element-predicate context: (lambda variable Column, element StructType
        # or None) while compiling inside element_filter / MATCH_*
        self._elem: Optional[tuple] = None

    def col_type(self, name: str):
        return self.fields.get(name)

    def compile(self, node: Any) -> Column:
        if isinstance(node, Lit):
            return F.lit(node.value)
        if isinstance(node, IsoLit):
            return F.timestamp_micros(F.lit(node.micros))
        if isinstance(node, IntervalLit):
            raise ExprError(
                "interval literals only combine as <timestamptz> ± interval '…'"
            )
        if isinstance(node, Field):
            if self._elem is not None:
                raise ExprError(
                    f"element-level predicate cannot reference document field "
                    f"{node.name!r} (MATCH predicates must be evaluated at "
                    f"element level)"
                )
            return F.col(node.name)
        if isinstance(node, ElemField):
            if self._elem is None:
                raise ExprError(
                    f"$[{node.name}] can only be used inside "
                    f"element_filter/MATCH_* (parser_visitor.go:1327)"
                )
            var, et = self._elem
            if isinstance(et, T.StructType) and node.name not in et.fieldNames():
                raise ExprError(
                    f"sub-field {node.name!r} not found in struct-array element"
                )
            return var[node.name]
        if isinstance(node, JsonPath):
            if self._elem is not None:
                # same rule as plain Field refs: element-level predicates
                # evaluate per element — no document columns of any shape
                raise ExprError(
                    f"element-level predicate cannot reference document "
                    f"field {node.base!r}"
                )
            return self._subscript(node)
        if isinstance(node, Un):
            x = self.compile(node.x)
            if node.op == "-":
                return -x
            if node.op == "+":
                return x
            if node.op in ("~",):
                return F.bitwise_not(x)
            if node.op in ("not", "!"):
                return ~x
        if isinstance(node, IsNull):
            x = self.compile(node.x)
            return x.isNotNull() if node.negated else x.isNull()
        if isinstance(node, InList):
            return self._in_list(node)
        if isinstance(node, Bin):
            return self._binary(node)
        if isinstance(node, Call):
            return self._call(node)
        raise ExprError(f"cannot compile {node!r}")

    # -- pieces ---------------------------------------------------------------
    def _subscript(self, node: JsonPath) -> Column:
        dt = self.col_type(node.base)
        if isinstance(dt, T.ArrayType):
            c: Column = F.col(node.base)
            ct = dt
            for p in node.path:
                if isinstance(p, (Ident, str)):
                    sub = p.name if isinstance(p, Ident) else p
                    if isinstance(ct, T.ArrayType) and isinstance(
                        ct.elementType, T.StructType
                    ):
                        # struct-array sub-field projection (structA[int_val],
                        # PR #47172): the sub-field across ALL elements as an
                        # array — Catalyst GetArrayStructFields, usable with
                        # the array_contains family and array_length
                        st = ct.elementType
                        if sub not in st.fieldNames():
                            raise ExprError(
                                f"sub-field {sub!r} not found in struct-array "
                                f"{node.base!r}"
                            )
                        c = c.getField(sub)
                        ct = T.ArrayType(st[sub].dataType)
                    elif isinstance(ct, T.StructType):
                        if sub not in ct.fieldNames():
                            raise ExprError(
                                f"sub-field {sub!r} not found in {node.base!r}"
                            )
                        c = c.getField(sub)
                        ct = ct[sub].dataType
                    else:
                        raise ExprError(
                            f"field {node.base!r} has no sub-field {sub!r}"
                        )
                    continue
                if not isinstance(p, int) or not isinstance(ct, T.ArrayType):
                    raise ExprError(f"array field {node.base} needs integer subscript")
                # Milvus arrays are 0-indexed; out-of-bounds is NULL (a
                # filter predicate on a short array drops the row), never a
                # runtime error — try_element_at, not ANSI element_at
                c = F.try_element_at(c, F.lit(p + 1))
                ct = ct.elementType
            return c
        if isinstance(dt, T.MapType):
            c = F.col(node.base)
            for p in node.path:
                c = c.getItem(p.name if isinstance(p, Ident) else p)
            return c
        # JSON string column (dynamic $meta or explicit JSON field)
        return F.get_json_object(F.col(node.base), _json_path_str(node.path))

    def _is_json(self, node: Any) -> bool:
        return isinstance(node, JsonPath) and not isinstance(
            self.col_type(node.base), (T.ArrayType, T.MapType)
        )

    def _json_variant(self, node: JsonPath) -> Column:
        """The JSON path value as a VARIANT — preserves the stored JSON
        type (number vs string vs bool), which get_json_object erases."""
        return F.try_variant_get(
            F.try_parse_json(F.col(node.base)), _json_path_str(node.path), "variant"
        )

    @staticmethod
    def _variant_is_num(typ: Column) -> Column:
        return typ.isin("BIGINT", "INT", "SMALLINT", "TINYINT", "DOUBLE", "FLOAT") | typ.startswith(
            "DECIMAL"
        )

    def _json_typed_in(self, jp: JsonPath, values: list) -> Column:
        """Mixed-type JSON IN canonicalization (issues #51489/#51567,
        coverage_matrix.md FILTER-REG-51489/51567 rows): literals bucket by
        JSON type — a stored number matches only numeric literals, a stored
        string only string literals, a bool only bool literals; buckets
        never coerce into each other ("1" ∉ [1], 1 ∉ [true])."""
        var = self._json_variant(jp)
        typ = F.schema_of_variant(var)
        nums = [
            float(v) for v in values
            if isinstance(v, (int, float)) and not isinstance(v, bool)
        ]
        strs = [v for v in values if isinstance(v, str)]
        bools = [v for v in values if isinstance(v, bool)]
        branches = []
        if nums:
            branches.append(
                self._variant_is_num(typ)
                & F.try_variant_get(var, "$", "double").isin(nums)
            )
        if strs:
            branches.append(
                (typ == "STRING") & F.try_variant_get(var, "$", "string").isin(strs)
            )
        if bools:
            branches.append(
                (typ == "BOOLEAN")
                & F.try_variant_get(var, "$", "boolean").isin([bool(b) for b in bools])
            )
        res: Column = F.lit(False)
        for b in branches:
            res = res | b
        return res

    def _json_typed_cmp(self, jp: JsonPath, op: str, v) -> Column:
        """Scalar compare of a JSON path against a literal within the
        literal's JSON-type bucket (typed-compare semantics)."""
        import operator as _op

        fn = {
            "==": _op.eq, "!=": _op.ne, "<": _op.lt,
            "<=": _op.le, ">": _op.gt, ">=": _op.ge,
        }[op]
        var = self._json_variant(jp)
        typ = F.schema_of_variant(var)
        if isinstance(v, str):
            return (typ == "STRING") & fn(
                F.try_variant_get(var, "$", "string"), F.lit(v)
            )
        return self._variant_is_num(typ) & fn(
            F.try_variant_get(var, "$", "double"), F.lit(float(v))
        )

    def _typed(self, node: Any, other: Any) -> Column:
        """JSON values arrive as strings; cast by the comparand's type
        (typed-compare semantics: numeric vs string vs bool buckets,
        coverage_matrix.md mixed-type rows)."""
        c = self.compile(node)
        if self._is_json(node):
            if isinstance(other, Lit):
                v = other.value
                if isinstance(v, bool):
                    return c.cast("boolean")
                if isinstance(v, (int, float)):
                    return c.cast("double")
                if isinstance(v, list) and v and isinstance(v[0], (int, float)) and not isinstance(v[0], bool):
                    return c.cast("double")
            return c
        return c

    def _binary(self, node: Bin) -> Column:
        op = node.op
        # timestamptz arithmetic/compare (TimestamptzCompareForward/Reverse,
        # parser_visitor.go:2873-2990): col ± interval 'P…' compiles to a
        # calendar-aware make_interval shift; iso literals become timestamp
        # literal columns so both operand orders compare naturally
        if isinstance(node.b, IntervalLit) or isinstance(node.a, IntervalLit):
            if op not in ("+", "-") or isinstance(node.a, IntervalLit):
                raise ExprError(
                    "interval literals only combine as <timestamptz> ± interval '…'"
                )
            if isinstance(node.a, Field):
                ft = self.col_type(node.a.name)
                if ft is not None and not isinstance(ft, T.TimestampType):
                    raise ExprError(
                        f"field {node.a.name!r} is not a timestamptz datatype"
                    )
            iv = node.b
            shift = F.make_interval(
                F.lit(iv.years), F.lit(iv.months), F.lit(0), F.lit(iv.days),
                F.lit(iv.hours), F.lit(iv.minutes), F.lit(iv.seconds),
            )
            base = self.compile(node.a)
            return base + shift if op == "+" else base - shift
        if op in ("and", "&&"):
            return self.compile(node.a) & self.compile(node.b)
        if op in ("or", "||"):
            return self.compile(node.a) | self.compile(node.b)
        # typed bool equality on JSON paths: a stored number/string never
        # equals a bool literal (disjoint JSON-type buckets, #51567) — a
        # plain cast('boolean') would coerce "1"/1 to true
        for x, y in ((node.a, node.b), (node.b, node.a)):
            if (
                op in ("==", "!=")
                and isinstance(y, Lit)
                and isinstance(y.value, bool)
                and self._is_json(x)
            ):
                var = self._json_variant(x)
                v = F.try_variant_get(var, "$", "boolean")
                guard = F.schema_of_variant(var) == "BOOLEAN"
                return guard & (
                    v == F.lit(y.value) if op == "==" else v != F.lit(y.value)
                )
        # typed scalar compares on JSON paths (same bucket rules the IN and
        # bool-equality paths already implement, #51489/#51567): a numeric
        # literal matches only stored numbers, a string literal only stored
        # strings — a blind cast would coerce "1" == 1 across buckets
        _CMP = ("==", "!=", "<", "<=", ">", ">=")
        _FLIP = {"<": ">", "<=": ">=", ">": "<", ">=": "<=", "==": "==", "!=": "!="}
        for x, y, eff_op in ((node.a, node.b, op), (node.b, node.a, _FLIP.get(op, op))):
            if (
                op in _CMP
                and self._is_json(x)
                and not self._is_json(y)
                and isinstance(y, Lit)
                and isinstance(y.value, (int, float, str))
                and not isinstance(y.value, bool)
            ):
                return self._json_typed_cmp(x, eff_op, y.value)
        # JSON path vs JSON path: get_json_object strings would compare
        # LEXICOGRAPHICALLY ('10' < '9'); compare numerically when both
        # sides parse as numbers, else as strings — the typed-compare
        # semantics for same-kind values
        if (
            op in ("==", "!=", "<", "<=", ">", ">=")
            and self._is_json(node.a)
            and self._is_json(node.b)
        ):
            a_s, b_s = self.compile(node.a), self.compile(node.b)
            a_d, b_d = a_s.cast("double"), b_s.cast("double")
            import operator as _op

            fn = {
                "==": _op.eq, "!=": _op.ne, "<": _op.lt,
                "<=": _op.le, ">": _op.gt, ">=": _op.ge,
            }[op]
            return F.when(
                a_d.isNotNull() & b_d.isNotNull(), fn(a_d, b_d)
            ).otherwise(fn(a_s, b_s))
        a = self._typed(node.a, node.b)
        b = self._typed(node.b, node.a)
        if op == "==":
            return a == b
        if op == "!=":
            return a != b
        if op == "<":
            return a < b
        if op == "<=":
            return a <= b
        if op == ">":
            return a > b
        if op == ">=":
            return a >= b
        if op == "+":
            return a + b
        if op == "-":
            return a - b
        if op == "*":
            return a * b
        if op == "/":
            return a / b
        if op == "%":
            return a % b
        if op == "**":
            return F.pow(a, b)
        if op == "&":
            return a.bitwiseAND(b)
        if op == "|":
            return a.bitwiseOR(b)
        if op == "^":
            return a.bitwiseXOR(b)
        if op == "<<":
            return self._shift(a, b, left=True)
        if op == ">>":
            return self._shift(a, b, left=False)
        if op == "like":
            if not isinstance(node.b, Lit) or not isinstance(node.b.value, str):
                raise ExprError("LIKE pattern must be a string literal")
            return a.like(node.b.value)
        if op in ("=~", "!~"):
            if not isinstance(node.b, Lit) or not isinstance(node.b.value, str):
                raise ExprError("regex pattern must be a string literal")
            return a.rlike(node.b.value) if op == "=~" else ~a.rlike(node.b.value)
        raise ExprError(f"unsupported operator {op}")

    @staticmethod
    def _shift(a: Column, b: Column, left: bool) -> Column:
        return F.call_function("shiftleft" if left else "shiftright", a, b)

    def _in_list(self, node: InList) -> Column:
        items = node.items
        if not isinstance(items, Lit) or not isinstance(items.value, list):
            raise ExprError("IN requires a list literal")
        if self._is_json(node.x) and items.value:
            res = self._json_typed_in(node.x, items.value)
        else:
            c = self._typed(node.x, items)
            res = c.isin(*items.value) if items.value else F.lit(False)
        return ~res if node.negated else res

    # -- struct-array element predicates (ElementFilterExpr plan.proto:264,
    # MatchExpr plan.proto:279; kernel semantics MatchExpr.cpp:43-113) -------
    _MATCH_FNS = ("match_all", "match_any", "match_least", "match_most", "match_exact")

    def _elem_array(self, node: Any, fn: str) -> tuple:
        """Resolve the first argument of element_filter/MATCH_* to an
        array-of-struct column + its element StructType (schema-aware)."""
        if not isinstance(node, Field):
            raise ExprError(f"{fn} first argument must be a struct-array field name")
        dt = self.col_type(node.name)
        if self.schema is not None:
            if dt is None:
                raise ExprError(f"{fn}: field {node.name!r} does not exist")
            if not (isinstance(dt, T.ArrayType) and isinstance(dt.elementType, T.StructType)):
                raise ExprError(f"{fn}: field {node.name!r} is not an array-of-struct")
        et = dt.elementType if isinstance(dt, T.ArrayType) else None
        return F.col(node.name), et

    def _elem_validate(self, pred: Any, fn: str) -> None:
        """Static checks mirroring planparserv2's ElementFilter/Match rules
        (plan_parser_v2_test.go:3676-3695, 3811-3830): no nesting, at least
        one ``$[f]`` reference, boolean root, no function calls, and each
        comparison keeps one side element-free (the kernels evaluate
        element-vs-literal only)."""

        def walk(n: Any):
            yield n
            for c in (
                [n.x] if isinstance(n, (Un, IsNull)) else
                [n.a, n.b] if isinstance(n, Bin) else
                [n.x, n.items] if isinstance(n, InList) else
                n.args if isinstance(n, Call) else []
            ):
                yield from walk(c)

        nodes = list(walk(pred))
        if not any(isinstance(n, ElemField) for n in nodes):
            raise ExprError(f"{fn} predicate must reference at least one $[sub_field]")
        for n in nodes:
            if isinstance(n, (Field, JsonPath)):
                name = n.name if isinstance(n, Field) else n.base
                raise ExprError(
                    f"element-level predicate cannot reference document "
                    f"field {name!r} (MATCH predicates must be evaluated at "
                    f"element level)"
                )
            if isinstance(n, Call):
                if n.fn == "element_filter" or n.fn in self._MATCH_FNS:
                    raise ExprError(f"cannot nest {n.fn} inside {fn}")
                raise ExprError(f"function calls are not supported in {fn} element predicates")
            if isinstance(n, Bin) and n.op not in ("and", "&&", "or", "||"):
                has_elem = lambda m: any(isinstance(k, ElemField) for k in walk(m))
                if has_elem(n.a) and has_elem(n.b):
                    raise ExprError(
                        f"{fn}: both sides of {n.op!r} reference $[...] — "
                        f"element predicates compare elements against constants"
                    )
        root_ok = isinstance(pred, (Bin, InList, IsNull)) or (
            isinstance(pred, Un) and pred.op in ("not", "!")
        )
        if not root_ok:
            raise ExprError(f"{fn} predicate must be a boolean expression over $[...]")

    def _elem_pred(self, pred: Any, et, fn: str):
        """Compile an element predicate AST into a Column-lambda usable by
        exists/forall/filter higher-order functions."""
        self._elem_validate(pred, fn)

        def body(e: Column) -> Column:
            prev = self._elem
            self._elem = (e, et)
            try:
                return self.compile(pred)
            finally:
                self._elem = prev

        return body

    def _match_call(self, node: Call) -> Column:
        fn = node.fn
        if self._elem is not None:
            raise ExprError(f"cannot nest {fn} inside an element predicate")
        if len(node.args) != 2:
            raise ExprError(f"{fn} takes (struct_array_field, element_predicate)")
        arr, et = self._elem_array(node.args[0], fn)
        pred = self._elem_pred(node.args[1], et, fn)
        kwargs = node.kwargs or {}
        if fn in ("match_least", "match_most", "match_exact"):
            if "threshold" not in kwargs:
                raise ExprError(f"{fn} requires threshold=N")
            thr = self._lit_value(kwargs["threshold"])
            if not isinstance(thr, int) or thr < 0:
                raise ExprError(f"{fn} threshold must be a non-negative integer")
        elif kwargs:
            raise ExprError(f"{fn} takes no named arguments")
        # invalid (null) elements are masked out before counting
        # (MatchExpr.cpp:41-44: only valid elements count; MatchAll requires
        # every VALID element to match, vacuously true with none); a NULL
        # predicate result (e.g. null sub-field) is a non-match, not 3VL
        # poison for the whole quantifier
        valid = F.filter(arr, lambda e: e.isNotNull())
        p = lambda e: F.coalesce(pred(e), F.lit(False))  # noqa: E731
        if fn == "element_filter" or fn == "match_any":
            # a row qualifies when any element passes (ElementFilterBitsNode
            # ORs element bits into the row bit; MatchAny MatchExpr.cpp:83)
            return F.exists(valid, p)
        if fn == "match_all":
            # vacuously true on empty arrays (MatchExpr.cpp:105)
            return F.forall(valid, p)
        n_hit = F.size(F.filter(valid, p))
        if fn == "match_least":
            return n_hit >= thr
        if fn == "match_most":
            return n_hit <= thr
        return n_hit == thr  # match_exact

    # fn → (min_args, max_args): short calls must fail as ExprError at
    # compile, not an IndexError / AnalysisException at run time
    _ARITY = {
        "starts_with": (2, 2), "empty": (1, 1), "exists": (1, 1),
        "array_length": (1, 1), "array_contains": (2, 2),
        "json_contains": (2, 2), "array_contains_any": (2, 2),
        "json_contains_any": (2, 2), "array_contains_all": (2, 2),
        "json_contains_all": (2, 2), "text_match": (2, 3),
        "text_match_fuzzy": (2, 2),
        "phrase_match": (2, 3), "bloom_match": (2, 2), "random_sample": (1, 1),
        "st_within": (2, 2), "st_contains": (2, 2), "st_intersects": (2, 2),
        "st_equals": (2, 2), "st_touches": (2, 2), "st_crosses": (2, 2),
        "st_overlaps": (2, 2), "st_isvalid": (1, 1), "st_dwithin": (3, 3),
    }

    def _call(self, node: Call) -> Column:
        fn = node.fn
        args = node.args
        if fn == "element_filter" or fn in self._MATCH_FNS:
            return self._match_call(node)
        spec = self._ARITY.get(fn.lower())
        if spec is not None and not spec[0] <= len(args) <= spec[1]:
            raise ExprError(
                f"{fn} expects {spec[0]}"
                + (f"-{spec[1]}" if spec[1] != spec[0] else "")
                + f" arguments, got {len(args)}"
            )
        if node.kwargs and fn not in ("text_match_fuzzy", "text_match"):
            raise ExprError(f"{fn} takes no named arguments")
        if fn == "text_match" and node.kwargs:
            # textMatchOption (Plan.g4:60-61): minimum_should_match=N named
            # form; the positional third arg remains a convenience alias
            if set(node.kwargs) != {"minimum_should_match"}:
                bad = next(iter(set(node.kwargs) - {"minimum_should_match"}))
                raise ExprError(
                    f"invalid option {bad!r} for text_match, "
                    "expected minimum_should_match"
                )
            if len(args) > 2:
                raise ExprError(
                    "text_match: minimum_should_match given both "
                    "positionally and by name"
                )
            args = list(args) + [node.kwargs["minimum_should_match"]]
        if fn == "starts_with":
            return self.compile(args[0]).startswith(self.compile(args[1]))
        if fn == "empty":
            return self.compile(args[0]) == ""
        if fn == "exists":
            x = args[0]
            if not isinstance(x, JsonPath):
                raise ExprError("exists requires a JSON path")
            if not isinstance(self.col_type(x.base), (T.ArrayType, T.MapType)):
                # EXISTS tests key PRESENCE — a key stored with JSON null
                # exists, but get_json_object returns NULL for both cases.
                # Test membership in the parent container's key set instead.
                *parent, last = [
                    p.name if isinstance(p, Ident) else p for p in x.path
                ]
                col = F.col(x.base)
                if parent:
                    col = F.get_json_object(col, _json_path_str(parent))
                if isinstance(last, int):
                    return F.json_array_length(col) > last
                return F.array_contains(F.json_object_keys(col), last)
            return self.compile(x).isNotNull()
        if fn == "array_length":
            return F.size(self.compile(args[0]))
        if fn in ("array_contains", "json_contains"):
            v = self._lit_value(args[1])
            if isinstance(v, list):
                # element is itself an array: containment of a sub-array in
                # an array-of-arrays JSON value
                if not self._is_json(args[0]):
                    raise ExprError(
                        f"{fn}: array-literal elements require a JSON field"
                    )
                it = self._json_elem_type(v)
                nested = F.from_json(
                    self.compile(args[0]), f"array<array<{it}>>"
                )
                return F.array_contains(nested, self._typed_lit_array(v, it))
            et = self._json_elem_type(v)
            v_lit = float(v) if et == "double" else v
            return F.array_contains(self._as_array(args[0], et), v_lit)
        if fn in ("array_contains_any", "json_contains_any"):
            vs = self._lit_value(args[1])
            et = self._json_elem_type(vs)
            arr = self._typed_lit_array(vs, et)
            return F.arrays_overlap(self._as_array(args[0], et), arr)
        if fn in ("array_contains_all", "json_contains_all"):
            vs = self._lit_value(args[1])
            et = self._json_elem_type(vs)
            arr = self._typed_lit_array(vs, et)
            return F.size(F.array_except(arr, self._as_array(args[0], et))) == 0
        if fn == "text_match":
            col = self.compile(args[0])
            terms = self._lit_value(args[1])
            msm = self._lit_value(args[2]) if len(args) > 2 else 1
            toks = F.filter(F.split(F.lower(col), "[^a-z0-9]+"), lambda x: x != "")
            qs = [t for t in re.split(r"[^a-z0-9]+", str(terms).lower()) if t]
            if not qs:
                # a query with no analyzable tokens matches nothing (an
                # empty F.array() would fail analysis with a VOID type)
                return F.lit(False)
            return F.size(F.array_intersect(F.array_distinct(toks), F.array(*[F.lit(q) for q in qs]))) >= int(msm)
        if fn == "text_match_fuzzy":
            # TEXT_MATCH_FUZZY(field, "query", max_edit_distance=N)
            # (Plan.g4:24-25, OpType TextMatchFuzzy plan.proto:26). The
            # option is grammar-required; the parser enforces N ∈ [0, 2]
            # (parser_visitor.go:1018-1026 — tantivy's fuzzy automaton cap).
            kwargs = node.kwargs or {}
            if set(kwargs) - {"max_edit_distance"}:
                bad = next(iter(set(kwargs) - {"max_edit_distance"}))
                raise ExprError(
                    f"invalid option {bad!r} for text_match_fuzzy, "
                    "expected max_edit_distance"
                )
            if "max_edit_distance" not in kwargs:
                raise ExprError(
                    "max_edit_distance is required for text_match_fuzzy"
                )
            d = self._lit_value(kwargs["max_edit_distance"])
            if not isinstance(d, int) or isinstance(d, bool):
                raise ExprError(
                    f"invalid max_edit_distance value: {d!r} (must be an integer)"
                )
            if not 0 <= d <= 2:
                raise ExprError(
                    f"max_edit_distance should be in [0, 2], got {d}"
                )
            # fuzzy match requires a string column
            # (parseTextMatchOperand, parser_visitor.go:945-947)
            if isinstance(args[0], Field):
                ft = self.col_type(args[0].name)
                if ft is not None and not isinstance(ft, T.StringType):
                    raise ExprError(
                        "text_match_fuzzy operation on non-string is unsupported"
                    )
            col = self.compile(args[0])
            query = str(self._lit_value(args[1]))
            qs = [t for t in re.split(r"[^a-z0-9]+", query.lower()) if t]
            toks = F.filter(F.split(F.lower(col), "[^a-z0-9]+"), lambda x: x != "")
            if not qs:
                return F.lit(False)
            if d == 0:
                # distance 0 is exactly a term match — the cheap multiterms
                # path (index_reader_text.rs:88-92)
                return (
                    F.size(
                        F.array_intersect(
                            F.array_distinct(toks), F.array(*[F.lit(q) for q in qs])
                        )
                    )
                    >= 1
                )
            # Disjunction over per-token fuzzy matches (BooleanQuery::union,
            # index_reader_text.rs:95-106). The tantivy automaton counts an
            # adjacent transposition as ONE edit (FuzzyTermQuery
            # transposition_cost_one=true); Spark has only plain levenshtein,
            # so transpositions are pre-applied to the QUERY tokens — a
            # compile-time literal — as (variant, cost) pairs, and a doc
            # token matches when min(cost + lev(variant, tok)) ≤ d. The
            # threshold form of levenshtein early-exits JVM-side.
            preds = []
            for q in qs:
                for v, c in _fuzzy_variants(q, d):
                    budget = d - c
                    preds.append(
                        lambda x, v=v, budget=budget: F.levenshtein(
                            x, F.lit(v), budget
                        )
                        >= 0
                    )
            return F.exists(
                F.array_distinct(toks),
                lambda x: reduce(lambda a, b: a | b, [p(x) for p in preds]),
            )
        if fn == "phrase_match":
            col = self.compile(args[0])
            phrase = str(self._lit_value(args[1]))
            slop = int(self._lit_value(args[2])) if len(args) > 2 else 0
            return _phrase_match(col, phrase, slop)
        if fn == "bloom_match":
            # Client-supplied bloom membership (BloomFilterExpr plan.proto:306,
            # bloom_match.go). Semantically a big-set membership test; the
            # literal set compiles to isin (small) — a production path joins
            # against a broadcast key table / relies on parquet bloom filters.
            vals = self._lit_value(args[1])
            if not isinstance(vals, list):
                raise ExprError("bloom_match needs a list literal")
            return self.compile(args[0]).isin(*vals)
        if fn.lower() in (
            "st_within", "st_contains", "st_intersects", "st_dwithin",
            "st_equals", "st_isvalid", "st_touches", "st_crosses", "st_overlaps",
        ):
            return self._gis(fn.lower(), args)
        if fn == "random_sample":
            frac = float(self._lit_value(args[0]))
            if not 0.0 < frac < 1.0:
                # RandomSampleExpr factor domain (plan parser validation)
                raise ExprError(f"random_sample factor must be in (0, 1), got {frac}")
            if self.schema is None:
                raise ExprError("random_sample requires a schema-bound filter")
            # deterministic hash-based Bernoulli sample on the row's pk-ish
            # hash — reproducible across runs/partitions (RandomSampleNode);
            # 1e6 buckets keep small fractions meaningful (1e-6 granularity)
            return F.abs(
                F.hash(F.col(self.schema.fields[0].name))
            ) % 1000000 < int(round(frac * 1000000))
        raise ExprError(f"unknown function {fn}")

    def _gis(self, fn: str, args: list[Any]) -> Column:
        """GIS filter functions over POINT WKT columns (Plan.g4:124-132,
        GISFunctionFilterExpr.cpp). Geometry literals parse at compile time;
        per-row math is pure Catalyst (regexp extract + crossing number).
        DE-9IM degenerate cases for POINT operands: crosses/overlaps are
        identically false (wrong dimensions), touches needs a boundary."""
        from milvus_spark.operators.geo import (
            WKT_POINT_VALID_RE,
            parse_geom_literal,
            point_on_boundary,
            poly_edges_col,
            st_contains_point,
            wkt_x,
            wkt_y,
        )

        geom = self.compile(args[0])
        x, y = wkt_x(geom), wkt_y(geom)
        if fn == "st_isvalid":
            return geom.rlike(WKT_POINT_VALID_RE)
        if fn in ("st_crosses", "st_overlaps"):
            return F.lit(False)
        # geometry literals may be WKT text or WKB hex — the reference's
        # GEOMETRY type accepts both encodings on the wire (Types.h:24)
        kind, val = parse_geom_literal(str(self._lit_value(args[1])))
        if fn == "st_dwithin":
            if kind != "POINT":
                raise ExprError("st_dwithin literal must be a POINT")
            r = float(self._lit_value(args[2]))
            lx, ly = val
            return F.sqrt(F.pow(x - lx, F.lit(2)) + F.pow(y - ly, F.lit(2))) < r
        if kind == "POINT":
            lx, ly = val
            eq = (x == lx) & (y == ly)
            if fn in ("st_equals", "st_intersects", "st_contains"):
                return eq
            if fn in ("st_within",):
                return eq
            return F.lit(False)  # st_touches: equal points share interiors
        edges = poly_edges_col(val)
        # bbox pre-filter: plain range predicates Catalyst can push down /
        # prune row groups with (the RTree analog); exact test on survivors.
        # DE-9IM for POINT vs POLYGON: boundary points are not within
        # (no interior intersection) but do intersect/touch — the crossing
        # number alone is boundary-ambiguous, so test the boundary explicitly.
        xs, ys = [p[0] for p in val], [p[1] for p in val]
        bbox = (x >= min(xs)) & (x <= max(xs)) & (y >= min(ys)) & (y <= max(ys))
        odd = bbox & st_contains_point(edges, x, y)
        boundary = bbox & point_on_boundary(edges, x, y)
        if fn == "st_within":
            return odd & ~boundary
        if fn == "st_intersects":
            return odd | boundary
        if fn == "st_touches":
            return boundary
        if fn == "st_equals":
            return F.lit(False)  # a point never equals a polygon
        raise ExprError("a POINT column cannot st_contains a POLYGON literal")

    @staticmethod
    def _json_elem_type(values) -> str:
        """Element type for parsing a JSON array, chosen by the comparand's
        Python type — numeric membership must compare numerically
        (json_contains(c, 1) matches stored 1.0), not as strings."""
        vs = values if isinstance(values, list) else [values]
        if vs and all(isinstance(v, bool) for v in vs):
            return "boolean"
        if vs and all(
            isinstance(v, (int, float)) and not isinstance(v, bool) for v in vs
        ):
            return "double"
        return "string"

    def _as_array(self, node: Any, elem_type: str = "string") -> Column:
        if self._is_json(node):
            c = self.compile(node)
            return F.from_json(c, f"array<{elem_type}>")
        return self.compile(node)

    def _lit_value(self, node: Any):
        if (
            isinstance(node, Un)
            and node.op in ("-", "+")
            and isinstance(node.x, Lit)
            and isinstance(node.x.value, (int, float))
        ):
            return -node.x.value if node.op == "-" else node.x.value
        if isinstance(node, Lit):
            return node.value
        raise ExprError("expected literal argument")

    @staticmethod
    def _typed_lit_array(vs, elem_type: str) -> Column:
        if not isinstance(vs, list):
            raise ExprError("expected list literal")
        if elem_type == "double":
            vs = [float(x) for x in vs]
        return F.array(*[F.lit(x) for x in vs])


def _phrase_match(col: Column, phrase: str, slop: int) -> Column:
    """n-term sloppy phrase: ordered positions p1<…<pn per term with window
    pn−p1 ≤ n−1+slop (tantivy positions-index semantics, TextMatchIndex
    PhraseMatch) — nested exists over per-term position lists, pure JVM."""
    words = [w for w in re.split(r"[^a-z0-9]+", phrase.lower()) if w]
    toks = F.filter(F.split(F.lower(col), "[^a-z0-9]+"), lambda x: x != "")
    if not words:
        return F.lit(True)
    if len(words) == 1:
        return F.array_contains(toks, words[0])
    n = len(words)
    # guard: sequence(1, 0) DESCENDS on an empty token array → bad index
    idx = F.when(F.size(toks) > 0, F.sequence(F.lit(1), F.size(toks))).otherwise(
        F.array().cast("array<int>")
    )

    def pos_of(w: str) -> Column:
        # NB: a plain 1-arg lambda — a 2-arg lambda would be interpreted by
        # F.filter as (element, index) and silently shadow the closure
        return F.filter(idx, lambda i: F.element_at(toks, i) == w)

    pos = [pos_of(w) for w in words]
    win = n - 1 + slop

    def rec(k: int, start: Column, prev: Column) -> Column:
        return F.exists(
            pos[k],
            lambda q: (q > prev)
            & ((q - start <= win) if k == n - 1 else ((q - start <= win) & rec(k + 1, start, q))),
        )

    return F.exists(pos[0], lambda s: rec(1, s, s))


def _count_ef(node: Any) -> int:
    """Count element_filter calls in a subtree (placement validation)."""
    n = 0
    stack = [node]
    while stack:
        x = stack.pop()
        if isinstance(x, Call):
            if x.fn == "element_filter":
                n += 1
            stack.extend(x.args)
            stack.extend((x.kwargs or {}).values())
        elif isinstance(x, (Un, IsNull)):
            stack.append(x.x)
        elif isinstance(x, Bin):
            stack.extend((x.a, x.b))
        elif isinstance(x, InList):
            stack.extend((x.x, x.items))
    return n


def _split_ef(ast: Any) -> tuple:
    """Peel the element_filter call off the rightmost AND spine, returning
    ``(doc_ast_or_None, ef_call_or_None)``. Spine-only: an element_filter
    under OR/NOT or on an AND's LEFT side is not split (and will fail
    placement validation)."""
    if isinstance(ast, Call) and ast.fn == "element_filter":
        return None, ast
    if isinstance(ast, Bin) and ast.op in ("and", "&&"):
        doc_b, ef = _split_ef(ast.b)
        if ef is not None and _count_ef(ast.a) == 0:
            doc = ast.a if doc_b is None else Bin(ast.op, ast.a, doc_b)
            return doc, ef
    return ast, None


def _validate_ef_placement(ast: Any) -> None:
    """element_filter may only appear as the final AND conjunct (reachable by
    following AND right-children from the root) after a document-level
    predicate — never under OR/NOT, never on an AND's left side, and never
    more than once (plan_parser_v2_test.go:3690-3695: ``ef || ef``,
    ``ef && doc``, ``not ef`` are all rejected; PlanProto.cpp:638-690 splits
    exactly doc_pred && element_filter)."""
    total = _count_ef(ast)
    if total == 0:
        return
    _, ef = _split_ef(ast)
    if ef is None or total != 1:
        raise ExprError(
            "element_filter must be the final AND conjunct "
            "(doc_predicate && element_filter) and cannot be negated, OR-ed, "
            "or repeated"
        )


def _rewrite_dynamic(node: Any, fields: set, dynamic: str) -> Any:
    """Resolve identifiers absent from the schema into the dynamic ``$meta``
    JSON column (enable_dynamic_field semantics: unknown field ``color``
    compiles as ``$meta['color']`` with typed-compare casts; unknown JSON
    bases nest one level deeper). Schema-present names are untouched."""

    def rw(n: Any) -> Any:
        if isinstance(n, Field):
            return JsonPath(dynamic, [n.name]) if n.name not in fields else n
        if isinstance(n, JsonPath):
            return JsonPath(dynamic, [n.base, *n.path]) if n.base not in fields else n
        if isinstance(n, Un):
            return Un(n.op, rw(n.x))
        if isinstance(n, Bin):
            return Bin(n.op, rw(n.a), rw(n.b))
        if isinstance(n, Call):
            return Call(
                n.fn,
                [rw(a) for a in n.args],
                {k: rw(v) for k, v in n.kwargs.items()} if n.kwargs else None,
            )
        if isinstance(n, IsNull):
            return IsNull(rw(n.x), n.negated)
        if isinstance(n, InList):
            return InList(rw(n.x), n.items, n.negated)
        return n

    return rw(node)


def compile_expr(
    expr: str,
    schema: Optional[T.StructType] = None,
    params: Optional[dict[str, Any]] = None,
    dynamic_field: Optional[str] = None,
) -> Column:
    """Compile a Milvus filter expression string to a pyspark Column.

    ``dynamic_field``: name of the dynamic JSON column (``$meta``) —
    identifiers not in ``schema`` resolve into it (requires ``schema``)."""
    toks = _tokenize(expr)
    p = _Parser(toks, params or {})
    ast = p.parse(0)
    if p.peek().kind != "end":
        t = p.peek()
        raise ExprError(f"trailing input at {t.pos}: {t.text!r}")
    if dynamic_field and schema is not None:
        ast = _rewrite_dynamic(ast, {f.name for f in schema.fields}, dynamic_field)
    _validate_ef_placement(ast)
    return Compiler(schema).compile(ast)


def validate_partition_key_isolation(
    expr: str,
    key_field: str,
    params: Optional[dict[str, Any]] = None,
) -> None:
    """Partition-key isolation (collection property ``partitionkey.isolation``,
    exprutil/expr_checker.go ValidatePartitionKeyIsolation): the filter MUST
    pin the partition key with exactly ``key == value`` reachable only
    through ANDs — IN, ranges, OR and NOT over the key are rejected, and a
    filter that never mentions the key is rejected. Under isolation each
    partition-key value holds its own sealed index; any broader predicate
    would force a cross-partition scan the property exists to forbid."""
    if not expr:
        raise ExprError(
            "partition key not found in expr or the expr is invalid when "
            "validating partition key isolation"
        )
    toks = _tokenize(expr)
    ast = _Parser(toks, params or {}).parse(0)

    def is_key(n: Any) -> bool:
        return isinstance(n, Field) and n.name == key_field

    def walk(n: Any) -> bool:
        if isinstance(n, Bin):
            if n.op in ("and", "&&"):
                return walk(n.a) | walk(n.b)
            if n.op in ("or", "||"):
                if walk(n.a) | walk(n.b):
                    raise ExprError("partition key isolation does not support OR")
                return False
            if is_key(n.a) or is_key(n.b):
                other = n.b if is_key(n.a) else n.a
                is_const = isinstance(other, Lit) or (
                    isinstance(other, Un)
                    and other.op in ("-", "+")
                    and isinstance(other.x, Lit)
                )
                if not is_const:
                    # key-vs-column compiles to CompareExpr, which the
                    # reference validator does not recognize as a pin — the
                    # key stays unpinned (and the filter fails the
                    # not-found check unless pinned elsewhere)
                    return False
                if n.op == "==":
                    return True
                raise ExprError(
                    f"partition key isolation does not support {n.op}"
                )
            # arithmetic-wrapped keys ((key + 1) == 2) are NOT a key pin,
            # mirroring the reference (BinaryArithOpEvalRange is absent from
            # its validator's found-cases)
            return False
        if isinstance(n, Un):
            found = walk(n.x)
            if n.op in ("not", "!") and found:
                raise ExprError("partition key isolation does not support NOT")
            return found
        if isinstance(n, InList):
            if is_key(n.x):
                raise ExprError("partition key isolation does not support IN")
            return False
        if isinstance(n, IsNull):
            if is_key(n.x):
                raise ExprError(
                    "partition key isolation does not support null checks"
                )
            return False
        if isinstance(n, Call):
            for a in list(n.args) + list((n.kwargs or {}).values()):
                if is_key(a):
                    raise ExprError(
                        "partition key isolation does not support function calls "
                        "on the partition key"
                    )
                walk(a)
            return False
        return False

    if not walk(ast):
        raise ExprError(
            "partition key not found in expr or the expr is invalid when "
            "validating partition key isolation"
        )


def split_element_filter(
    expr: str,
    schema: Optional[T.StructType] = None,
    params: Optional[dict[str, Any]] = None,
    dynamic_field: Optional[str] = None,
) -> tuple:
    """Split a search filter of the form ``doc_pred && element_filter(arr,
    pred)`` into its two halves for element-level vector search (the same
    doc-expr / element-expr split the reference performs when building the
    search plan, query/PlanProto.cpp:644-656).

    Returns ``(doc_cond, struct_field_name, element_pred)`` where
    ``doc_cond`` is a Column or None, ``struct_field_name`` names the
    struct-array field targeted by element_filter (None if absent), and
    ``element_pred`` is a Column-lambda usable with ``F.filter``/``exists``
    over that array (None if absent)."""
    if not expr:
        return None, None, None
    toks = _tokenize(expr)
    p = _Parser(toks, params or {})
    ast = p.parse(0)
    if p.peek().kind != "end":
        t = p.peek()
        raise ExprError(f"trailing input at {t.pos}: {t.text!r}")
    if dynamic_field and schema is not None:
        ast = _rewrite_dynamic(ast, {f.name for f in schema.fields}, dynamic_field)
    _validate_ef_placement(ast)
    comp = Compiler(schema)
    doc_ast, ef = _split_ef(ast)
    doc_cond = comp.compile(doc_ast) if doc_ast is not None else None
    if ef is None:
        return doc_cond, None, None
    if len(ef.args) != 2:
        raise ExprError("element_filter takes (struct_array_field, element_predicate)")
    _, et = comp._elem_array(ef.args[0], "element_filter")
    pred = comp._elem_pred(ef.args[1], et, "element_filter")
    return doc_cond, ef.args[0].name, pred


def apply_filter(
    df: DataFrame,
    expr: Optional[str],
    params: Optional[dict[str, Any]] = None,
    dynamic_field: Optional[str] = None,
) -> DataFrame:
    """Filter a DataFrame with a Milvus expression string (None = no filter)."""
    if not expr:
        return df
    return df.filter(compile_expr(expr, df.schema, params, dynamic_field))
