"""TQL-flavored expression compiler: text -> bound pyspark Column.

The reference models filters as a boolean AST (conjunction / disjunction /
negation / predicate) whose operands are *extractors* resolved against each
schema at bind time (reference: libtenzir/include/tenzir/expression.hpp:134-249
and web/docs/language/expressions.md):

- **field extractor** — dotted-path *suffix* match: ``orig_h`` matches
  ``id.orig_h``; expands to a disjunction over every matching column.
- **type extractor** — ``:string`` / ``:int64`` / ``:time`` / ``:ip`` ...
  matches every column of that type.
- **meta extractor** — ``#schema`` matches the stream's schema name (we
  carry it as a regular ``_schema`` column when multiplexing schemas).
- literals — null, bool, int, float, string, duration, time, ip, subnet,
  lists thereof.

Relational operators: ``== != < <= > >= in !in ni !ni`` (reference:
libtenzir/include/tenzir/operator.hpp:44-55). Short forms (reference:
web/docs/language/expressions.md "Short Forms"):

- a bare field extractor means "field exists and is not null",
- a bare literal ``V`` means ":type-of-V == V" (any column of that type
  equals the value).

Everything happens at *plan time* in Python; the result is a plain
``pyspark.sql.Column`` so Catalyst sees an ordinary predicate and can push
it into the parquet scan — the reference's manual pushdown pass
(libtenzir/builtins/operators/where.cpp:109-117) is not re-implemented.
"""

from __future__ import annotations

import ipaddress
import re
from dataclasses import dataclass
from typing import Any

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

# ---------------------------------------------------------------------------
# AST
# ---------------------------------------------------------------------------


@dataclass
class FieldExtractor:
    path: str  # dotted suffix


@dataclass
class TypeExtractor:
    type_name: str  # tenzir type name, e.g. "ip", "string", "int64"


@dataclass
class MetaExtractor:
    name: str  # "schema" | "schema_id" | "import_time"


@dataclass
class Literal:
    value: Any
    type_name: str  # tenzir type name of the literal


@dataclass
class BinOp:
    """Arithmetic: + - * / % (reference parses binary ops by precedence
    climbing, tql/parser.cpp:508-523; v4.3 wires == != + * — we support
    the full arithmetic set)."""
    lhs: Any
    op: str
    rhs: Any


@dataclass
class FuncCall:
    """Scalar function call f(args...) (parsed by the reference at
    tql/parser.cpp:422-439; the function library is engine-defined)."""
    name: str
    args: list


@dataclass
class Predicate:
    lhs: Any
    op: str
    rhs: Any


@dataclass
class Conjunction:
    parts: list


@dataclass
class Disjunction:
    parts: list


@dataclass
class Negation:
    inner: Any


# operator negation used by the reference's expression normalizer
# (expression.cpp negate(relational_operator))
_NEGATED_OP = {"==": "!=", "!=": "==", "<": ">=", ">=": "<",
               ">": "<=", "<=": ">", "in": "!in", "!in": "in",
               "ni": "!ni", "!ni": "ni"}


# ---------------------------------------------------------------------------
# Tokenizer
# ---------------------------------------------------------------------------

# the reference's full duration unit alternation (word + abbreviation
# spellings, time.hpp:42-79), shared with the standalone parser
from tenzir_spark.functions.timeparse import _UNIT_ALT as _DUR_UNITS_ALT
from tenzir_spark.functions.timeparse import (parse_duration_ns,
                                              parse_time_ns)

_TOKEN_RE = re.compile(
    r"""
    (?P<ws>\s+)
  | (?P<comment>/\*(?:[^*]|\*(?!/))*\*/)
  | (?P<lparen>\()
  | (?P<rparen>\))
  | (?P<lbrack>\[)
  | (?P<rbrack>\])
  | (?P<comma>,)
  | (?P<and>&&)
  | (?P<or>\|\|)
  | (?P<relop>==|!=|<=|>=|<|>|!in\b|\bin\b|!ni\b|\bni\b)
  | (?P<not>!)
  | (?P<string>"(?:[^"\\]|\\.)*"|'(?:[^'\\]|\\.)*')
  | (?P<subnet>(?:\d{1,3}(?:\.\d{1,3}){3}|[0-9a-fA-F:]*::[0-9a-fA-F:.]*|(?:[0-9a-fA-F]{1,4}:){7}[0-9a-fA-F]{1,4})/\d{1,3})
  | (?P<ip>\d{1,3}(?:\.\d{1,3}){3}|[0-9a-fA-F:]*::[0-9a-fA-F:.]*)
  | (?P<time>\d{4}-\d{2}(?:-\d{2}(?:[T+ ]\d{2}(?::\d{2}(?::\d{2}(?:\.\d+)?)?(?:Z|[+-]\d{2}(?::?\d{2})?)?)?)?)?)
  | (?P<duration>\d+(?:\.\d+)?\s*(?:__DUR_UNITS__)(?:(?:\d+\.\d*|\.\d+|\d+)\s*(?:__DUR_UNITS__))*\b)
  | (?P<si>(?:\d+\.\d*|\.\d+|\d+)(?:[kKMGTPE]i?)\b)
  | (?P<number>(?:\d+\.\d*|\.\d+|\d+)(?:[eE][+-]?\d+)?)
  | (?P<typex>:[A-Za-z_][A-Za-z0-9_.]*)
  | (?P<colon>:)
  | (?P<lbrace>\{)
  | (?P<rbrace>\})
  | (?P<arrow>->)
  | (?P<metax>\#[A-Za-z_][A-Za-z0-9_]*)
  | (?P<ident>[A-Za-z_][A-Za-z0-9_.]*)
  | (?P<pattern>/(?=\S)(?:\\.|[^/\\])+/i?)
  | (?P<arith>[+\-*/%])
    """.replace("__DUR_UNITS__", _DUR_UNITS_ALT),
    re.VERBOSE,
)

_KEYWORDS = {"true": True, "false": False}


def tokenize(text: str) -> list[tuple[str, str]]:
    tokens: list[tuple[str, str]] = []
    pos = 0
    while pos < len(text):
        m = _TOKEN_RE.match(text, pos)
        if not m:
            raise ValueError(f"cannot tokenize expression at: {text[pos:pos + 20]!r}")
        kind = m.lastgroup
        if kind == "pattern" and tokens and tokens[-1][0] not in (
                "relop", "lparen", "comma", "and", "or", "not"):
            # '/' after a value position is division, not a pattern
            # literal — patterns only occur as operands ("x == /re/"),
            # which disambiguates "a/2 + b/3" without lexer backtracking
            tokens.append(("arith", "/"))
            pos += 1
            continue
        pos = m.end()
        if kind in ("ws", "comment"):
            # /* ... */ comments are whitespace inside expressions,
            # non-nesting — the first */ closes
            # (expression_parseable.cpp:214-242)
            continue
        if kind == "si":
            # SI magnitude literals (reference si_literal parser,
            # data.cpp: 1k=1000, 1Ki=1024, ... up to E/Ei) fold into
            # plain numbers at lex time
            sm = re.match(r"^([\d.]+)([kKMGTPE])(i?)$", m.group())
            num, unit, binary = sm.group(1), sm.group(2), sm.group(3)
            exp = {"k": 1, "K": 1, "M": 2, "G": 3,
                   "T": 4, "P": 5, "E": 6}[unit]
            factor = (1024 if binary else 1000) ** exp
            val = float(num) * factor
            tokens.append(("number",
                           str(int(val)) if val == int(val) else str(val)))
            continue
        tokens.append((kind, m.group()))
    return tokens


# ---------------------------------------------------------------------------
# Parser (precedence: ||  <  &&  <  !  <  predicate)
# ---------------------------------------------------------------------------


class _Parser:
    def __init__(self, tokens: list[tuple[str, str]]):
        self.toks = tokens
        self.i = 0

    def peek(self) -> tuple[str, str] | None:
        return self.toks[self.i] if self.i < len(self.toks) else None

    def next(self) -> tuple[str, str]:
        tok = self.toks[self.i]
        self.i += 1
        return tok

    def expect(self, kind: str) -> tuple[str, str]:
        tok = self.peek()
        if tok is None or tok[0] != kind:
            raise ValueError(f"expected {kind}, got {tok}")
        return self.next()

    def parse(self):
        node = self.disjunction()
        if self.peek() is not None:
            raise ValueError(f"trailing tokens: {self.toks[self.i:]}")
        return node

    def disjunction(self):
        parts = [self.conjunction()]
        while self.peek() and self.peek()[0] == "or":
            self.next()
            parts.append(self.conjunction())
        return parts[0] if len(parts) == 1 else Disjunction(parts)

    def conjunction(self):
        parts = [self.negation()]
        while self.peek() and self.peek()[0] == "and":
            self.next()
            parts.append(self.negation())
        return parts[0] if len(parts) == 1 else Conjunction(parts)

    def negation(self):
        if self.peek() and self.peek()[0] == "not":
            self.next()
            return Negation(self.negation())
        if self.peek() and self.peek()[0] == "lparen":
            # try a parenthesized BOOLEAN group; if a relop/arith follows
            # the closing paren, it was an arithmetic group — backtrack
            # and reparse as a predicate (e.g. "(a + 1) > 2")
            mark = self.i
            try:
                self.next()
                node = self.disjunction()
                self.expect("rparen")
            except ValueError:
                self.i = mark
                return self.predicate()
            nxt = self.peek()
            if nxt and nxt[0] in ("relop", "arith"):
                self.i = mark
                return self.predicate()
            return node
        return self.predicate()

    def predicate(self):
        lhs = self.operand()
        tok = self.peek()
        if tok and tok[0] == "relop":
            op = self.next()[1]
            rhs = self.operand()
            return Predicate(lhs, op, rhs)
        # short forms: bare extractor => != null; bare literal => :T == literal
        if isinstance(lhs, (FieldExtractor, TypeExtractor, MetaExtractor)):
            return Predicate(lhs, "!=", Literal(None, "null"))
        if isinstance(lhs, Literal):
            return Predicate(TypeExtractor(lhs.type_name), "==", lhs)
        raise ValueError(f"cannot use {lhs} as a predicate")

    # -- operand grammar: additive < multiplicative < unary < primary ----

    def operand(self):
        return self.additive()

    def additive(self):
        node = self.multiplicative()
        while self.peek() and self.peek()[0] == "arith" and self.peek()[1] in "+-":
            op = self.next()[1]
            node = BinOp(node, op, self.multiplicative())
        return node

    def multiplicative(self):
        node = self.unary()
        while self.peek() and self.peek()[0] == "arith" and self.peek()[1] in ("*", "/", "%"):
            op = self.next()[1]
            node = BinOp(node, op, self.unary())
        return node

    def unary(self):
        tok = self.peek()
        if tok and tok[0] == "arith" and tok[1] in "+-":
            sign = self.next()[1]
            inner = self.unary()
            if sign == "+":
                return inner
            if isinstance(inner, Literal) and inner.type_name in ("int64", "double", "duration"):
                return Literal(-inner.value, inner.type_name)
            return BinOp(Literal(0, "int64"), "-", inner)
        return self.primary()

    def primary(self):
        tok = self.peek()
        if tok is None:
            raise ValueError("unexpected end of expression")
        kind, text = tok
        if kind == "lparen":
            self.next()
            node = self.additive()
            self.expect("rparen")
            return node
        if kind == "lbrack":
            self.next()
            items = []
            while self.peek() and self.peek()[0] != "rbrack":
                item = self.operand()
                if not isinstance(item, Literal):
                    raise ValueError("list literals may only contain literals")
                items.append(item.value)
                if self.peek() and self.peek()[0] == "comma":
                    self.next()
            self.expect("rbrack")
            return Literal(items, "list")
        if kind == "relop" and text == "<":
            # record literal <>, <foo: 1>, <_, /re/> — named or ordered
            # fields (parse_data.cpp:61-74; ordered fields get "" names)
            self.next()
            fields: list[tuple[str, Any]] = []
            while self.peek() and self.peek()[0] != "relop":
                k, t = self.peek()
                name = ""
                nxt = self.toks[self.i + 1] \
                    if self.i + 1 < len(self.toks) else None
                if k == "ident" and nxt and nxt[0] == "colon":
                    name = t
                    self.next()
                    self.next()
                elif k == "ident" and nxt and nxt[0] == "typex":
                    # `<foo:true>` lexes the value as a typex token
                    # (':true'); split it back into colon + value tokens
                    name = t
                    self.next()
                    self.toks[self.i:self.i + 1] = tokenize(nxt[1][1:])
                if self.peek() and self.peek()[0] == "ident" \
                        and self.peek()[1] == "_":
                    self.next()
                    val = None
                else:
                    item = self.operand()
                    if not isinstance(item, Literal):
                        raise ValueError(
                            "record literals may only contain literals")
                    val = item.value
                fields.append((name, val))
                if self.peek() and self.peek()[0] == "comma":
                    self.next()
            closing = self.peek()
            if not closing or closing[1] != ">":
                raise ValueError("expected '>' to close record literal")
            self.next()
            return Literal(fields, "record")
        if kind == "lbrace":
            # map literal {}, {+1->true, -2->false} (parse_data.cpp:55-60)
            self.next()
            entries: list[tuple[Any, Any]] = []
            while self.peek() and self.peek()[0] != "rbrace":
                key = self.operand()
                self.expect("arrow")
                val = self.operand()
                if not (isinstance(key, Literal) and isinstance(val, Literal)):
                    raise ValueError(
                        "map literals may only contain literals")
                entries.append((key.value, val.value))
                if self.peek() and self.peek()[0] == "comma":
                    self.next()
            self.expect("rbrace")
            return Literal(entries, "map")
        self.next()
        if kind == "string":
            return Literal(_unquote(text), "string")
        if kind == "number":
            if re.fullmatch(r"\d+", text):
                return Literal(int(text), "int64")
            return Literal(float(text), "double")
        if kind == "duration":
            # full reference grammar incl. compound components
            # (functions/timeparse.py, replaying time.cpp)
            return Literal(parse_duration_ns(text), "duration")
        if kind == "time":
            return Literal(text, "time")
        if kind == "subnet":
            return Literal(text, "subnet")
        if kind == "pattern":
            # /regex/ or /regex/i (reference pattern literal,
            # pattern.hpp:41 case_insensitive_flag)
            ci = text.endswith("i")
            body = text[1:-2] if ci else text[1:-1]
            return Literal((body, ci), "pattern")
        if kind == "ip":
            return Literal(text, "ip")
        if kind == "typex":
            return TypeExtractor(text[1:])
        if kind == "metax":
            return MetaExtractor(text[1:])
        if kind == "ident":
            low = text.lower()
            if low in _KEYWORDS:
                return Literal(_KEYWORDS[low], "bool")
            if low == "null" or low == "nil":
                return Literal(None, "null")
            if self.peek() and self.peek()[0] == "lparen":
                # scalar function call f(arg, ...)
                self.next()
                args = []
                while self.peek() and self.peek()[0] != "rparen":
                    args.append(self.operand())
                    if self.peek() and self.peek()[0] == "comma":
                        self.next()
                self.expect("rparen")
                return FuncCall(low, args)
            return FieldExtractor(text)
        raise ValueError(f"unexpected token {tok}")


def _unquote(s: str) -> str:
    body = s[1:-1]
    return re.sub(r"\\(.)", lambda m: {"n": "\n", "t": "\t", "r": "\r"}.get(m.group(1), m.group(1)), body)


def parse_expression(text: str):
    """Parse a TQL-flavored boolean expression into an AST."""
    return _Parser(tokenize(text)).parse()


# ---------------------------------------------------------------------------
# Binding: AST + DataFrame schema -> Column
# ---------------------------------------------------------------------------

# tenzir type name -> spark type predicate
_SPARK_TYPE_OF = {
    "bool": (T.BooleanType,),
    "int64": (T.LongType, T.IntegerType, T.ShortType, T.ByteType),
    "uint64": (T.LongType, T.IntegerType),
    "int": (T.LongType, T.IntegerType, T.ShortType, T.ByteType),
    "double": (T.DoubleType, T.FloatType),
    "string": (T.StringType,),
    "time": (T.TimestampType, T.TimestampNTZType, T.DateType),
    "timestamp": (T.TimestampType, T.TimestampNTZType, T.DateType),
    "duration": (T.DayTimeIntervalType,),
    "blob": (T.BinaryType,),
}

# literal tenzir type -> the type-extractor name used for bare-literal sugar
_LITERAL_TYPEX = {
    "int64": "int64",
    "double": "double",
    "string": "string",
    "bool": "bool",
    "time": "time",
    "duration": "duration",
    "ip": "ip",
    "subnet": "subnet",
}


def leaf_paths(schema: T.StructType, prefix: str = "") -> list[tuple[str, T.DataType]]:
    """All leaf column paths of a (possibly nested) schema, dotted."""
    out: list[tuple[str, T.DataType]] = []
    for field in schema.fields:
        path = f"{prefix}{field.name}"
        if isinstance(field.dataType, T.StructType):
            out.extend(leaf_paths(field.dataType, path + "."))
        else:
            out.append((path, field.dataType))
    return out


def _suffix_matches(path: str, suffix: str) -> bool:
    return path == suffix or path.endswith("." + suffix)


class Binder:
    """Resolves extractors against one concrete schema.

    ``type_hints`` maps dotted column paths to tenzir type names for types
    Spark cannot represent natively (ip, subnet, enumeration) — e.g.
    ``{"id.orig_h": "ip"}``. Columns listed there also stop matching their
    raw Spark type extractor (an ip column is :ip, not :string).
    """

    def __init__(self, schema: T.StructType, type_hints: dict[str, str] | None = None,
                 schema_name: str | None = None,
                 concepts: dict[str, list[str]] | None = None):
        self.schema = schema
        self.leaves = leaf_paths(schema)
        # flat top-level names that CONTAIN dots (zeek's `id.orig_h`)
        # must be backtick-resolved, not treated as nested paths
        self._dotted_flat = {n for n in schema.fieldNames() if "." in n}
        self.type_hints = type_hints or {}
        self.schema_name = schema_name
        # taxonomy concepts: one name -> many per-schema field extractors
        # (reference: catalog.cpp resolves expressions against taxonomies
        # before partition lookup; web/docs/data-model/taxonomies.md).
        # Config-file taxonomies (the reference loads schema/concepts/*
        # modules named by its tenzir.yaml) sit underneath explicit
        # per-call concepts; same-named concepts merge their field lists.
        merged: dict[str, list[str]] = {
            k: list(v) for k, v in _CONFIGURED_CONCEPTS.items()}
        for k, v in (concepts or {}).items():
            merged.setdefault(k, []).extend(
                f for f in v if f not in merged.get(k, ()))
        self.concepts = merged
        # resolved path -> schema-name prefix consumed during qualified
        # resolution; on heterogeneous frames (a _schema column) the
        # predicate gates on it so `zeek.conn.id.resp_h` misses dns rows
        self._schema_gates: dict[str, str] = {}

    def col(self, path: str) -> Column:
        """Column for a resolved leaf path; dotted FLAT names get
        backticks so Spark does not interpret them as struct access.
        Map-key access markers ('col\\x00key', from field_matches'
        map fallback) compile to getItem."""
        if "\x00" in path:
            mp, key = path.split("\x00", 1)
            base = F.col(f"`{mp}`") if mp in self._dotted_flat else F.col(mp)
            return base.getItem(key)
        if path in self._dotted_flat:
            return F.col(f"`{path}`")
        return F.col(path)

    def field_matches(self, suffix: str,
                      _seen: frozenset[str] = frozenset(),
                      roots: bool = False) -> list[str]:
        if suffix in self.concepts:
            if suffix in _seen:
                # concepts may reference each other cyclically; each
                # concept expands at most once (taxonomies.cpp:59-81
                # pins non-divergence and the flattened field order)
                return []
            _seen = _seen | {suffix}
            out: list[str] = []
            for ex in self.concepts[suffix]:
                hits = self.field_matches(ex, _seen, roots)
                # the reference's shipped concept fields are
                # SCHEMA-QUALIFIED ("suricata.flow.src_ip" = field
                # src_ip of schema suricata.flow); a frame's columns
                # carry no schema prefix, so strip leading components
                # until something resolves (schema-name gating happens
                # via which frame the query runs on)
                parts = ex.split(".")
                while not hits and len(parts) > 1:
                    parts = parts[1:]
                    hits = self.field_matches(".".join(parts), _seen, roots)
                for p in hits:
                    if p not in out:
                        out.append(p)
            for p in out:
                # concept resolution stays FRAME-level (the reference
                # resolves concepts before partition lookup; its concept
                # lists don't enumerate every inferred schema variant) —
                # drop any schema gate the qualified fallback recorded
                self._schema_gates.pop(p, None)
            return out
        hits = [p for p, _ in self.leaves if _suffix_matches(p, suffix)]
        if hits:
            return hits
        # struct roots: `x == <foo: 1>` compares a whole record column
        # (the reference's record values are first-class data); roots
        # are every strict prefix of a flattened leaf path. OPT-IN —
        # only predicate binding passes roots=True; sigma field maps
        # and summarize group keys keep leaf-only resolution (their
        # evaluators compare scalars, where a record operand evaluates
        # to no-match in the reference too).
        if roots:
            root_hits: list[str] = []
            for p, _ in self.leaves:
                parts = p.split(".")
                for i in range(1, len(parts)):
                    r = ".".join(parts[:i])
                    if r not in root_hits and _suffix_matches(r, suffix):
                        root_hits.append(r)
            if root_hits:
                return root_hits
        # map-key access: `extension.dvc` reaches key 'dvc' of a map
        # column matching 'extension' (the reference's cef extension bag
        # is a record, so `select extension.dvc` / `extend
        # foo=extension.dvc` are ordinary field paths there —
        # tests.yaml:873 'Slice Regression Test')
        parts = suffix.split(".")
        for i in range(len(parts) - 1, 0, -1):
            head, key = ".".join(parts[:i]), ".".join(parts[i:])
            for p, dt in self.leaves:
                if isinstance(dt, T.MapType) and _suffix_matches(p, head):
                    hits.append(f"{p}\x00{key}")
            if hits:
                return hits
        # single-part name against a map column: the reference's cef
        # extensions are first-class record fields (`where act == ...`,
        # tests.yaml CEF), ours live in the extension map — probe the
        # key (absent keys read null, the reference's absent-field
        # semantics)
        if "." not in suffix:
            for p, dt in self.leaves:
                if isinstance(dt, T.MapType):
                    hits.append(f"{p}\x00{suffix}")
            if hits:
                return hits
        # schema-qualified extractor: the reference resolves
        # `conn.duration` as field duration of schema zeek.conn
        # (tests.yaml Query Operators `where conn.duration <= 1.0s`).
        # Frames carry no schema prefix on their columns, so as a LAST
        # resort strip leading qualifier components until something
        # resolves — schema gating happens via which frame the query
        # runs on, same rule as concept resolution above.
        tail = parts
        while len(tail) > 1:
            tail = tail[1:]
            hits = [p for p, _ in self.leaves
                    if _suffix_matches(p, ".".join(tail))]
            if hits:
                prefix = ".".join(parts[:len(parts) - len(tail)])
                if any(p == "_schema" for p, _ in self.leaves):
                    for h in hits:
                        self._schema_gates[h] = prefix
                return hits
        return hits

    def type_matches(self, type_name: str) -> list[str]:
        hinted = [p for p, t in self.type_hints.items() if t == type_name]
        if type_name in ("ip", "subnet", "enumeration", "port"):
            return hinted
        spark_types = _SPARK_TYPE_OF.get(type_name, ())
        out = list(hinted)
        for p, dt in self.leaves:
            # a hint naming a DIFFERENT value domain excludes the
            # column from storage-type matching (a duration-hinted
            # double is not a :double); port stays numeric — the
            # reference declares `type port = uint64`, so `:uint64`
            # reaches ports (Node Zeek dns log golden)
            if self.type_hints.get(p) in ("ip", "subnet", "duration",
                                          "enumeration"):
                continue
            if isinstance(dt, spark_types) and p not in out:
                out.append(p)
        return out

    # -- compile ------------------------------------------------------------

    def compile(self, node) -> Column:
        if isinstance(node, Conjunction):
            col = self.compile(node.parts[0])
            for p in node.parts[1:]:
                col = col & self.compile(p)
            return col
        if isinstance(node, Disjunction):
            col = self.compile(node.parts[0])
            for p in node.parts[1:]:
                col = col | self.compile(p)
            return col
        if isinstance(node, Negation):
            # The reference NORMALIZES negations away before evaluation
            # (expression.cpp: De Morgan + operator negation), so a null
            # cell — which never matches ANY relational operator
            # (evaluate.cpp:229 `if (array.IsNull(row)) continue;`) —
            # stays unmatched under !(x == v) too. Rewrite the same way;
            # a residual non-predicate inner keeps the definite-bit
            # coalesce.
            inner = node.inner
            if isinstance(inner, Negation):
                return self.compile(inner.inner)
            if isinstance(inner, Conjunction):
                return self.compile(
                    Disjunction([Negation(p) for p in inner.parts]))
            if isinstance(inner, Disjunction):
                return self.compile(
                    Conjunction([Negation(p) for p in inner.parts]))
            if isinstance(inner, Predicate) and inner.op in _NEGATED_OP:
                return self.compile(Predicate(
                    inner.lhs, _NEGATED_OP[inner.op], inner.rhs))
            return ~F.coalesce(self.compile(inner), F.lit(False))
        if isinstance(node, Predicate):
            return self._predicate(node)
        raise TypeError(f"cannot compile {node!r}")

    def _predicate(self, pred: Predicate) -> Column:
        lhs, op, rhs = pred.lhs, pred.op, pred.rhs
        # normalize: extractor op literal (flip if needed)
        if isinstance(lhs, Literal) and not isinstance(rhs, Literal):
            flip = {"<": ">", ">": "<", "<=": ">=", ">=": "<=",
                    "in": "ni", "ni": "in", "!in": "!ni", "!ni": "!in"}
            lhs, rhs = rhs, lhs
            op = flip.get(op, op)
        if isinstance(lhs, (BinOp, FuncCall)) or isinstance(rhs, (BinOp, FuncCall)):
            # computed operands: compile each side to ONE Column (extractors
            # resolve to their first match) and compare directly
            lcol = self.value(lhs)
            rcol = self.value(rhs)
            if lcol is None or rcol is None:
                return F.lit(False)
            out = _apply_relop(lcol, op, rcol,
                               rhs if isinstance(rhs, Literal) else None)
            # a computed predicate cannot reach parquet PushedFilters; when
            # the lhs is LINEAR in one column with literal coefficients,
            # conjoin a redundant (strictly weaker) range on the bare
            # column — Catalyst pushes it into the scan for row-group
            # skipping while the original predicate keeps exact semantics
            bound = self._linear_bound(lhs, op, rhs)
            if bound is not None:
                out = out & bound
            return out
        # gates are scoped to THIS resolution: a prior comparison's
        # qualified extractor (`conn.duration`) must not leak its schema
        # gate onto a later bare `duration` over the same column
        self._schema_gates.clear()
        paths = self._resolve(lhs)
        if not paths and isinstance(lhs, TypeExtractor) \
                and lhs.type_name in ("ip", "subnet") \
                and isinstance(rhs, Literal) \
                and rhs.type_name in ("ip", "subnet"):
            # bare-literal / :ip search over schema-on-read data: the
            # reference's schemas TYPE address fields as ip, so
            # `where 1.2.3.4` matches them; inferred JSON leaves them
            # plain strings here. With no ip hints declared, fall back
            # to every string leaf — the ip/subnet comparators are
            # value-guarded, so non-address strings simply don't match.
            paths = [p for p, dt in self.leaves
                     if isinstance(dt, T.StringType)]
            # ...and string-valued MAP columns (the cef extension bag):
            # the reference types those extension fields individually,
            # so a bare-ip search reaches them too
            extra = []
            for p, dt in self.leaves:
                if isinstance(dt, T.MapType) \
                        and isinstance(dt.valueType, T.StringType):
                    mc = self.col(p)
                    if rhs.type_name == "subnet" and op in ("in", "=="):
                        extra.append(F.exists(
                            F.map_values(mc),
                            lambda v: ip_in_subnet(v, rhs.value)))
                    elif op == "==":
                        extra.append(F.array_contains(
                            F.map_values(mc), str(rhs.value)))
            if extra or paths:
                cols = [self._one(p, op, rhs) for p in paths] + extra
                out = cols[0]
                for c in cols[1:]:
                    out = out | c
                return out
        if not paths:
            return F.lit(False)
        cols = [self._schema_gated(p, self._one(p, op, rhs))
                for p in paths]
        out = cols[0]
        for c in cols[1:]:
            out = out | c
        return out

    def _schema_gated(self, path: str, pred: Column) -> Column:
        """AND a qualified extractor's schema-name constraint into its
        predicate (suffix semantics: `conn.duration` binds zeek.conn)."""
        gate = self._schema_gates.get(path)
        if gate is None:
            return pred
        sc = F.col("_schema")
        return pred & ((sc == gate) | sc.endswith("." + gate))

    def value(self, node) -> Column | None:
        """Compile an operand (literal / extractor / arithmetic / function
        call) to a single Column; None when an extractor has no match."""
        if isinstance(node, Literal):
            return _lit_col(node, "", self)
        if isinstance(node, (FieldExtractor, TypeExtractor, MetaExtractor)):
            paths = self._resolve(node)
            if not paths:
                return None
            if paths[0] == "__meta_schema__":
                return (F.lit(self.schema_name) if self.schema_name is not None
                        else (F.col("_schema")
                              if any(p == "_schema" for p, _ in self.leaves)
                              else F.lit(None).cast("string")))
            if paths[0] == "__meta_schema_id__":
                return self._schema_id_col()
            return self.col(paths[0])
        if isinstance(node, BinOp):
            lc, rc = self.value(node.lhs), self.value(node.rhs)
            if lc is None or rc is None:
                return None
            return {"+": lc + rc, "-": lc - rc, "*": lc * rc,
                    "/": lc / rc, "%": lc % rc}[node.op]
        if isinstance(node, FuncCall):
            return _apply_func(node, self)
        raise TypeError(f"cannot compile operand {node!r}")

    def _linear_bound(self, lhs, op: str, rhs) -> Column | None:
        """For ``a*x + b  relop  c`` (x one extractor, a/b/c numeric
        literals), derive a REDUNDANT range on x — weakened outward by a
        relative epsilon so it is a necessary condition even under
        floating-point evaluation differences. Pushdown-only: the exact
        original predicate is always conjoined by the caller."""
        from fractions import Fraction

        if op not in ("<", "<=", ">", ">=") or not isinstance(rhs, Literal):
            return None
        if not isinstance(rhs.value, (int, float)) or isinstance(rhs.value, bool):
            return None

        def walk(node):
            """-> (a, b, path|None) with node == a*x + b; constants have
            a == 0 and path None; raises on non-linear shapes."""
            if isinstance(node, Literal):
                if isinstance(node.value, bool) or not isinstance(node.value, (int, float)):
                    raise ValueError
                return Fraction(0), Fraction(node.value), None
            if isinstance(node, FieldExtractor):
                paths = self._resolve(node)
                if len(paths) != 1:
                    raise ValueError  # ambiguous extractor: no safe bound
                return Fraction(1), Fraction(0), paths[0]
            if isinstance(node, BinOp):
                la, lb, lp = walk(node.lhs)
                ra, rb, rp = walk(node.rhs)
                if lp and rp and lp != rp:
                    raise ValueError
                p = lp or rp
                if node.op == "+":
                    return la + ra, lb + rb, p
                if node.op == "-":
                    return la - ra, lb - rb, p
                if node.op == "*":
                    # linear only when one side is constant
                    if la != 0 and ra != 0:
                        raise ValueError
                    if ra == 0:
                        return la * rb, lb * rb, lp
                    return ra * lb, rb * lb, rp
                raise ValueError  # / and % are not handled
            raise ValueError

        try:
            a, b, path = walk(lhs)
        except (ValueError, ZeroDivisionError):
            return None
        if path is None or a == 0:
            return None
        q = (Fraction(rhs.value) - b) / a
        flipped = a < 0
        qf = float(q)
        # epsilon must cover the ROUNDING of the original fp evaluation,
        # whose error is relative to the INTERMEDIATE terms (b, c), not
        # to the solved bound q: under cancellation (v + 1e8 >= 1e8 ->
        # q = 0) a q-relative epsilon would exclude rows the exact
        # predicate accepts (round-2 advice #3) — scale by
        # max(|q|, |b/a|, |c/a|)
        scale = max(abs(qf), abs(float(b / a)),
                    abs(float(Fraction(rhs.value) / a)), 1.0)
        eps = scale * 1e-9
        col = self.col(path)
        lower = (op in (">", ">=")) != flipped  # x is bounded below
        return col >= F.lit(qf - eps) if lower else col <= F.lit(qf + eps)

    def _resolve(self, operand) -> list[str]:
        if isinstance(operand, FieldExtractor):
            return self.field_matches(operand.path, roots=True)
        if isinstance(operand, TypeExtractor):
            return self.type_matches(operand.type_name)
        if isinstance(operand, MetaExtractor):
            if operand.name == "schema":
                return ["__meta_schema__"]
            if operand.name == "schema_id":
                return ["__meta_schema_id__"]
            if operand.name == "import_time":
                return ["_import_time"] if any(p == "_import_time" for p, _ in self.leaves) else []
            return []
        raise TypeError(f"predicate lhs must be an extractor, got {operand!r}")

    def _schema_id_col(self) -> Column:
        """#schema_id: a stable 16-hex fingerprint of the frame's schema
        (reference: schema-id extractor, tests.yaml:732; the reference
        hashes its own type representation — type.cpp make_fingerprint —
        so VALUES diverge by construction across implementations, but
        the semantics hold: equal schemas hash equal, put/where work).
        Multi-schema frames fold the per-row _schema routing value in."""
        base = F.lit(self.schema.json())
        if any(p == "_schema" for p, _ in self.leaves):
            base = F.concat(base, F.coalesce(F.col("_schema"), F.lit("")))
        return F.substring(F.md5(base), 1, 16)

    def _one(self, path: str, op: str, rhs) -> Column:
        if path == "__meta_schema_id__":
            col = self._schema_id_col()
        elif path == "__meta_schema__":
            col = (F.lit(self.schema_name) if self.schema_name is not None
                   else (F.col("_schema") if any(p == "_schema" for p, _ in self.leaves)
                         else F.lit(None).cast("string")))
        else:
            col = self.col(path)
        if not isinstance(rhs, Literal):
            # extractor-vs-extractor comparison: resolve rhs to first match
            rpaths = self._resolve(rhs)
            if not rpaths:
                return F.lit(False)
            rcol = self.col(rpaths[0])
            return _apply_relop(col, op, rcol, None)
        guard = self._compare_complex(path, op, rhs, col)
        if guard is not None:
            return guard
        return _apply_relop(col, op, _lit_col(rhs, path, self), rhs)

    def _dtype_of(self, path: str) -> T.DataType | None:
        """Spark type of a resolved path — a flattened leaf, or a
        struct root reached by the roots=True resolution."""
        dt = dict(self.leaves).get(path)
        if dt is not None:
            return dt
        cur: T.DataType = self.schema
        for part in path.split("."):
            if not isinstance(cur, T.StructType):
                return None
            hit = next((f for f in cur.fields if f.name == part), None)
            if hit is None:
                return None
            cur = hit.dataType
        return cur

    def _compare_complex(self, path: str, op: str, rhs: Literal,
                         col: Column) -> Column | None:
        """Reference data-comparison semantics for complex operands.
        Record/map/list literals compare structurally against
        struct/map/array columns; ANY type incompatibility — different
        kind, field names, arity, or element type — makes the values
        simply UNEQUAL (`==`/ordered false, `!=` true for non-null
        cells; null cells never match any operator, evaluate.cpp:229).
        Spark would instead raise DATATYPE_MISMATCH at analysis.
        Returns None to fall through to the scalar path."""
        if op not in ("==", "!=", "<", "<=", ">", ">="):
            return None

        def mismatch() -> Column:
            return col.isNotNull() if op == "!=" else F.lit(False)

        dtype = self._dtype_of(path)
        if rhs.type_name == "record":
            if not isinstance(dtype, T.StructType):
                return mismatch()
            lit = _struct_literal(rhs.value, dtype)
            if lit is None:
                return mismatch()
            if op == "==":
                return col.eqNullSafe(lit)
            if op == "!=":
                return ~col.eqNullSafe(lit) & col.isNotNull()
            return F.lit(False)  # records are not ordered here
        if rhs.type_name == "map":
            if not isinstance(dtype, T.MapType):
                return mismatch()
            return _map_compare(col, dtype, op, rhs.value, mismatch)
        if rhs.type_name == "list":
            if not isinstance(dtype, T.ArrayType):
                return mismatch() if dtype is not None else None
            if any(_scalar_lit(v, dtype.elementType) is None
                   for v in rhs.value if v is not None):
                return mismatch()
            return None  # compatible: scalar path handles array equality
        if rhs.type_name != "null" and isinstance(
                dtype, (T.ArrayType, T.StructType, T.MapType)):
            return mismatch()
        return None


# scalar function library: name -> (min_args, max_args, builder over
# compiled arg Columns). The reference parses f(x) calls
# (tql/parser.cpp:422-439) but its v4.3 library is unwired — this set is
# the engine-defined Spark-native library; all JVM-side, codegen'd.
_FUNCS: dict[str, tuple[int, int, Any]] = {
    "round": (1, 2, None),  # special-cased: scale must be a literal int
    "floor": (1, 1, lambda a: F.floor(a[0])),
    "ceil": (1, 1, lambda a: F.ceil(a[0])),
    "abs": (1, 1, lambda a: F.abs(a[0])),
    "sqrt": (1, 1, lambda a: F.sqrt(a[0])),
    "exp": (1, 1, lambda a: F.exp(a[0])),
    "ln": (1, 1, lambda a: F.log(a[0])),
    "log10": (1, 1, lambda a: F.log10(a[0])),
    "length": (1, 1, lambda a: F.length(a[0])),
    "len": (1, 1, lambda a: F.length(a[0])),
    "lower": (1, 1, lambda a: F.lower(a[0])),
    "upper": (1, 1, lambda a: F.upper(a[0])),
    "trim": (1, 1, lambda a: F.trim(a[0])),
    "reverse": (1, 1, lambda a: F.reverse(a[0])),
    "concat": (1, 99, lambda a: F.concat(*a)),
    "coalesce": (1, 99, lambda a: F.coalesce(*a)),
    "substr": (2, 3, lambda a: F.substr(*a)),
    "starts_with": (2, 2, lambda a: a[0].startswith(a[1])),
    "ends_with": (2, 2, lambda a: a[0].endswith(a[1])),
    "contains": (2, 2, lambda a: a[0].contains(a[1])),
    "year": (1, 1, lambda a: F.year(a[0])),
    "month": (1, 1, lambda a: F.month(a[0])),
    "day": (1, 1, lambda a: F.dayofmonth(a[0])),
    "hour": (1, 1, lambda a: F.hour(a[0])),
    "minute": (1, 1, lambda a: F.minute(a[0])),
    "second": (1, 1, lambda a: F.second(a[0])),
    "to_string": (1, 1, lambda a: a[0].cast("string")),
    "to_int": (1, 1, lambda a: a[0].cast("long")),
    "to_double": (1, 1, lambda a: a[0].cast("double")),
    "to_time": (1, 1, lambda a: F.to_timestamp(a[0])),
    "sha256": (1, 1, lambda a: F.sha2(a[0].cast("string"), 256)),
    "md5": (1, 1, lambda a: F.md5(a[0].cast("string"))),
}


def _apply_func(call: FuncCall, binder: "Binder") -> Column | None:
    spec = _FUNCS.get(call.name)
    if spec is None:
        raise ValueError(f"unknown function {call.name!r} "
                         f"(available: {sorted(_FUNCS)})")
    lo, hi, build = spec
    if not (lo <= len(call.args) <= hi):
        raise ValueError(f"{call.name}() takes {lo}..{hi} args, got {len(call.args)}")
    if call.name == "round":
        col = binder.value(call.args[0])
        if col is None:
            return None
        if len(call.args) == 2:
            scale = call.args[1]
            if not (isinstance(scale, Literal) and isinstance(scale.value, int)):
                raise ValueError("round() scale must be an integer literal")
            return F.round(col, scale.value)
        return F.round(col)
    args = [binder.value(a) for a in call.args]
    if any(a is None for a in args):
        return None
    return build(args)


def _lit_col(lit: Literal, path: str, binder: Binder) -> Column:
    v, tn = lit.value, lit.type_name
    if tn == "time":
        # reference ymdhms semantics: '+'/'T'/' ' dividers, tz offsets,
        # partial dates down to YYYY-MM (timeparse.py replays time.cpp)
        try:
            import datetime as _dt

            ns = parse_time_ns(v)
            # integer µs arithmetic (Spark timestamps are µs; float
            # seconds would wobble at ns precision)
            ts = (_dt.datetime(1970, 1, 1)
                  + _dt.timedelta(microseconds=ns // 1000))
            return F.lit(ts).cast(T.TimestampType())
        except ValueError:
            return F.to_timestamp(F.lit(v.replace("T", " ").rstrip("Z")))
    if tn == "duration":
        # durations compare against long-nanosecond columns in our model;
        # a column HINTED as duration but stored as double is declared
        # seconds (zeek `interval`) — scale the literal to match
        if binder.type_hints.get(path) == "duration":
            dt = dict(binder.leaves).get(path)
            if isinstance(dt, T.DoubleType):
                return F.lit(v / 1e9)
        return F.lit(v)
    if tn == "record":
        # named record literals compare against struct columns
        # (parse_data.cpp:61-66); ordered/unnamed fields have no Spark
        # struct equivalent -> null literal (predicate stays null-safe)
        if v and all(name for name, _ in v):
            return F.struct(*[F.lit(val).alias(name) for name, val in v])
        return F.lit(None)
    if tn == "map":
        if v:
            return F.create_map(
                *[F.lit(x) for kv in v for x in kv])
        return F.lit(None)
    return F.lit(v)


def _scalar_kind(dt: T.DataType) -> str:
    if isinstance(dt, (T.ByteType, T.ShortType, T.IntegerType, T.LongType,
                       T.FloatType, T.DoubleType, T.DecimalType)):
        return "num"
    if isinstance(dt, T.BooleanType):
        return "bool"
    if isinstance(dt, T.StringType):
        return "str"
    return "other"


def _scalar_lit(val, dt: T.DataType) -> Column | None:
    """A scalar literal column for `val` if its kind is compatible with
    the Spark type `dt`, else None (type mismatch)."""
    if val is None:
        return F.lit(None).cast(dt)
    if isinstance(val, bool):
        return F.lit(val) if _scalar_kind(dt) == "bool" else None
    if isinstance(val, (int, float)):
        return F.lit(val) if _scalar_kind(dt) == "num" else None
    if isinstance(val, str):
        return F.lit(val) if _scalar_kind(dt) == "str" else None
    return None


def _is_record_value(val) -> bool:
    return isinstance(val, list) and all(
        isinstance(e, tuple) and len(e) == 2 and isinstance(e[0], str)
        for e in val)


def _struct_literal(fields: list, dtype: T.StructType) -> Column | None:
    """Build a struct literal matching `dtype` from record-literal
    fields [(name, value), ...]; ordered fields ("" names) take the
    column's field names positionally. None on any arity, name, or
    type incompatibility."""
    if len(fields) != len(dtype.fields):
        return None
    cols = []
    for (name, val), f in zip(fields, dtype.fields):
        if name and name != f.name:
            return None
        if isinstance(f.dataType, T.StructType):
            if val is None:
                c = F.lit(None).cast(f.dataType)
            elif _is_record_value(val):
                c = _struct_literal(val, f.dataType)
            else:
                return None
        elif isinstance(f.dataType, T.ArrayType):
            if val is None:
                c = F.lit(None).cast(f.dataType)
            elif isinstance(val, list) and not _is_record_value(val):
                elems = [_scalar_lit(v, f.dataType.elementType)
                         for v in val]
                if any(e is None for e in elems):
                    return None
                c = F.array(*elems) if elems else \
                    F.lit([]).cast(f.dataType)
            else:
                return None
        else:
            c = _scalar_lit(val, f.dataType)
        if c is None:
            return None
        cols.append(c.alias(f.name))
    return F.struct(*cols)


def _map_compare(col: Column, dtype: T.MapType, op: str,
                 entries: list, mismatch) -> Column:
    """Map equality against a {k->v} literal. Spark cannot order or
    <=> MapType, so compare sorted entry arrays instead."""
    if op not in ("==", "!="):
        return F.lit(False)  # maps are not ordered
    if not entries:
        eq = F.size(col) == 0
    else:
        lits = []
        for k, v in entries:
            kc = _scalar_lit(k, dtype.keyType)
            vc = _scalar_lit(v, dtype.valueType)
            if kc is None or vc is None:
                return mismatch()
            lits.append(F.struct(kc.alias("key"), vc.alias("value")))
        eq = (F.array_sort(F.map_entries(col))
              == F.array_sort(F.array(*lits)))
    if op == "==":
        return eq & col.isNotNull()
    return ~eq & col.isNotNull()


def _apply_relop(col: Column, op: str, rcol: Column, rlit: Literal | None) -> Column:
    if rlit is not None and rlit.type_name == "null":
        if op == "==":
            return col.isNull()
        if op == "!=":
            return col.isNotNull()
    if rlit is not None and rlit.type_name == "subnet" and op in ("in", "==", "!in", "!="):
        inside = ip_in_subnet(col, rlit.value)
        return (~inside & col.isNotNull()) if op in ("!in", "!=") else inside
    if rlit is not None and rlit.type_name == "pattern":
        # reference pattern semantics (pattern.cpp:41-51): `==` is a
        # FULL match, `in` is a partial search; /…/i flips RE2's
        # case-insensitive option -> Java regex (?i) flag. JVM-side
        # rlike keeps the predicate codegen'd.
        body, ci = rlit.value
        flags = "(?i)" if ci else ""
        full = col.rlike(f"{flags}^(?:{body})$")
        if op == "==":
            return full
        if op == "!=":
            # null cells never match, even negated (evaluate.cpp:229)
            return ~full & col.isNotNull()
        part = col.rlike(f"{flags}{body}")
        if op == "in":
            return part
        if op == "!in":
            return ~part & col.isNotNull()
        raise ValueError(f"operator {op!r} unsupported for pattern literals")
    # Reference null semantics, not SQL 3VL: a NULL CELL NEVER MATCHES
    # any relational operator — negated ones included — because the
    # column evaluator skips null rows before the cell evaluator runs
    # (evaluate.cpp:229 `if (array.IsNull(row)) continue;`; the
    # example-config-file golden pins it for `!in`). Positive ordered
    # comparisons stay PLAIN SQL so they push down to the parquet scan
    # (a coalesce() wrapper defeats PushedFilters; null drops the row
    # either way). Negated forms conjoin isNotNull() — itself a pushable
    # filter — so they yield a definite false on null, matching the
    # bitmap, while Not(EqualTo)/Not(In) still reach the scan.
    if op == "==":
        return col.eqNullSafe(rcol)
    if op == "!=":
        return (col != rcol) & col.isNotNull()
    if op == "<":
        return col < rcol
    if op == "<=":
        return col <= rcol
    if op == ">":
        return col > rcol
    if op == ">=":
        return col >= rcol
    if op in ("in", "!in"):
        if rlit is not None and rlit.type_name == "list":
            out = col.isin(rlit.value)
        else:
            # "x in y": x substring-of / element-of y
            out = rcol.contains(col)
        return (~out & col.isNotNull()) if op == "!in" else out
    if op in ("ni", "!ni"):
        # "x ni y": x contains y
        out = col.contains(rcol)
        return (~out & col.isNotNull()) if op == "!ni" else out
    raise ValueError(f"unknown relational operator {op}")


def ip_in_subnet(col: Column, cidr: str) -> Column:
    """IPv4 CIDR containment on canonical-string ip columns, JVM-side.

    Converts dotted-quad -> uint32 with split/cast arithmetic and compares
    the masked prefix. (Reference: subnet containment in
    libtenzir/include/tenzir/type.hpp:742+ / evaluate.cpp; IPv6 columns
    fall through to false here — handled by functions.ip.pandas helpers.)
    """
    net = ipaddress.ip_network(cidr, strict=False)
    if net.version == 6:
        # IPv6 has no 32-bit JVM arithmetic form; containment runs in
        # the Arrow-batched stdlib UDF (the reference's evaluate.cpp
        # handles both families natively — Query Operators test:
        # `id.orig_h in fe80:5074:1b53:7e7::/64`). The predicate loses
        # parquet pushdown for this one clause; correctness first.
        from tenzir_spark.functions.ip import make_in_subnet_udf
        return F.coalesce(make_in_subnet_udf(cidr)(col), F.lit(False))
    parts = F.split(col, r"\.")
    as_int = (
        parts.getItem(0).cast("long") * 16777216
        + parts.getItem(1).cast("long") * 65536
        + parts.getItem(2).cast("long") * 256
        + parts.getItem(3).cast("long")
    )
    mask = int(net.netmask)
    return col.rlike(r"^\d+\.\d+\.\d+\.\d+$") & (
        as_int.bitwiseAND(F.lit(mask)) == F.lit(int(net.network_address))
    )


# Process-level taxonomy registry — the analog of the reference's
# config-file model (tenzir.yaml `tenzir.schema-dirs` + shipped
# schema/concepts/*.yaml modules; the example-config-file suite queries
# `net.app` with no per-query concept argument). Every Binder folds
# these in, so `where net.app !in [...]` works in plain TQL pipelines.
_CONFIGURED_CONCEPTS: dict[str, list[str]] = {}


def set_configured_concepts(concepts: dict[str, list[str]] | None) -> None:
    """Replace the process-level taxonomy (None/{} clears it)."""
    _CONFIGURED_CONCEPTS.clear()
    for k, v in (concepts or {}).items():
        _CONFIGURED_CONCEPTS[k] = list(v)


def configured_concepts() -> dict[str, list[str]]:
    return {k: list(v) for k, v in _CONFIGURED_CONCEPTS.items()}


def load_taxonomy_dir(path: str) -> dict[str, list[str]]:
    """Load and MERGE every ``*.yaml`` concept module under ``path``
    into the process-level taxonomy (reference: module directories in
    tenzir.yaml.example `schema-dirs`). Returns the merged mapping."""
    import glob as _glob
    import os as _os

    for f in sorted(_glob.glob(_os.path.join(path, "*.yaml"))):
        for name, fields in load_concepts(f).items():
            cur = _CONFIGURED_CONCEPTS.setdefault(name, [])
            cur.extend(x for x in fields if x not in cur)
    return configured_concepts()


def load_concepts(path: str) -> dict[str, list[str]]:
    """Load taxonomy concepts from a YAML file shaped like the
    reference's taxonomy modules (web/docs/data-model/taxonomies.md):

        concepts:
          - concept:
              name: source_ip
              fields: [zeek.conn.id.orig_h, suricata.flow.src_ip]

    Also accepts the plain mapping form {name: [field, ...]}. The result
    feeds compile_expression(concepts=...) / Binder(concepts=...)."""
    try:
        import yaml
    except ImportError as exc:  # pragma: no cover
        raise NotImplementedError("concepts need PyYAML") from exc
    with open(path) as fh:
        doc = yaml.safe_load(fh) or {}
    out: dict[str, list[str]] = {}
    if isinstance(doc, dict) and "concepts" in doc:
        entries = doc["concepts"] or []
    elif isinstance(doc, list):
        # the reference's shipped concept files are a bare top-level
        # list of `- concept: {...}` entries (/schema/concepts/*.yaml)
        entries = doc
    else:
        for name, fields in (doc or {}).items():
            out[name] = list(fields)
        return out
    for entry in entries:
        c = entry.get("concept", entry) if isinstance(entry, dict) else {}
        name = c.get("name")
        if name:
            out.setdefault(name, []).extend(c.get("fields") or [])
    return out


def parse_operand(text: str):
    """Parse a single operand (literal / extractor / arithmetic /
    function call) — the RHS grammar of ``put x=<operand>``."""
    p = _Parser(tokenize(text))
    node = p.operand()
    if p.peek() is not None:
        raise ValueError(f"trailing tokens in operand: {p.toks[p.i:]}")
    return node


def compile_operand(
    text: str,
    df_or_schema: DataFrame | T.StructType,
    type_hints: dict[str, str] | None = None,
    schema_name: str | None = None,
) -> Column:
    """Compile an operand string to a Column bound against a schema
    (missing extractors become typed nulls, matching the reference's
    ``put`` semantics: put_extend_replace.cpp:142-157). ``schema_name``
    lets ``#schema`` resolve on single-schema frames that carry their
    name only as slice metadata (`put schema=#schema`)."""
    schema = df_or_schema.schema if isinstance(df_or_schema, DataFrame) else df_or_schema
    node = parse_operand(text)
    col = Binder(schema, type_hints=type_hints,
                 schema_name=schema_name).value(node)
    return col if col is not None else F.lit(None)


def compile_expression(
    expr: str | Column,
    df_or_schema: DataFrame | T.StructType,
    type_hints: dict[str, str] | None = None,
    schema_name: str | None = None,
    concepts: dict[str, list[str]] | None = None,
) -> Column:
    """Compile a TQL-ish expression string against a DataFrame's schema.

    Accepts a ready-made Column unchanged, so operators can take either.
    ``concepts`` maps taxonomy names to field extractors (e.g.
    {"source_ip": ["src_ip", "orig_h"]}).
    """
    if isinstance(expr, Column):
        return expr
    schema = df_or_schema.schema if isinstance(df_or_schema, DataFrame) else df_or_schema
    ast = parse_expression(expr)
    return Binder(schema, type_hints=type_hints, schema_name=schema_name,
                  concepts=concepts).compile(ast)
