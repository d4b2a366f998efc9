"""Schema library: parse the reference's type-definition DSL into Spark
schemas + extractor type hints.

Reference: the module library under ``/schema/types/*.schema``
(suricata/zeek/argus/sysmon definitions) and its type DSL
(``type NAME = record { field: type #attr, ... }``, record
concatenation with ``+``, aliases, ``enum { ... }``, ``list<T>``),
documented in ``web/docs/data-model/modules.md``. Named schemas are what
``read json --schema suricata.alert`` resolves against.

Spark mapping: bool→boolean, int64/uint64/port→long, double→double,
string/enum→string, time/timestamp→timestamp, duration→double
(seconds, matching the zeek-tsv reader), ip/subnet→string PLUS a type
HINT so the ``:ip``/``:subnet`` extractors and subnet containment know
which string columns carry addresses — the reference's typed-ip
behavior re-expressed over Spark's type system.

The engine bundles a condensed library (``schemas/bundled.schema``,
written against the cited reference definitions — suricata.alert/dns/
flow, zeek.conn); ``load_schema_file``/``load_schema_dir`` ingest any
full ``*.schema`` tree.
"""

from __future__ import annotations

import os
import re

from pyspark.sql import types as T

_PRIMITIVES = {
    "bool": (T.BooleanType(), None),
    "uint64": (T.LongType(), None),
    "int64": (T.LongType(), None),
    "uint16": (T.LongType(), None),
    "double": (T.DoubleType(), None),
    "string": (T.StringType(), None),
    "time": (T.TimestampType(), None),
    "timestamp": (T.TimestampType(), None),
    # stored double-seconds; the hint lets duration LITERALS scale to
    # match (expr._lit_col) and `:duration` queries resolve the column
    "duration": (T.DoubleType(), "duration"),
    "ip": (T.StringType(), "ip"),
    "subnet": (T.StringType(), "subnet"),
    # hint lets `:port` type queries resolve and the zeek-tsv printer
    # emit the `port` type name for declared port columns
    "port": (T.LongType(), "port"),
}


class _Parser:
    """Recursive-descent parser for one .schema source text."""

    def __init__(self, text: str, types: dict):
        # strip // comments (string literals in the DSL only appear in
        # #attr="..." values, which we discard anyway)
        self.text = re.sub(r"//[^\n]*", "", text)
        self.pos = 0
        self.types = types  # name -> ("record", fields) | ("prim", key)

    # -- lexing helpers --------------------------------------------------

    def _ws(self):
        while self.pos < len(self.text) and self.text[self.pos].isspace():
            self.pos += 1

    def _peek(self, tok: str) -> bool:
        self._ws()
        return self.text.startswith(tok, self.pos)

    def _peek_kw(self, kw: str) -> bool:
        """Keyword match with a word boundary: `record`/`enum`/`list`
        must not prefix-match a user type named `listing` or
        `enumeration_x`."""
        if not self._peek(kw):
            return False
        end = self.pos + len(kw)
        return end >= len(self.text) \
            or not re.match(r"[\w.\-]", self.text[end])

    def _eat_kw(self, kw: str) -> bool:
        if self._peek_kw(kw):
            self.pos += len(kw)
            return True
        return False

    def _eat(self, tok: str) -> bool:
        if self._peek(tok):
            self.pos += len(tok)
            return True
        return False

    def _expect(self, tok: str):
        if not self._eat(tok):
            ctx = self.text[self.pos:self.pos + 40]
            raise ValueError(f"schema parse error: expected {tok!r} at "
                             f"{ctx!r}")

    def _ident(self) -> str:
        self._ws()
        m = re.match(r"[A-Za-z_][\w.\-]*", self.text[self.pos:])
        if not m:
            ctx = self.text[self.pos:self.pos + 40]
            raise ValueError(f"schema parse error: expected name at {ctx!r}")
        self.pos += m.end()
        return m.group(0)

    def _skip_attrs(self) -> dict:
        attrs: dict = {}
        while self._peek("#"):
            self._eat("#")
            name = self._ident()
            val = True
            if self._eat("="):
                self._ws()
                if self._eat('"'):
                    end = self.text.index('"', self.pos)
                    val = self.text[self.pos:end]
                    self.pos = end + 1
                else:
                    m = re.match(r"[^\s,}#]+", self.text[self.pos:])
                    val = m.group() if m else True
                    self.pos += m.end() if m else 0
            attrs[name] = val
        return attrs

    # -- grammar ---------------------------------------------------------

    def parse(self):
        while True:
            self._ws()
            if self.pos >= len(self.text):
                return
            if not self._eat_kw("type"):
                ctx = self.text[self.pos:self.pos + 40]
                raise ValueError(
                    f"schema parse error: expected 'type' at {ctx!r}")
            name = self._ident()
            self._expect("=")
            self.types[name] = self._type_expr()
            # type-level attributes (`type all_types = all_types_i
            # #some=attr`, misc/schema/all-types.schema) attach to the
            # definition, not a field — consumed, nothing to record yet
            self._skip_attrs()

    def _type_expr(self):
        node = self._type_atom()
        while self._eat("+"):
            # record concatenation: A + record { ... }
            rhs = self._type_atom()
            lf = self._fields_of(node)
            rf = self._fields_of(rhs)
            node = ("record", lf + [f for f in rf
                                    if f[0] not in {f2[0] for f2 in lf}])
        return node

    def _type_atom(self):
        if self._peek_kw("record"):
            self._eat_kw("record")
            self._expect("{")
            fields = []
            while not self._eat("}"):
                fname = self._ident()
                self._expect(":")
                ftype = self._type_expr()
                attrs = self._skip_attrs()
                fields.append((fname, ftype, attrs))
                self._eat(",")
            return ("record", fields)
        if self._peek_kw("enum"):
            self._eat_kw("enum")
            self._expect("{")
            while not self._eat("}"):
                self._ident()
                self._skip_attrs()
                self._eat(",")
            return ("prim", "string")
        if self._peek_kw("list"):
            self._eat_kw("list")
            self._expect("<")
            inner = self._type_expr()
            self._expect(">")
            return ("list", inner)
        name = self._ident()
        if name in _PRIMITIVES:
            return ("prim", name)
        if name in self.types:
            return self.types[name]
        raise ValueError(f"schema parse error: unknown type {name!r}")

    def _fields_of(self, node):
        if node[0] != "record":
            raise ValueError("'+' concatenation needs record operands")
        return node[1]


def _to_spark(node, prefix: str, hints: dict) -> T.DataType:
    kind = node[0]
    if kind == "prim":
        key = node[1]
        if key in _PRIMITIVES:
            spark_type, hint = _PRIMITIVES[key]
        else:  # produced by enum (already a type name alias)
            spark_type, hint = T.StringType(), None
        if hint:
            hints[prefix.rstrip(".")] = hint
        return spark_type
    if kind == "list":
        return T.ArrayType(_to_spark(node[1], prefix, hints))
    if kind == "record":
        out_fields = []
        for n, t, *rest in node[1]:
            path = f"{prefix}{n}"
            out_fields.append(T.StructField(
                n, _to_spark(t, path + ".", hints), True))
            attrs = rest[0] if rest else {}
            unit = attrs.get("unit")
            if unit and hints.get(path) == "duration":
                # `duration #unit=ms` (argus.schema:91): bare numbers in
                # this field are in that unit; recorded as a parallel
                # hint key the readers consult for scaling
                hints[path + "#unit"] = unit
        return T.StructType(out_fields)
    raise TypeError(node)


def parse_schemas(text: str, into: dict | None = None) -> dict:
    """Parse .schema DSL text → {name: (StructType, hints)} for every
    record type defined (aliases and scalars register as components but
    only records become named schemas)."""
    types: dict = {}
    _Parser(text, types).parse()
    out = dict(into) if into else {}
    for name, node in types.items():
        if node[0] == "record":
            hints: dict = {}
            st = _to_spark(node, "", hints)
            out[name] = (st, hints)
    return out


_REGISTRY: dict | None = None


def _bundled() -> dict:
    global _REGISTRY
    if _REGISTRY is None:
        path = os.path.join(os.path.dirname(__file__), "schemas",
                            "bundled.schema")
        with open(path) as fh:
            _REGISTRY = parse_schemas(fh.read())
    return _REGISTRY


def get_schema(name: str) -> tuple[T.StructType, dict] | None:
    """Look up a named schema → (StructType, extractor type hints)."""
    return _bundled().get(name)


def schema_names() -> list[str]:
    return sorted(_bundled())


def register_schemas(text: str) -> None:
    """Add definitions (DSL text) to the process-wide registry. A text
    must be self-contained (cross-file references: concatenate the
    sources, as load_schema_dir does)."""
    _bundled()
    _REGISTRY.update(parse_schemas(text))


def load_schema_file(path: str) -> None:
    with open(path) as fh:
        register_schemas(fh.read())


def demux_typed(df, selector: str = "event_type",
                prefix: str = "suricata") -> dict:
    """Split a selector-tagged frame into per-schema frames TYPED by the
    library — the reference's suricata/zeek-json readers emit exactly
    this: one slice stream per event type, each typed by its module
    schema (json.cpp selector routing + the /schema/types library).

    Frames whose name has a library entry are cast through the lattice
    (operators.cast.cast_to: missing fields → typed nulls, strings →
    timestamps, extras dropped); unknown names pass through inferred.
    The distinct-selector collect is O(number of schemas), not data."""
    from pyspark.sql import functions as F

    from tenzir_spark.operators.cast import cast_to

    values = [r[0] for r in df.select(selector).distinct().collect()
              if r[0] is not None]
    out = {}
    for v in sorted(values):
        name = f"{prefix}.{v}" if prefix else str(v)
        sub = df.filter(F.col(selector) == v)
        entry = get_schema(name)
        if entry is not None:
            sub = cast_to(sub, entry[0])
            sub.__dict__["_tenzir_type_hints"] = entry[1]
        out[name] = sub
    return out


def load_schema_dir(path: str) -> None:
    """Ingest a directory tree of ``*.schema`` files (e.g. the
    reference's /schema/types). Files parse in name order; cross-file
    references must respect that order (base definitions first, as the
    reference's own library is laid out)."""
    import glob

    merged = []
    for p in sorted(glob.glob(os.path.join(path, "**", "*.schema"),
                              recursive=True)):
        with open(p) as fh:
            merged.append(fh.read())
    register_schemas("\n".join(merged))
