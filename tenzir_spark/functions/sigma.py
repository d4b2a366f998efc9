"""Sigma detection rules -> Spark Column predicates.

Reference: the sigma plugin transpiles Sigma YAML to Tenzir expressions
and emits matching events wrapped with rule metadata
(plugins/sigma/src/parse.cpp:38-59, plugins/sigma/src/plugin.cpp).

Supported subset (the common core of public Sigma rules):
- detection: named selections as field->value maps (AND within a map,
  any-of for value lists) and lists-of-maps (OR of maps);
- field modifiers: contains, startswith, endswith, re, cased (default
  matching is case-insensitive per the Sigma spec);
- condition: boolean expression over selection names with and/or/not,
  parentheses, and `1 of X*` / `all of X*` / `... of them` quantifiers;
- field names resolve with the engine's suffix semantics (expr.Binder),
  so `Image` matches `process.Image` — same unification the reference
  applies via its field mappings.
"""

from __future__ import annotations

import re
from typing import Any

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from tenzir_spark.expr import Binder

try:
    import yaml
except ImportError:  # pragma: no cover
    yaml = None


_SUPPORTED_MODIFIERS = {"contains", "startswith", "endswith", "re", "cased", "all"}


def _value_pred(col: Column, value: Any, modifiers: list[str]) -> Column:
    cased = "cased" in modifiers
    raw = col.cast("string")
    s = raw if cased else F.lower(raw)

    def lit(v):
        v = str(v)
        return F.lit(v if cased else v.lower())

    if "re" in modifiers:
        # regexes are case-sensitive by default in Sigma (the reference
        # keeps them raw: plugins/sigma/src/parse.cpp:197) — match against
        # the un-lowered column so uppercase literals can hit
        return raw.rlike(str(value))
    if value is None:
        return col.isNull()
    if "contains" in modifiers:
        return s.contains(lit(value))
    if "startswith" in modifiers:
        return s.startswith(lit(value))
    if "endswith" in modifiers:
        return s.endswith(lit(value))
    sv = str(value)
    if "*" in sv or "?" in sv:  # sigma wildcards
        pat = re.escape(sv if cased else sv.lower()).replace(r"\*", ".*").replace(r"\?", ".")
        return s.rlike(f"^{pat}$")
    if isinstance(value, bool):
        return col.cast("boolean").eqNullSafe(F.lit(value))
    if isinstance(value, (int, float)):
        return col.eqNullSafe(F.lit(value))
    return s.eqNullSafe(lit(value))


def _field_pred(binder: Binder, field: str, value: Any) -> Column:
    parts = field.split("|")
    name, modifiers = parts[0], [m.lower() for m in parts[1:]]
    unsupported = [m for m in modifiers if m not in _SUPPORTED_MODIFIERS]
    if unsupported:
        # degrading e.g. |cidr or |base64 to string equality would produce
        # silently-wrong detections — fail loudly instead
        raise ValueError(f"unsupported sigma modifiers {unsupported} on field {name!r}")
    paths = binder.field_matches(name)
    if not paths:
        return F.lit(False)
    values = value if isinstance(value, list) else [value]
    out = None
    for p in paths:
        col = binder.col(p)
        vp = None
        for v in values:  # any-of across listed values
            one = _value_pred(col, v, modifiers)
            vp = one if vp is None else (vp | one)
        if "all" in modifiers and len(values) > 1:
            vp = None
            for v in values:
                one = _value_pred(col, v, modifiers)
                vp = one if vp is None else (vp & one)
        out = vp if out is None else (out | vp)
    return F.coalesce(out, F.lit(False))


def _selection_pred(binder: Binder, sel: Any) -> Column:
    if isinstance(sel, list):
        if all(isinstance(x, dict) for x in sel):
            out = None
            for m in sel:  # OR of maps
                p = _selection_pred(binder, m)
                out = p if out is None else (out | p)
            return out
        # list of keywords: any keyword substring in any string column
        out = None
        for kw in sel:
            kwp = None
            for path in binder.type_matches("string"):
                one = F.lower(binder.col(path).cast("string")).contains(str(kw).lower())
                kwp = one if kwp is None else (kwp | one)
            kwp = kwp if kwp is not None else F.lit(False)
            out = kwp if out is None else (out | kwp)
        return F.coalesce(out, F.lit(False))
    out = None
    for field, value in sel.items():  # AND within a map
        p = _field_pred(binder, field, value)
        out = p if out is None else (out & p)
    return out if out is not None else F.lit(False)


_COND_TOKEN = re.compile(r"\(|\)|\band\b|\bor\b|\bnot\b|\b1 of\b|\ball of\b|[A-Za-z_][\w*]*|\|.*$")


def _compile_condition(cond: str, sels: dict[str, Column]) -> Column:
    tokens = [t for t in _COND_TOKEN.findall(cond) if not t.startswith("|")]

    def of_group(quant: str, pattern: str) -> Column:
        names = list(sels) if pattern in ("them", "them)") else [
            n for n in sels if re.fullmatch(pattern.replace("*", ".*"), n)]
        cols = [sels[n] for n in names] or [F.lit(False)]
        out = cols[0]
        for c in cols[1:]:
            out = (out | c) if quant == "1 of" else (out & c)
        return out

    pos = 0

    def parse_or():
        nonlocal pos
        left = parse_and()
        while pos < len(tokens) and tokens[pos] == "or":
            pos += 1
            left = left | parse_and()
        return left

    def parse_and():
        nonlocal pos
        left = parse_not()
        while pos < len(tokens) and tokens[pos] == "and":
            pos += 1
            left = left & parse_not()
        return left

    def parse_not():
        nonlocal pos
        if pos < len(tokens) and tokens[pos] == "not":
            pos += 1
            return ~F.coalesce(parse_not(), F.lit(False))
        return parse_atom()

    def parse_atom():
        nonlocal pos
        tok = tokens[pos]
        if tok == "(":
            pos += 1
            inner = parse_or()
            assert tokens[pos] == ")", "unbalanced parens in sigma condition"
            pos += 1
            return inner
        if tok in ("1 of", "all of"):
            pos += 1
            pattern = tokens[pos]
            pos += 1
            return of_group(tok, pattern)
        pos += 1
        if tok not in sels:
            raise ValueError(f"sigma condition references unknown selection {tok!r}")
        return sels[tok]

    out = parse_or()
    if pos != len(tokens):
        raise ValueError(f"trailing tokens in sigma condition: {tokens[pos:]}")
    return out


def compile_rule(rule_yaml: str | dict, df_or_schema) -> tuple[Column, dict]:
    """Compile one Sigma rule against a DataFrame's schema.

    Returns (predicate Column, rule metadata dict)."""
    if yaml is None:  # pragma: no cover
        raise NotImplementedError("sigma needs PyYAML")
    rule = yaml.safe_load(rule_yaml) if isinstance(rule_yaml, str) else rule_yaml
    schema = df_or_schema.schema if isinstance(df_or_schema, DataFrame) else df_or_schema
    binder = Binder(schema)
    detection = rule.get("detection", {})
    cond = detection.get("condition", " or ".join(
        k for k in detection if k != "condition"))
    sels = {
        name: F.coalesce(_selection_pred(binder, sel), F.lit(False))
        for name, sel in detection.items() if name != "condition"
    }
    meta = {k: rule.get(k) for k in ("title", "id", "level", "description") if k in rule}
    return _compile_condition(cond, sels), meta


def load_rules(path: str) -> list[dict]:
    """Load Sigma rules from a YAML file or a DIRECTORY of *.yml/*.yaml
    files (the reference's ``sigma <rule|dir>``; its --refresh-interval
    hot reload maps to re-invoking this per micro-batch in streaming)."""
    import os

    if yaml is None:  # pragma: no cover
        raise NotImplementedError("sigma needs PyYAML")
    if os.path.isdir(path):
        rules: list[dict] = []
        for name in sorted(os.listdir(path)):
            if name.endswith((".yml", ".yaml")):
                with open(os.path.join(path, name)) as fh:
                    rules.extend(d for d in yaml.safe_load_all(fh) if d)
        if not rules:
            raise ValueError(f"no sigma rules (*.yml) under {path!r}")
        return rules
    with open(path) as fh:
        return [d for d in yaml.safe_load_all(fh) if d]


def sigma(df: DataFrame, rules: list[str | dict] | str | dict) -> DataFrame:
    """The sigma operator: emit matching events wrapped with rule
    metadata — output schema {rule: struct<title,id,level>, event:
    struct<...>} like the reference's wrapping."""
    if not isinstance(rules, list):
        rules = [rules]
    event = F.struct(*[F.col(c) for c in df.columns]).alias("event")
    outs = []
    for r in rules:
        pred, meta = compile_rule(r, df)
        rule_col = F.struct(
            F.lit(meta.get("title")).alias("title"),
            F.lit(str(meta.get("id"))).alias("id"),
            F.lit(meta.get("level")).alias("level"),
        ).alias("rule")
        outs.append(df.filter(pred).select(rule_col, event))
    out = outs[0]
    for o in outs[1:]:
        out = out.unionByName(o)
    return out
