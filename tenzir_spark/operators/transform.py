"""Row-shaping operators: where / select / drop / put / extend / replace /
rename / flatten / unflatten / enumerate / hash.

All are thin, declarative DataFrame transforms — Catalyst handles pushdown
and column pruning, so e.g. ``select`` here directly shrinks the parquet
``ReadSchema`` at scan time.
"""

from __future__ import annotations

from typing import Iterable

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from tenzir_spark.expr import compile_expression, leaf_paths, _suffix_matches


def where(df: DataFrame, expr: str | Column, type_hints: dict[str, str] | None = None,
          schema_name: str | None = None) -> DataFrame:
    """Filter rows by a TQL-ish expression or a Column.

    Reference: libtenzir/builtins/operators/where.cpp:53 (expression is
    tailored per schema, then rows filtered); pushdown (where.cpp:109-117)
    is Catalyst's job here.
    """
    return df.filter(compile_expression(expr, df, type_hints=type_hints,
                                        schema_name=schema_name))


def _match_paths(df: DataFrame, extractors: Iterable[str]) -> list[str]:
    """Resolve field extractors (suffix semantics) AND type extractors
    (':string', ':time', ...) — the same operand forms `where` accepts
    (reference: select.cpp:58-67 resolves generic extractors). An
    extractor naming a RECORD field (e.g. ``ip`` over a packet schema)
    selects its whole subtree, as in the reference — a leaf matches if
    the extractor suffix-matches the leaf itself or any dotted ancestor."""
    from tenzir_spark.expr import Binder

    leaves = leaf_paths(df.schema)
    binder = None
    out: list[str] = []

    def ancestors(path: str):
        parts = path.split(".")
        for k in range(1, len(parts) + 1):
            yield ".".join(parts[:k])

    for ex in extractors:
        if ex.startswith(":"):
            binder = binder or Binder(df.schema)
            for p in binder.type_matches(ex[1:]):
                if p not in out:
                    out.append(p)
            continue
        hit = False
        for p, _ in leaves:
            if any(_suffix_matches(a, ex) for a in ancestors(p)):
                hit = True
                if p not in out:
                    out.append(p)
        if not hit and "." in ex:
            # map-key fallback, same resolution as Binder.field_matches
            parts = ex.split(".")
            for i in range(len(parts) - 1, 0, -1):
                head, key = ".".join(parts[:i]), ".".join(parts[i:])
                found = False
                for p, dt in leaves:
                    if isinstance(dt, T.MapType) and _suffix_matches(p, head):
                        m = f"{p}\x00{key}"
                        found = True
                        if m not in out:
                            out.append(m)
                if found:
                    break
    return out


def _rebuild(schema: T.StructType, keep: set[str], prefix: str = "") -> list[Column]:
    """Rebuild (possibly nested) columns keeping only leaf paths in ``keep``."""
    cols: list[Column] = []
    for field in schema.fields:
        path = f"{prefix}{field.name}"
        if isinstance(field.dataType, T.StructType):
            sub = _rebuild(field.dataType, keep, path + ".")
            if sub:
                cols.append(F.struct(*sub).alias(field.name))
        elif path in keep:
            # top-level names may CONTAIN dots (zeek `id.orig_h`) — quote
            ref = F.col(f"`{path}`") if prefix == "" else F.col(path)
            cols.append(ref.alias(field.name))
    return cols


def select(df: DataFrame, *extractors: str) -> DataFrame:
    """Keep only fields matching the extractors (suffix semantics), preserving
    nesting. Reference: select.cpp:48 (resolution at :58-67).

    Map-key paths (``extension.dvc`` over the cef map column) project
    the key into a struct of the map's name — the reference models the
    extension bag as a record, so this matches its `select` output
    shape (tests.yaml:873)."""
    matched = _match_paths(df, extractors)
    keep = {p for p in matched if "\x00" not in p}
    # _schema is our materialization of the reference's SLICE METADATA
    # (the schema name rides on the batch, not in the record), so a
    # projection carries it implicitly — `select x | where #schema == y`
    # keeps resolving (after-expression suite step 11). The implicit
    # carry is marked on the frame so printers strip it
    # (formats._strip_meta) — but a user who selects `_schema`
    # EXPLICITLY made it data, and it prints like any other column.
    carried = False
    if "_schema" in df.columns and "_schema" not in keep:
        keep.add("_schema")
        carried = True
    cols = _rebuild(df.schema, keep)
    map_hits: dict[str, list[str]] = {}
    for p in matched:
        if "\x00" in p:
            mp, key = p.split("\x00", 1)
            map_hits.setdefault(mp, []).append(key)
    for mp, keys in map_hits.items():
        base = F.col(f"`{mp}`") if "." in mp else F.col(mp)
        cols.append(F.struct(*[base.getItem(k).alias(k) for k in keys])
                    .alias(mp))
    out = df.select(*cols)
    if carried:
        out.__dict__["_tenzir_schema_carried"] = True
    return out


def drop(df: DataFrame, *extractors: str) -> DataFrame:
    """Remove fields matching the extractors. Reference: drop.cpp:51.
    Map-key paths remove that key from the map (map_filter)."""
    matched = _match_paths(df, extractors)
    victims = {p for p in matched if "\x00" not in p}
    keep = {p for p, _ in leaf_paths(df.schema)} - victims
    cols = _rebuild(df.schema, keep)
    dropped_keys: dict[str, list[str]] = {}
    for p in matched:
        if "\x00" in p:
            mp, key = p.split("\x00", 1)
            dropped_keys.setdefault(mp, []).append(key)
    out = df.select(*cols)
    for mp, keys in dropped_keys.items():
        base = F.col(f"`{mp}`") if "." in mp else F.col(mp)
        out = out.withColumn(mp, F.map_filter(
            base, lambda k, _v: ~k.isin(keys)))
    return out


def put(df: DataFrame, **fields: Column | str) -> DataFrame:
    """Keep ONLY the listed fields, each optionally computed; a bare string
    value is treated as a source column name, missing columns become null.
    Reference: put_extend_replace.cpp:121 (mode::put at :142-157)."""
    existing = {p for p, _ in leaf_paths(df.schema)}
    cols = []
    for name, v in fields.items():
        if isinstance(v, Column):
            cols.append(v.alias(name))
        elif isinstance(v, str) and v in existing:
            cols.append(F.col(v).alias(name))
        elif isinstance(v, str):
            cols.append(F.lit(v).alias(name))
        else:
            cols.append(F.lit(v).alias(name))
    return df.select(*cols)


def extend(df: DataFrame, **fields: Column) -> DataFrame:
    """Append new fields; never touches existing ones (errors if clashing).
    Reference: put_extend_replace.cpp mode::extend at :158-173."""
    for name in fields:
        if name in df.columns:
            raise ValueError(f"extend: field {name!r} already exists")
    return df.withColumns({n: (c if isinstance(c, Column) else F.lit(c)) for n, c in fields.items()})


def replace(df: DataFrame, **fields: Column) -> DataFrame:
    """Overwrite existing fields. Reference: put_extend_replace.cpp
    mode::replace at :174-207."""
    for name in fields:
        if name not in df.columns:
            raise ValueError(f"replace: field {name!r} does not exist")
    return df.withColumns({n: (c if isinstance(c, Column) else F.lit(c)) for n, c in fields.items()})


def rename(df: DataFrame, **mapping: str) -> DataFrame:
    """rename(new=old, ...) — metadata-only rename; ``old`` may be a
    suffix extractor resolving to one top-level column (reference:
    rename.cpp:75 renames via extractors)."""
    out = df
    for new, old in mapping.items():
        if old not in out.columns:
            matches = [c for c in out.columns if _suffix_matches(c, old)]
            if len(matches) == 1:
                old = matches[0]
            elif len(matches) > 1:
                raise ValueError(f"rename: extractor {old!r} is ambiguous: {matches}")
        out = out.withColumnRenamed(old, new)
    return out


def _flatten_array(out: list, c: Column, et, prefix: str, sep: str) -> None:
    """Flatten a column of type array<et> (reference flatten semantics:
    nested lists concatenate into one list; lists of records transpose
    into one list per leaf field, names joined with ``sep``)."""
    while isinstance(et, T.ArrayType):
        c = F.flatten(c)
        et = et.elementType
    if isinstance(et, T.StructType):
        for f in et.fields:
            # one-arg closure: a two-parameter lambda would make
            # F.transform pass the element INDEX as the second arg
            def _get(fn):
                return lambda x: x[fn]
            _flatten_array(out, F.transform(c, _get(f.name)),
                           f.dataType, prefix + sep + f.name, sep)
    else:
        out.append((prefix, c))


def flatten(df: DataFrame, sep: str = ".") -> DataFrame:
    """Flatten nested records into ``a.b``-named top-level columns.
    Nested lists concatenate into a single list and records inside lists
    transpose into per-field lists (``{"a":[{"b":1}]}`` -> ``a.b: [1]``),
    matching the reference's own flatten goldens. Maps stay opaque.
    Reference: flatten.cpp:26, table_slice flatten."""
    out: list = []

    def walk(col: Column, dt, prefix: str) -> None:
        if isinstance(dt, T.StructType):
            for f in dt.fields:
                walk(col.getField(f.name), f.dataType,
                     f"{prefix}{sep}{f.name}" if prefix else f.name)
        elif isinstance(dt, T.ArrayType):
            _flatten_array(out, col, dt.elementType, prefix, sep)
        else:
            out.append((prefix, col))

    for f in df.schema.fields:
        walk(F.col(f"`{f.name}`"), f.dataType, f.name)
    return df.select(*[c.alias(n) for n, c in out])


def _unflatten_value(col: Column, dt, sep: str) -> Column:
    """Recursively unflatten inside a value: records resolve their own
    field names; list elements recurse (reference unflatten_list,
    table_slice.cpp:1174)."""
    if isinstance(dt, T.StructType):
        pairs = _unflatten_fields(lambda n: col.getField(n), dt.fields, sep)
        return F.struct(*[c.alias(n) for n, c in pairs])
    if isinstance(dt, T.ArrayType):
        et = dt.elementType
        if isinstance(et, (T.StructType, T.ArrayType)):
            return F.transform(col, lambda x: _unflatten_value(x, et, sep))
    return col


def _unflatten_fields(get, fields, sep: str) -> list[tuple[str, Column]]:
    """Resolve one record level per the reference's conflict rules
    (table_slice.cpp:1230 unflatten_struct_array): a name whose
    before-last-separator prefix is itself a field stays flat; otherwise
    it nests under its shortest prefix that is NOT a field name. Output
    preserves original field order (groups emit at their first member)."""
    names = [f.name for f in fields]
    orig = set(names)
    dts = {f.name: f.dataType for f in fields}
    plan: dict[str, tuple] = {}
    for n in names:
        if sep not in n or n.startswith(sep) or n.endswith(sep):
            plan[n] = ("self",)
            continue
        if n.rsplit(sep, 1)[0] in orig:
            # value collision with an already-placeable field -> retain
            plan[n] = ("self",)
            continue
        parts = n.split(sep)
        for i in range(1, len(parts)):
            pref = sep.join(parts[:i])
            if pref not in orig:
                plan[n] = ("child", pref, sep.join(parts[i:]))
                break

    def build(node) -> Column:
        if isinstance(node, Column):
            return node
        return F.struct(*[build(v).alias(k) for k, v in node.items()])

    groups: dict[str, list[tuple[str, str]]] = {}
    for n in names:
        if plan[n][0] == "child":
            groups.setdefault(plan[n][1], []).append((plan[n][2], n))
    out: list[tuple[str, Column]] = []
    emitted: set[str] = set()
    for n in names:
        if plan[n][0] == "self":
            out.append((n, _unflatten_value(get(n), dts[n], sep)))
            continue
        parent = plan[n][1]
        if parent in emitted:
            continue
        emitted.add(parent)
        tree: dict = {}
        for rest, member in groups[parent]:
            node = tree
            ps = rest.split(sep)
            for part in ps[:-1]:
                node = node.setdefault(part, {})
            node[ps[-1]] = _unflatten_value(get(member), dts[member], sep)
        out.append((parent, build(tree)))
    return out


def unflatten(df: DataFrame, sep: str = ".") -> DataFrame:
    """Rebuild nested records from separator-joined column names,
    recursing into records nested in lists and keeping conflicting names
    flat exactly like the reference. Reference: unflatten.cpp:27,
    table_slice.cpp:1230."""
    pairs = _unflatten_fields(
        lambda n: F.col(f"`{n}`"), df.schema.fields, sep)
    return df.select(*[c.alias(n) for n, c in pairs])


def _q(c: str):
    """Backtick-quoted column ref — survives literal dots in names
    (zeek `id.orig_h`)."""
    return F.col("`%s`" % c)


def enumerate_rows(df: DataFrame, field: str = "#", order_by: str | Column | None = None,
                   per_schema_col: str | None = None) -> DataFrame:
    """Prepend a 0-based row number. The reference counts per schema
    (enumerate.cpp:31); distributed Spark needs an explicit order — pass
    ``order_by``. Without one, falls back to a partition-monotonic id
    (stable but not dense across partitions — documented divergence).

    The global enumeration is fully distributed and a SINGLE lazy plan:
    rows get a deterministic range-bucket id (a pure function of the
    order key — see operators.rangekey), per-bucket row numbers run in
    parallel, and bucket offsets come from an O(buckets) count aggregate
    cumulated with a tiny window. Because the bucket id is data-derived
    (not sampled partitioner state), no persist() is needed for the two
    plan branches to agree — fixing the cache leak repartitionByRange +
    spark_partition_id required, and removing the driver collect.
    """
    from tenzir_spark.operators.rangekey import with_range_pid

    name = "idx" if field == "#" else field
    if order_by is None:
        out = df.withColumn(name, F.monotonically_increasing_id())
        return out.select(name, *[_q(c) for c in df.columns])
    if per_schema_col:
        w = Window.partitionBy(per_schema_col).orderBy(order_by)
        out = df.withColumn(name, F.row_number().over(w) - 1)
        return out.select(name, *[_q(c) for c in df.columns])
    ocol = _q(order_by) if isinstance(order_by, str) else order_by
    part = with_range_pid(df, order_by)
    if part is None:
        # order key with no monotone numeric proxy (array/struct/map):
        # global window — documented small-input fallback
        w = Window.orderBy(ocol)
        out = df.withColumn(name, F.row_number().over(w) - 1)
        return out.select(name, *[_q(c) for c in df.columns])
    counts = part.groupBy("__pid").agg(F.count(F.lit(1)).alias("__n"))
    wo = Window.orderBy("__pid").rowsBetween(Window.unboundedPreceding, -1)
    offs = counts.select(
        "__pid", F.coalesce(F.sum("__n").over(wo), F.lit(0)).alias("__off"))
    w = Window.partitionBy("__pid").orderBy(ocol)
    out = (part.join(F.broadcast(offs), "__pid")
           .withColumn(name, F.row_number().over(w) - 1 + F.col("__off")))
    return out.select(name, *[_q(c) for c in df.columns])


def hash_column(df: DataFrame, field: str, salt: str | None = None, out: str | None = None) -> DataFrame:
    """Append a SHA-256 hex digest of a field (optionally salted).
    Reference: hash.cpp:54 (appends ``<field>_hashed``)."""
    target = out or f"{field}_hashed"
    col = F.col(f"`{field}`").cast("string")
    if salt:
        col = F.concat(col, F.lit(salt))
    out_df = df.withColumn(target, F.sha2(col, 256))
    if field in df.columns and target not in df.columns:
        # the reference INSERTS the digest right after its source field
        # (hash.cpp transform_fn returns the pair adjacent), not at the
        # end of the layout
        cols = list(df.columns)
        cols.insert(cols.index(field) + 1, target)
        out_df = out_df.select(*[F.col(f"`{c}`") for c in cols])
    return out_df


def pass_(df: DataFrame) -> DataFrame:
    """Identity. Reference: pass.cpp:24."""
    return df


def batch(df: DataFrame, limit: int = 65536) -> DataFrame:
    """Re-batching is an Arrow-boundary knob in the reference
    (batch.cpp:24); in Spark the analog is partition sizing, so for
    execution purposes this stays a no-op. The requested size rides on
    the frame so a following `measure` reports per-BATCH rows exactly
    like the reference ('Batch Events' integration golden: repeat 10 |
    batch 3 | measure -> events 3,3,3,1)."""
    df.__dict__["_tenzir_batch"] = max(int(limit), 1)
    return df


def repeat(df: DataFrame, n: int = 2) -> DataFrame:
    """Repeat the input n times. Reference: repeat.cpp:31.

    Declarative form: a broadcast cross join against a tiny n-row
    relation duplicates every row n times in place — the upstream is
    evaluated ONCE, inside one Catalyst plan, with no cached/checkpointed
    state to manage (the previous localCheckpoint variant left its
    blocks in the persistent-RDD registry until a JVM GC). Row order is
    not the reference's strict n-fold sequence, but distributed row
    order is undefined anyway."""
    if n <= 1:
        return df
    rep = df.sparkSession.range(n).toDF("__repeat_i")
    return df.crossJoin(F.broadcast(rep)).drop("__repeat_i")
