"""Casting lattice + multi-schema stream unification.

The reference casts record batches between schemas pairwise: identity,
int64<->uint64, string->typed parsing, list element-wise, and
record->record where new fields become null and types widen when castable
(libtenzir/include/tenzir/cast.hpp:261-499). Multi-schema streams
(SURVEY §1.1) have no first-class Spark form, so heterogeneous inputs are
unified here: compute the least common schema, cast every frame to it,
and unionByName — with an optional `_schema` column preserving the
original stream identity (the reference's #schema meta extractor).
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

# widening lattice (reference cast.hpp:545-570 int/uint + numeric widen)
_RANK = {
    T.ByteType: 1, T.ShortType: 2, T.IntegerType: 3, T.LongType: 4,
    T.FloatType: 5, T.DoubleType: 6,
}


def _widen(a: T.DataType, b: T.DataType) -> T.DataType:
    if a == b:
        return a
    if isinstance(a, T.NullType):
        return b
    if isinstance(b, T.NullType):
        return a
    ra, rb = _RANK.get(type(a)), _RANK.get(type(b))
    if ra is not None and rb is not None:
        return a if ra >= rb else b
    # uint64 policy (SURVEY §1.2; reference type.hpp:521): uint64 rides
    # as DECIMAL(20,0) losslessly, so int64 + uint64 streams unify to
    # decimal(20,0) — the reference's int64<->uint64 lattice edge
    # (cast.hpp:545,570) — not the string fallback
    for x, y in ((a, b), (b, a)):
        if isinstance(x, T.DecimalType) and x.scale == 0 \
                and isinstance(y, (T.ByteType, T.ShortType, T.IntegerType,
                                   T.LongType)):
            return T.DecimalType(max(x.precision, 20), 0)
        if isinstance(x, T.DecimalType) and \
                isinstance(y, (T.FloatType, T.DoubleType)):
            return T.DoubleType()
    if isinstance(a, T.DecimalType) and isinstance(b, T.DecimalType):
        scale = max(a.scale, b.scale)
        whole = max(a.precision - a.scale, b.precision - b.scale)
        return T.DecimalType(min(whole + scale, 38), scale)
    if isinstance(a, T.StructType) and isinstance(b, T.StructType):
        return unify_struct(a, b)
    if isinstance(a, T.ArrayType) and isinstance(b, T.ArrayType):
        return T.ArrayType(_widen(a.elementType, b.elementType), True)
    if isinstance(a, T.MapType) and isinstance(b, T.MapType):
        # map<K,V> widens key- and value-wise (reference: type.hpp:1074
        # map type; cast lattice treats containers element-wise)
        return T.MapType(_widen(a.keyType, b.keyType),
                         _widen(a.valueType, b.valueType), True)
    if isinstance(a, (T.TimestampType, T.TimestampNTZType)) and \
       isinstance(b, (T.TimestampType, T.TimestampNTZType)):
        return T.TimestampType()
    # incompatible -> string (the universal textual fallback, matching the
    # reference's string-cast escape hatch cast.hpp:261)
    return T.StringType()


def unify_struct(a: T.StructType, b: T.StructType) -> T.StructType:
    """Field-by-field record unification: union of fields, widened types,
    everything nullable (new fields are null in frames lacking them)."""
    fields: dict[str, T.DataType] = {}
    order: list[str] = []
    for schema in (a, b):
        for f in schema.fields:
            if f.name in fields:
                fields[f.name] = _widen(fields[f.name], f.dataType)
            else:
                fields[f.name] = f.dataType
                order.append(f.name)
    return T.StructType([T.StructField(n, fields[n], True) for n in order])


def _conform(col, src: T.DataType, dst: T.DataType):
    """Structural cast: Spark's CAST cannot add struct fields, so nested
    records are rebuilt field-by-field (missing subfields -> typed nulls,
    null structs stay null), arrays element-wise."""
    if src == dst:
        return col
    if isinstance(dst, T.StructType):
        if not isinstance(src, T.StructType):
            return F.lit(None).cast(dst)
        src_map = {f.name: f.dataType for f in src.fields}
        parts = []
        for f in dst.fields:
            if f.name in src_map:
                parts.append(_conform(col.getField(f.name), src_map[f.name], f.dataType).alias(f.name))
            else:
                parts.append(F.lit(None).cast(f.dataType).alias(f.name))
        return F.when(col.isNull(), F.lit(None).cast(dst)).otherwise(F.struct(*parts))
    if isinstance(dst, T.ArrayType) and isinstance(src, T.ArrayType):
        return F.transform(col, lambda x: _conform(x, src.elementType, dst.elementType))
    return col.cast(dst)


def cast_to(df: DataFrame, target: T.StructType) -> DataFrame:
    """record->record cast: missing fields -> typed nulls, present fields
    cast (widening per the lattice, nested-struct aware); extra fields
    are dropped."""
    src = {f.name: f.dataType for f in df.schema.fields}
    cols = []
    for f in target.fields:
        if f.name in src:
            # backticks: a flat column literally named `id.orig_h`
            # (zeek) must not parse as nested struct access
            c = F.col(f"`{f.name}`") if "." in f.name else F.col(f.name)
            cols.append(_conform(c, src[f.name], f.dataType).alias(f.name))
        else:
            cols.append(F.lit(None).cast(f.dataType).alias(f.name))
    return df.select(*cols)


def unify_streams(frames: dict[str, DataFrame] | list[DataFrame],
                  schema_col: str | None = "_schema") -> DataFrame:
    """Merge heterogeneous-schema frames into one DataFrame.

    dict form tags each frame's origin in ``schema_col`` so `#schema`
    predicates and `taste` (per-schema budgets) keep working.
    """
    if isinstance(frames, dict):
        named = list(frames.items())
    else:
        named = [(None, df) for df in frames]
    target = reduce(unify_struct, [df.schema for _, df in named])
    outs = []
    for name, df in named:
        out = cast_to(df, target)
        if schema_col and name is not None:
            out = out.withColumn(schema_col, F.lit(name))
        outs.append(out)
    return reduce(lambda a, b: a.unionByName(b, allowMissingColumns=True), outs)
