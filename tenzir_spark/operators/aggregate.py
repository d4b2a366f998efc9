"""summarize / sort / top / rare — grouping, ordering, frequency.

Aggregation functions mirror the reference's aggregation_function_plugins
(libtenzir/builtins/aggregation-functions/*.cpp); all map to native Spark
aggregates so partial (map-side) aggregation and codegen apply.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# name -> Column-factory; incremental add()/finish() contract of the
# reference (aggregation_function.hpp) ≅ Spark partial aggregates.
AGGREGATION_FUNCTIONS = {
    # sum.cpp:20-115 — null-skipping numeric sum (Spark sum skips nulls)
    "sum": lambda c: F.sum(c),
    # min.cpp:20 / max.cpp:20
    "min": lambda c: F.min(c),
    "max": lambda c: F.max(c),
    # count.cpp:20 — non-null count; count(.) == count(*) across schemas
    "count": lambda c: F.count(c),
    "count_star": lambda c: F.count(F.lit(1)),
    # count_distinct.cpp:54-86 — EXACT distinct (not approx, for parity)
    "count_distinct": lambda c: F.countDistinct(c),
    "approx_count_distinct": lambda c: F.approx_count_distinct(c),
    # distinct.cpp — sorted list of distinct values; NULL (not []) when
    # no non-null input (summarize-all-none-some golden: distinct over
    # an absent column renders null)
    "distinct": lambda c: (lambda a: F.when(F.size(a) > 0, a))(
        F.array_sort(F.collect_set(c))),
    # any.cpp / all.cpp — boolean or / and
    "any": lambda c: F.bool_or(c),
    "all": lambda c: F.bool_and(c),
    # sample.cpp — first non-null value seen
    "sample": lambda c: F.first(c, ignorenulls=True),
    # extras beyond the reference (documented as such)
    "avg": lambda c: F.avg(c),
    "stddev": lambda c: F.stddev(c),
    "median": lambda c: F.median(c),
    "p95": lambda c: F.percentile_approx(c, 0.95),
    "collect": lambda c: F.collect_list(c),
}


def _agg_column(spec: str | tuple | Column, binder=None) -> Column:
    """Accepts 'out=func(field)', ('out','func','field'), or a Column."""
    if isinstance(spec, Column):
        return spec
    if isinstance(spec, tuple):
        out, func, field = spec
    else:
        text = spec
        out = None
        if "=" in text.split("(")[0]:
            out, text = text.split("=", 1)
            out = out.strip()
        func, rest = text.split("(", 1)
        func = func.strip()
        field = rest.rsplit(")", 1)[0].strip()
        if out is None:
            # unaliased aggregates keep their spec text as the output
            # column, exactly like the reference's json output
            # (export-pipeline-operator-parsing-only-summarize golden:
            # `summarize distinct(SourcePort) by SourceIp` emits a
            # column literally named "distinct(SourcePort)")
            out = f"{func}({field})"
    if field in (".", "*", "") and func not in ("count", "count_star"):
        # reference contract (summarize-dot golden): only count accepts
        # the whole-event `.` extractor
        raise ValueError(
            f"the `.` extractor is not supported for `{func}`")
    fn = AGGREGATION_FUNCTIONS[func]
    col = F.lit(1) if field in (".", "*", "") else _field_col(field, binder)
    if func == "count" and field in (".", "*", ""):
        fn = AGGREGATION_FUNCTIONS["count_star"]
    return fn(col).alias(out)


def _field_col(field: str, binder) -> Column:
    """Resolve an aggregate/key field like the reference's extractors:
    suffix match against the schema; a field ABSENT from the schema
    aggregates/groups as null instead of failing analysis
    (tests.yaml:919 'Summarize All None Some' — distinct(y) over a
    schema without y yields null, by z groups everything under null)."""
    if binder is None:
        return F.col(field)
    hits = binder.field_matches(field)
    if not hits:
        return F.lit(None)
    return binder.col(hits[0])


def summarize(
    df: DataFrame,
    aggs: Sequence[str | tuple | Column],
    by: Sequence[str | Column] = (),
    resolution: str | None = None,
    time_col: str | None = None,
) -> DataFrame:
    """Group-by + aggregation, consuming the whole input.

    Reference: summarize.cpp:744 (streaming hash-agg at :348-536). The
    ``resolution`` option buckets a time key (summarize.cpp:41-95
    FloorTemporal) — mapped to ``date_trunc``-style windowing via
    ``F.window`` so the bucket start is emitted like the reference's
    floored key. Grouping keys missing in a schema become null groups
    (union-by-name upstream handles heterogeneity).

    Scale: plain groupBy — Catalyst gives partial aggregation before the
    shuffle; AQE coalesces post-shuffle partitions.
    """
    from tenzir_spark.expr import Binder

    # Exact count_distinct plans as a two-level aggregate whose FIRST
    # level groups by (keys + distinct column); a scan feeding few tasks
    # (single-row-group parquet) serializes that level. When the source
    # is concentrated (_needs_fanout) hash-repartition by
    # (keys + distinct columns): every partition column is a subset of
    # the first aggregate's grouping keys, so the planner drops the
    # post-partial-agg exchange (ENSURE_REQUIREMENTS satisfied) and the
    # heavy level runs at full width — measured 3.6s -> 1.0s on the
    # sf1.0 lineitem count_distinct board query. At scale the source is
    # already wide and this never fires (the map-side partial aggregate
    # shuffles fewer bytes than a full repartition would).
    if resolution is None:
        distinct_fields: list[str] = []
        for a in aggs:
            func = field = None
            if isinstance(a, tuple):
                _, func, field = a
            elif isinstance(a, str) and "(" in a:
                text = a.split("=", 1)[-1]
                func = text.split("(", 1)[0].strip()
                field = text.split("(", 1)[1].rsplit(")", 1)[0].strip()
            if func == "count_distinct":
                distinct_fields.append(field)
        by_plain = [k for k in by if isinstance(k, str) and k in df.columns]
        if (distinct_fields
                and all(f in df.columns for f in distinct_fields)
                and len(by_plain) == len(list(by))):
            from tenzir_spark.functions.dedup import _needs_fanout
            par = df.sparkSession.sparkContext.defaultParallelism
            if _needs_fanout(df, par):
                df = df.repartition(
                    par, *[F.col(c) for c in by_plain + distinct_fields])

    binder = Binder(df.schema)
    keys: list[Column] = []
    for k in by:
        if isinstance(k, Column):
            keys.append(k)
        elif k in (".", ""):
            # reference contract (summarize-dot golden): `.` is not a
            # grouping key
            raise ValueError("cannot group by the `.` extractor")
        elif resolution and time_col and k == time_col:
            keys.append(F.window(F.col(k), resolution).start.alias(k))
        else:
            keys.append(_field_col(k, binder).alias(k.split(".")[-1]
                        if k not in df.columns else k))
    if resolution and time_col and time_col not in [k for k in by if isinstance(k, str)]:
        # resolution given but the time key absent from `by`: the reference
        # floors the time key it finds and groups by it regardless
        # (summarize.cpp:41-95 FloorTemporal) — append the floored key so
        # the option is never a silent no-op
        keys.append(F.window(F.col(time_col), resolution).start.alias(time_col))
    agg_cols = [_agg_column(a, binder) for a in aggs]
    out = df.groupBy(*keys).agg(*agg_cols) if keys else df.agg(*agg_cols)
    if any(isinstance(k, str) and k == "_schema" for k in by):
        # grouping by `_schema` makes it DATA — block the implicit
        # routing mark so printers keep the key column
        out.__dict__["_tenzir_schema_carried"] = False
    return out


def sort(df: DataFrame, field: str | Column, ascending: bool = True,
         nulls_first: bool | None = None) -> DataFrame:
    """Materializing sort by one field with explicit null placement.

    Reference: sort.cpp:157 (arrow SortIndices + gather, single node).
    Spark replaces the gather with a range-partitioned distributed sort
    (sampled range boundaries, per-partition sort — scales linearly).
    Default null placement follows the reference: nulls last for
    ascending, first for descending... (sort.cpp:181-208 options).
    """
    col = F.col(field) if isinstance(field, str) else field
    if nulls_first is None:
        nulls_first = not ascending
    if ascending:
        col = col.asc_nulls_first() if nulls_first else col.asc_nulls_last()
    else:
        col = col.desc_nulls_first() if nulls_first else col.desc_nulls_last()
    return df.orderBy(col)


def _top_rare_check(op: str, field: str, count_field: str) -> None:
    """Argument contract of top_rare.cpp (mirrored by the reference's
    'Top and Rare Operators' error steps): a field is required, and the
    count field must not collide with it."""
    if not field or not field.strip():
        raise ValueError(f"{op} requires a field argument")
    if not count_field or not count_field.strip():
        raise ValueError(f"{op}: count field must not be empty")
    if field == count_field:
        raise ValueError(
            f"{op}: count field {count_field!r} collides with the "
            f"grouped field")


def _grp_col(df: DataFrame, field: str) -> Column:
    """A dotted name that IS a column (zeek `id.orig_h`) needs
    backticks; otherwise the dots mean nested access."""
    return F.col(f"`{field}`") if field in df.columns else F.col(field)


def top(df: DataFrame, field: str, count_field: str = "count", limit: int | None = None) -> DataFrame:
    """Most frequent values of a field. Reference: top_rare.cpp:24 —
    expands to ``summarize count(.) by x | sort desc`` (:70-82)."""
    _top_rare_check("top", field, count_field)
    key = _grp_col(df, field)
    out = df.groupBy(key.alias(field)) \
            .agg(F.count(F.lit(1)).alias(count_field)) \
            .orderBy(F.col(count_field).desc(), F.col(f"`{field}`").asc())
    return out.limit(limit) if limit else out


def rare(df: DataFrame, field: str, count_field: str = "count", limit: int | None = None) -> DataFrame:
    """Least frequent values. Reference: top_rare.cpp:88-89."""
    _top_rare_check("rare", field, count_field)
    key = _grp_col(df, field)
    out = df.groupBy(key.alias(field)) \
            .agg(F.count(F.lit(1)).alias(count_field)) \
            .orderBy(F.col(count_field).asc(), F.col(f"`{field}`").asc())
    return out.limit(limit) if limit else out
