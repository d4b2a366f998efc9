"""Cardinality operators: head / tail / taste / unique / deduplicate."""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T


def head(df: DataFrame, n: int = 10, order_by: str | Column | None = None) -> DataFrame:
    """First N events. Reference: head.cpp:24 (terminates input early —
    Spark's LocalLimit/GlobalLimit does the same short-circuit).
    Distributed streams have no inherent order; pass ``order_by`` for a
    deterministic result."""
    if order_by is not None:
        df = df.orderBy(order_by)
    return df.limit(n)


def tail(df: DataFrame, n: int = 10, order_by: str | Column | None = None) -> DataFrame:
    """Last N events. Reference: tail.cpp:24 (ring buffer over batches).
    Spark form: sort descending, limit, restore order — the descending
    TakeOrderedAndProject is a single pass, no full sort."""
    if order_by is None:
        raise ValueError("tail requires an explicit order_by in a distributed setting")
    col = F.col(order_by) if isinstance(order_by, str) else order_by
    return df.orderBy(col.desc()).limit(n).orderBy(col.asc())


def taste(df: DataFrame, n: int = 10, schema_col: str = "_schema",
          order_by: str | Column | None = None) -> DataFrame:
    """First N events *per schema* (here: per value of ``schema_col``).
    Reference: taste.cpp:24-66 (per-schema budget)."""
    order = order_by if order_by is not None else F.monotonically_increasing_id()
    w = Window.partitionBy(schema_col).orderBy(order)
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= n)
        .drop("__rn")
    )


def _q(c: str):
    """Backtick-quoted column ref (names may contain literal dots)."""
    return F.col("`%s`" % c)


def unique(df: DataFrame, order_by: str | Column | None = None,
           compare_cols: list[str] | None = None) -> DataFrame:
    """Remove adjacent duplicate rows (Unix ``uniq``). Reference:
    unique.cpp:18 (duplicate test :79-88 compares consecutive rows).

    Adjacency needs a total order; given ``order_by`` we compare each row
    to its predecessor with lag() over all other columns. Without an
    order column this degrades to dropDuplicates() — identical result for
    the canonical ``sort | unique`` idiom the reference documents.

    Scale design: rows get a DETERMINISTIC range-bucket id (a pure
    function of the order key — operators.rangekey), lag runs per bucket
    (parallel), and each bucket's first row compares against the previous
    non-empty bucket's last row, carried through an O(buckets) aggregate
    + lag window and broadcast back. One lazy plan: no global
    single-reducer window, no persist, no driver collect of row data.

    ``compare_cols`` restricts the duplicate test to a subset — the
    faithful translation when the ordering column is synthetic (the
    reference's stream order is implicit, never part of the row).
    """
    from tenzir_spark.operators.rangekey import with_range_pid

    if order_by is None:
        return df.dropDuplicates(compare_cols)
    out_cols = [c for c in df.columns]
    cols = list(compare_cols) if compare_cols else out_cols
    ocol = _q(order_by) if isinstance(order_by, str) else order_by
    part = with_range_pid(df, order_by)
    if part is None:
        # exotic order-key type: global window (small-input fallback)
        w = Window.orderBy(order_by)
        prev = [F.lag(_q(c)).over(w).alias(f"__p_{c}") for c in cols]
        tagged = df.select(*[_q(c) for c in out_cols], *prev)
        same = None
        for c in cols:
            eq = _q(c).eqNullSafe(_q(f"__p_{c}"))
            same = eq if same is None else (same & eq)
        return tagged.filter(~F.coalesce(same, F.lit(False))).select(*[_q(c) for c in out_cols])
    # previous non-empty bucket's last row, shifted to be each bucket's
    # cross-boundary predecessor (tiny: one row per bucket)
    lastr = part.groupBy("__pid").agg(
        F.max_by(F.struct(*[_q(c).alias(c) for c in cols]), ocol).alias("__r"))
    bdf = (lastr.select(
        "__pid", F.lag("__r").over(Window.orderBy("__pid")).alias("__b"))
        .filter(F.col("__b").isNotNull()))
    w = Window.partitionBy("__pid").orderBy(ocol)
    prev = [F.lag(_q(c)).over(w).alias(f"__p_{c}") for c in cols]
    tagged = part.select(
        "__pid", *[_q(c).alias(c) for c in out_cols], *prev,
        F.lag(F.lit(1)).over(w).isNull().alias("__first"))
    tagged = tagged.join(F.broadcast(bdf), "__pid", "left")
    # the first row of a bucket has no lag(): its predecessor is the
    # previous bucket's last row (absent only for the very first bucket)
    is_first = F.col("__first")
    has_pred = (~is_first) | F.col("__b").isNotNull()
    same = None
    for c in cols:
        pc = F.when(is_first, F.col("__b").getField(c)).otherwise(_q(f"__p_{c}"))
        eq = _q(c).eqNullSafe(pc)
        same = eq if same is None else (same & eq)
    return tagged.filter(~(F.coalesce(same, F.lit(False)) & has_pred)).select(*[_q(c) for c in out_cols])


def deduplicate(df: DataFrame, key: str | list[str], order_col: str,
                keep: str = "max") -> DataFrame:
    """Keep one row per key: the row with the max (or min) ``order_col``.

    This is the CDC-grade dedup of the north rule (max-lsn wins). It is
    implemented as ``groupBy(key).agg(max_by(struct(*), order))`` rather
    than a row_number window: the aggregate gets map-side partial
    aggregation (each input partition reduces to <=1 row per key before
    the shuffle), so hot keys cost O(partitions) post-shuffle rows instead
    of shuffling every duplicate to one reducer — the idiomatic answer to
    hot-domain skew at 10^10 events.
    """
    keys = [key] if isinstance(key, str) else list(key)
    others = [c for c in df.columns if c not in keys]
    agg = F.max_by(F.struct(*[F.col(c) for c in others]), F.col(order_col)) if keep == "max" \
        else F.min_by(F.struct(*[F.col(c) for c in others]), F.col(order_col))
    out = df.groupBy(*keys).agg(agg.alias("__row"))
    return out.select(*keys, *[F.col(f"__row.{c}").alias(c) for c in others])
