"""Deterministic range bucketing for order-dependent operators.

``enumerate`` and ``unique`` need rows range-clustered by an order key so
per-partition work (row numbers, adjacent-duplicate tests) parallelizes
and only O(partitions) boundary state crosses partitions. Spark's
``repartitionByRange`` samples with a per-plan random seed, so two
executions of the same logical plan can assign rows to different
partitions — any operator that computes per-partition metadata in one
action and consumes it in another must then pin the data with persist()
(a cache leak) or risk mismatched assignments.

This module removes that dependency: the bucket id is a PURE FUNCTION of
the row (an order-preserving numeric proxy compared against boundaries
fixed once via approxQuantile), so every branch of the plan computes the
same assignment with no cache, no exchange reuse, and no sampling races.
The quantile pass is one aggregate returning O(buckets) doubles.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

_NUMERIC = (T.ByteType, T.ShortType, T.IntegerType, T.LongType,
            T.FloatType, T.DoubleType, T.DecimalType)


def order_proxy(col: Column, dtype: T.DataType) -> Column | None:
    """An order-preserving double proxy of ``col``: a <= b under the
    column's ordering implies proxy(a) <= proxy(b). Rounding to double is
    monotone, so boundary assignment stays consistent with the true
    order; ties introduced by the proxy merely coarsen buckets.
    Returns None for types without a cheap monotone embedding."""
    if isinstance(dtype, _NUMERIC):
        return col.cast("double")
    if isinstance(dtype, T.BooleanType):
        return col.cast("int").cast("double")
    if isinstance(dtype, (T.TimestampType, T.TimestampNTZType)):
        return col.cast("double")
    if isinstance(dtype, T.DateType):
        return col.cast("timestamp").cast("double")
    if isinstance(dtype, T.StringType):
        # Spark compares strings bytewise (UTF8String); the first 8 bytes
        # as a big-endian integer embed that order (right-padded with
        # zero bytes so shorter strings don't shrink the magnitude)
        h = F.rpad(F.hex(F.substring(col.cast("binary"), 1, 8)), 16, "0")
        return F.conv(h, 16, 10).cast("double")
    return None


def with_range_pid(df: DataFrame, order_by: str | Column,
                   num_buckets: int | None = None,
                   pid_col: str = "__pid") -> DataFrame | None:
    """Add a deterministic range-bucket id for the order key and
    hash-distribute by it. Buckets are ordered: every row in bucket i
    sorts <= every row in bucket i+1 (nulls land in bucket 0, matching
    asc-nulls-first). Returns None when the key type has no proxy —
    callers fall back to a documented small-input path.

    Scale: ~defaultParallelism buckets (capped at 512 to keep the flat
    comparison expression codegen-friendly — raise ``num_buckets`` for
    wider clusters), boundaries from one approxQuantile aggregate."""
    col = F.col("`%s`" % order_by) if isinstance(order_by, str) else order_by
    dtype = df.select(col.alias("__o")).schema[0].dataType
    proxy = order_proxy(col, dtype)
    if proxy is None:
        return None
    sc = df.sparkSession.sparkContext
    n = num_buckets or min(max(sc.defaultParallelism, 2), 512)
    probs = [i / n for i in range(1, n)]
    bounds = df.select(proxy.alias("__prx")).stat.approxQuantile(
        "__prx", probs, 0.001)
    bounds = sorted(set(b for b in bounds if b is not None))
    if not bounds:
        # constant / all-null key: one bucket (degenerate but correct)
        return df.withColumn(pid_col, F.lit(0))
    # flat sum-of-comparisons (no higher-order function: HOF lambdas with
    # outer column references mis-bind under column pruning in Spark 4.1)
    pid = None
    for b in bounds:
        term = (proxy > F.lit(float(b))).cast("int")
        pid = term if pid is None else pid + term
    pid = F.coalesce(pid, F.lit(0))  # null proxy (nulls-first) -> bucket 0
    return df.withColumn(pid_col, pid).repartition(len(bounds) + 1, pid_col)
