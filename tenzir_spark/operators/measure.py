"""measure — replace data with per-batch/partition metrics.

Reference: libtenzir/builtins/operators/measure.cpp:24 (emits events/bytes
per batch with schema + timestamp). Spark analog: per-partition row/byte
metrics computed distributedly, one output row per partition.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def measure(df: DataFrame, schema_col: str | None = None,
            schema_name: str | None = None) -> DataFrame:
    """Replace events with measurement rows: one per (partition, schema)
    with event count. Byte size is approximated from Spark's column sizes
    when available (exact wire bytes are a format concern).

    ``schema_name`` labels the whole frame (readers attach their declared
    schema name, e.g. ``tenzir.json`` / ``cef.event`` — measure.cpp:47
    reads it off the batch); ``schema_col`` groups by a per-row column
    when schemas vary within the frame."""
    bsize = df.__dict__.get("_tenzir_batch")
    if bsize:
        # a preceding `batch N` pins exact batch boundaries (reference
        # batch.cpp): number rows globally and bucket by N. The global
        # row_number is a single-partition window — `batch` is a
        # debug/shaping op, not a bulk path.
        from pyspark.sql.window import Window
        w = Window.orderBy(F.monotonically_increasing_id())
        df = df.withColumn(
            "__batch", F.floor((F.row_number().over(w) - 1) / bsize))
        part = F.col("__batch").alias("partition_id")
    else:
        part = F.spark_partition_id().alias("partition_id")
    group = [part]
    if schema_col and schema_col in df.columns:
        group.append(F.col(schema_col).alias("schema"))
    else:
        group.append(F.lit(schema_name or "events").alias("schema"))
    return (
        df.groupBy(*group)
        .agg(F.count(F.lit(1)).alias("events"))
        .withColumn("timestamp", F.current_timestamp())
    )
