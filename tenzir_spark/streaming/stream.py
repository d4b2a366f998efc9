"""Structured-Streaming layer.

The reference is a continuous engine with demand-driven pull
(execution_node.cpp:36-76) but no watermarks/windows at this snapshot
(SURVEY §2.6). Here the streaming surface is Spark-native:

- follow-file sources (``file ... --follow`` ≅ readStream on a directory)
- windowed aggregation with watermarks (superset of the reference's
  ``summarize ... resolution``)
- the CDC tail as a stream: foreachBatch(CdcEngine.apply_epoch) gives the
  exactly-once lake sink (micro-batch id = checkpoint epoch).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T


def follow_parquet(spark: SparkSession, path: str, schema: T.StructType) -> DataFrame:
    """Streaming read of a growing directory of parquet files (the
    reference's ``load file --follow``, file.cpp:233)."""
    return spark.readStream.schema(schema).parquet(path)


def follow_json(spark: SparkSession, path: str, schema: T.StructType) -> DataFrame:
    return spark.readStream.schema(schema).json(path)


def windowed_summarize(
    stream: DataFrame,
    time_col: str,
    window: str,
    aggs: dict[str, str],
    by: list[str] | None = None,
    watermark: str = "10 minutes",
    slide: str | None = None,
) -> DataFrame:
    """Event-time tumbling/sliding aggregation with late-data handling —
    ``summarize ... resolution <dur>`` (summarize.cpp:41-95) upgraded
    with watermarks the reference lacks.

    aggs: {out_name: "func(col)"} using the summarize registry.
    """
    from tenzir_spark.operators.aggregate import _agg_column

    keys = [F.window(F.col(time_col), window, slide) if slide
            else F.window(F.col(time_col), window)]
    keys += [F.col(c) for c in (by or [])]
    agg_cols = [_agg_column(f"{name}={spec}") for name, spec in aggs.items()]
    return (
        stream.withWatermark(time_col, watermark)
        .groupBy(*keys)
        .agg(*agg_cols)
    )


def stream_cdc_apply(
    stream: DataFrame,
    table,
    checkpoint_dir: str,
    n_salts: int = 16,
    trigger_seconds: int | None = None,
):
    """Continuous CDC tail -> lake: each micro-batch is applied through
    the engine under the epoch ledger keyed by the micro-batch id.

    Exactly-once: Spark guarantees monotone batch ids per checkpoint dir
    and replays the last uncommitted batch on restart; the lake ledger
    makes the replayed apply a no-op — idempotence composes end-to-end.
    """
    from tenzir_spark.cdc.engine import CdcEngine

    spark = stream.sparkSession
    engine = CdcEngine(spark, table, n_salts=n_salts)

    def apply_batch(batch_df: DataFrame, batch_id: int):
        batch_df = batch_df.withColumn("epoch", F.lit(int(batch_id)).cast("int"))
        engine.apply_epoch(batch_df, int(batch_id))

    writer = (stream.writeStream.foreachBatch(apply_batch)
              .option("checkpointLocation", checkpoint_dir)
              .outputMode("update"))
    if trigger_seconds:
        writer = writer.trigger(processingTime=f"{trigger_seconds} seconds")
    else:
        writer = writer.trigger(availableNow=True)
    return writer.start()
