"""Structured-Streaming layer: follow source, windowed summarize,
streaming CDC apply with exactly-once foreachBatch."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from tenzir_spark import streaming
from tenzir_spark.cdc import gen_change_log, pages_schema
from tenzir_spark.lake import LakeTable


def test_windowed_summarize_stream(spark, tmp_path):
    src = str(tmp_path / "src")
    ev = spark.range(100).select(
        F.timestamp_seconds(F.lit(1700000000) + F.col("id") * 60).alias("ts"),
        (F.col("id") % 4).alias("k"),
        F.col("id").cast("double").alias("value"),
    )
    ev.write.parquet(src)
    stream = streaming.follow_parquet(spark, src, ev.schema)
    agg = streaming.windowed_summarize(
        stream, "ts", "30 minutes", {"n": "count(.)", "total": "sum(value)"}, by=["k"])
    q = (agg.writeStream.outputMode("complete").format("memory")
         .queryName("winout").start())
    try:
        q.processAllAvailable()
        out = spark.sql("select * from winout").collect()
    finally:
        q.stop()
    # 100 minutes of data in 30-min windows x 4 keys
    assert sum(r.n for r in out) == 100
    assert all(len(r.window) == 2 for r in out)


def test_stream_cdc_apply_exactly_once(spark, tmp_path):
    log_dir = str(tmp_path / "log")
    lake_dir = str(tmp_path / "lake")
    cp_dir = str(tmp_path / "cp")
    log = gen_change_log(spark, 2000, events_per_epoch=500, seed=11)
    log.write.parquet(log_dir)

    table = LakeTable.create(spark, lake_dir, pages_schema(), "url",
                             num_buckets=4, write_mode="mor")
    stream = spark.readStream.schema(
        spark.read.parquet(log_dir).schema).parquet(log_dir)
    q = streaming.stream_cdc_apply(stream, table, cp_dir)
    q.awaitTermination(120)

    table.refresh()
    n = table.read().count()
    assert n > 0
    # restart with same checkpoint: no new data -> no state change
    v = table.snapshot.version
    stream2 = spark.readStream.schema(
        spark.read.parquet(log_dir).schema).parquet(log_dir)
    q2 = streaming.stream_cdc_apply(stream2, table, cp_dir)
    q2.awaitTermination(60)
    table.refresh()
    assert table.read().count() == n
