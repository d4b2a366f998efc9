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


def test_stream_sessionize_state_across_batches(spark, tmp_path):
    """applyInPandasWithState carries per-key session state across
    micro-batches: two files processed one-per-trigger must yield the
    same counts as a batch sessionization."""
    import datetime as dt

    src = tmp_path / "sess_src"
    src.mkdir()
    schema = T.StructType([T.StructField("user_id", T.LongType()),
                           T.StructField("ts", T.TimestampType())])
    t0 = dt.datetime(2024, 1, 1, 0, 0, 0)

    def mk(rows, name):
        spark.createDataFrame(rows, schema).coalesce(1) \
            .write.mode("overwrite").parquet(str(src / name))

    # user 1: events at 0s, 10s | batch 2: 20s (same session), 1h (new)
    # user 2: one event per batch, 2h apart -> 2 sessions
    spark.createDataFrame(
        [(1, t0), (1, t0 + dt.timedelta(seconds=10)), (2, t0)], schema
    ).coalesce(1).write.mode("append").parquet(str(src))
    spark.createDataFrame(
        [(1, t0 + dt.timedelta(seconds=20)), (1, t0 + dt.timedelta(hours=1)),
         (2, t0 + dt.timedelta(hours=2))], schema
    ).coalesce(1).write.mode("append").parquet(str(src))

    stream = (spark.readStream.schema(schema)
              .option("maxFilesPerTrigger", "1").parquet(str(src)))
    out = streaming.stream_sessionize(stream, "user_id", "ts", gap_seconds=1800)
    q = (out.writeStream.format("memory").queryName("sess_out")
         .outputMode("update").trigger(availableNow=True).start())
    q.awaitTermination(120)
    rows = spark.sql(
        "SELECT user_id, max(n_sessions) AS ns, max(n_events) AS ne "
        "FROM sess_out GROUP BY user_id").collect()
    got = {r.user_id: (r.ns, r.ne) for r in rows}
    assert got[1] == (2, 4)  # 0s/10s/20s one session, 1h later a second
    assert got[2] == (2, 2)


def test_stream_deduplicate_within_watermark(spark, tmp_path):
    import datetime as dt

    src = tmp_path / "dd_src"
    schema = T.StructType([T.StructField("k", T.StringType()),
                           T.StructField("ts", T.TimestampType())])
    t0 = dt.datetime(2024, 1, 1, 0, 0, 0)
    spark.createDataFrame(
        [("a", t0), ("a", t0 + dt.timedelta(seconds=5)),   # dup within window
         ("b", t0), ("a", t0 + dt.timedelta(seconds=9))],  # another dup
        schema).coalesce(1).write.mode("append").parquet(str(src))
    stream = spark.readStream.schema(schema).parquet(str(src))
    out = streaming.stream_deduplicate(stream, ["k"], "ts", delay="1 minute")
    q = (out.writeStream.format("memory").queryName("dd_out")
         .outputMode("append").trigger(availableNow=True).start())
    q.awaitTermination(120)
    rows = spark.sql("SELECT k FROM dd_out").collect()
    assert sorted(r.k for r in rows) == ["a", "b"]
