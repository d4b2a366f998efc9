"""Lake format unit tests: snapshots, merge, schema evolution, ledger."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F
from pyspark.sql import types as T

from tenzir_spark.lake import LakeTable
from tenzir_spark.lake.format import latest_snapshot

SCHEMA = T.StructType([
    T.StructField("url", T.StringType(), False),
    T.StructField("v", T.LongType(), True),
])


@pytest.fixture()
def table(spark, tmp_path):
    return LakeTable.create(spark, str(tmp_path / "t"), SCHEMA, "url", num_buckets=4)


def _merge(table, spark, rows, epoch):
    df = spark.createDataFrame(rows, "url string, op string, lsn long, v long")
    return table.merge(df, epoch)


def test_append_and_read(table, spark):
    df = spark.createDataFrame([("a", 1), ("b", 2)], SCHEMA)
    table.append(df)
    got = {r.url: r.v for r in table.read().collect()}
    assert got == {"a": 1, "b": 2}
    assert table.row_count() == 2


def test_merge_insert_update_delete(table, spark):
    _merge(table, spark, [("a", "insert", 1, 10), ("b", "insert", 2, 20)], 0)
    _merge(table, spark, [("a", "update", 3, 11), ("c", "insert", 4, 30),
                          ("b", "delete", 5, None)], 1)
    got = {r.url: r.v for r in table.read().collect()}
    assert got == {"a": 11, "c": 30}


def test_merge_is_idempotent(table, spark):
    _merge(table, spark, [("a", "insert", 1, 10)], 0)
    v1 = table.snapshot.version
    out = _merge(table, spark, [("a", "update", 9, 99)], 0)  # replay of epoch 0
    assert out.get("skipped") is True
    assert table.snapshot.version == v1
    got = {r.url: r.v for r in table.read().collect()}
    assert got == {"a": 10}


def test_copy_on_write_only_touched_buckets(table, spark):
    _merge(table, spark, [(f"u{i}", "insert", i, i) for i in range(40)], 0)
    files_before = {f.path: f.bucket for f in table.snapshot.files}
    _merge(table, spark, [("u1", "update", 100, 999)], 1)
    files_after = {f.path: f.bucket for f in table.snapshot.files}
    from tenzir_spark.lake.format import bucket_expr
    touched = spark.range(1).select(
        F.pmod(F.xxhash64(F.lit("u1")), F.lit(4)).cast("int")).collect()[0][0]
    # untouched buckets keep the same physical files
    for path, b in files_before.items():
        if b != touched:
            assert path in files_after
    assert any(p not in files_before for p in files_after)


def test_schema_evolution_add_rename_widen(table, spark):
    _merge(table, spark, [("a", "insert", 1, 10)], 0)
    table.alter([
        {"op": "add", "name": "tags", "type": "string"},
        {"op": "rename", "from": "v", "to": "val"},
    ])
    got = table.read().collect()[0]
    assert got.val == 10 and got.tags is None
    # new write with evolved schema merges with old files
    df = spark.createDataFrame([("b", "insert", 2, 20, "hot")],
                               "url string, op string, lsn long, val long, tags string")
    table.merge(df, 1)
    got = {r.url: (r.val, r.tags) for r in table.read().collect()}
    assert got == {"a": (10, None), "b": (20, "hot")}
    # idempotent re-apply of same alter ops
    v = table.snapshot.version
    table.alter([{"op": "add", "name": "tags", "type": "string"}])
    assert table.snapshot.version == v


def test_stats_pruning(table, spark):
    _merge(table, spark, [(f"u{i:03d}", "insert", i, i) for i in range(100)], 0)
    pruned = table.read(key_range=("u000", "u000"))
    full = table.read()
    assert {r.url for r in pruned.collect()} >= {"u000"}
    # pruning reads fewer files than the full scan unless all keys collide
    assert len(pruned.inputFiles()) <= len(full.inputFiles())


def test_checkpoint_lineage(table, spark):
    _merge(table, spark, [("a", "insert", 7, 1), ("b", "insert", 8, 2)], 3)
    cp = table.checkpoints().collect()
    assert all(r.checkpoint_epoch == 3 for r in cp)
    assert sum(r.rows_applied for r in cp) >= 2
    assert all(r.lsn_watermark == 8 for r in cp)


def test_compact(table, spark):
    for e in range(3):
        _merge(table, spark, [(f"k{e}_{i}", "insert", e * 10 + i, i) for i in range(5)], e)
    before = len(table.snapshot.files)
    table.compact()
    after = len(table.snapshot.files)
    assert after <= before
    assert table.read().count() == 15
