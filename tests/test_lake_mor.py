"""Merge-on-read mode: same semantics as CoW, different physics."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from tenzir_spark.lake import LakeTable

SCHEMA = T.StructType([
    T.StructField("url", T.StringType(), False),
    T.StructField("v", T.LongType(), True),
])


@pytest.fixture()
def table(spark, tmp_path):
    return LakeTable.create(spark, str(tmp_path / "t"), SCHEMA, "url",
                            num_buckets=4, write_mode="mor")


def _merge(table, spark, rows, epoch):
    df = spark.createDataFrame(rows, "url string, op string, lsn long, v long")
    return table.merge(df, epoch)


def test_mor_insert_update_delete(table, spark):
    _merge(table, spark, [("a", "insert", 1, 10), ("b", "insert", 2, 20)], 0)
    _merge(table, spark, [("a", "update", 3, 11), ("c", "insert", 4, 30),
                          ("b", "delete", 5, None)], 1)
    got = {r.url: r.v for r in table.read().collect()}
    assert got == {"a": 11, "c": 30}


def test_mor_merge_appends_only(table, spark):
    _merge(table, spark, [(f"u{i}", "insert", i, i) for i in range(40)], 0)
    files_e0 = {f.path for f in table.snapshot.files}
    _merge(table, spark, [("u1", "update", 100, 999)], 1)
    files_e1 = {f.path for f in table.snapshot.files}
    assert files_e0 <= files_e1  # nothing rewritten — pure append
    assert all(f.kind == "delta" for f in table.snapshot.files)
    assert table.read().filter("url = 'u1'").collect()[0].v == 999


def test_mor_idempotent_replay(table, spark):
    _merge(table, spark, [("a", "insert", 1, 10)], 0)
    out = _merge(table, spark, [("a", "update", 9, 99)], 0)
    assert out.get("skipped") is True
    assert {r.url: r.v for r in table.read().collect()} == {"a": 10}


def test_mor_compaction_preserves_state(table, spark):
    _merge(table, spark, [("a", "insert", 1, 10), ("b", "insert", 2, 20)], 0)
    _merge(table, spark, [("a", "update", 3, 11), ("b", "delete", 4, None),
                          ("c", "insert", 5, 30)], 1)
    before = {r.url: r.v for r in table.read().collect()}
    table.compact()
    after = {r.url: r.v for r in table.read().collect()}
    assert before == after == {"a": 11, "c": 30}
    assert all(f.kind == "base" for f in table.snapshot.files)
    # post-compaction read takes the no-shuffle fast path and stays correct
    _merge(table, spark, [("a", "update", 6, 12)], 2)
    assert {r.url: r.v for r in table.read().collect()} == {"a": 12, "c": 30}


def test_mor_compact_single_delta_is_metadata_only(table, spark):
    """r6: a bucket holding ONE delta (one applied batch — per-key
    unique by the merge contract) is compacted by re-tagging the file
    base, not by rewriting it: same paths on disk, identical reads, and
    a later merge + compact still resolves through the promoted base."""
    rows0 = [(f"u{i}", "insert", i + 1, i) for i in range(16)]
    rows0.append(("gone", "delete", 99, None))  # tombstone rides the retag
    _merge(table, spark, rows0, 0)
    paths0 = {f.path for f in table.snapshot.files}
    before = {r.url: r.v for r in table.read().collect()}
    assert "gone" not in before
    table.compact()
    assert {f.path for f in table.snapshot.files} == paths0  # no rewrite
    assert all(f.kind == "base" for f in table.snapshot.files)
    assert {r.url: r.v for r in table.read().collect()} == before
    _merge(table, spark, [("u1", "update", 100, 999),
                          ("u2", "delete", 101, None)], 1)
    table.compact()  # promoted base + new delta -> rewrite path
    got = {r.url: r.v for r in table.read().collect()}
    assert got["u1"] == 999 and "u2" not in got and len(got) == 15
    assert all(f.kind == "base" for f in table.snapshot.files)


def test_mor_watermark_from_footers(table, spark):
    entry = _merge(table, spark, [("a", "insert", 41, 1), ("b", "insert", 77, 2)], 0)
    assert entry["lsn_watermark"] == 77
    assert entry["rows_applied"] == 2


def test_mor_schema_evolution(table, spark):
    _merge(table, spark, [("a", "insert", 1, 10)], 0)
    table.alter([{"op": "add", "name": "tags", "type": "string"}])
    df = spark.createDataFrame([("b", "insert", 2, 20, "x")],
                               "url string, op string, lsn long, v long, tags string")
    table.merge(df, 1)
    got = {r.url: (r.v, r.tags) for r in table.read().collect()}
    assert got == {"a": (10, None), "b": (20, "x")}
