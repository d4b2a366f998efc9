"""Operator semantics tests (model: reference integration tests,
tenzir/integration/tests.yaml:851-941 sort/select/head/summarize cases)."""

from __future__ import annotations

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from tenzir_spark import operators as ops


@pytest.fixture(scope="module")
def mini(spark):
    rows = [
        Row(ts=1, schema="conn", proto="tcp", bytes=10, nested=Row(a=1, b="x")),
        Row(ts=2, schema="conn", proto="udp", bytes=None, nested=Row(a=2, b="y")),
        Row(ts=3, schema="dns", proto="udp", bytes=30, nested=Row(a=3, b="z")),
        Row(ts=4, schema="dns", proto="udp", bytes=30, nested=Row(a=3, b="z")),
        Row(ts=5, schema="conn", proto="tcp", bytes=50, nested=Row(a=5, b="w")),
    ]
    return spark.createDataFrame(rows)


def test_where(mini):
    assert ops.where(mini, 'proto == "tcp"').count() == 2


def test_select_nested_suffix(mini):
    out = ops.select(mini, "ts", "a")
    assert out.columns == ["ts", "nested"]
    assert out.schema["nested"].dataType.fieldNames() == ["a"]


def test_drop(mini):
    out = ops.drop(mini, "b", "proto")
    assert out.columns == ["ts", "schema", "bytes", "nested"]
    assert out.schema["nested"].dataType.fieldNames() == ["a"]


def test_put(mini):
    out = ops.put(mini, t="ts", double_bytes=F.col("bytes") * 2)
    assert out.columns == ["t", "double_bytes"]
    assert out.filter("t == 5").collect()[0].double_bytes == 100


def test_extend_replace_rename(mini):
    out = ops.extend(mini, kb=F.col("bytes") / 1024)
    assert "kb" in out.columns
    with pytest.raises(ValueError):
        ops.extend(mini, ts=F.lit(0))
    out2 = ops.replace(mini, bytes=F.lit(0))
    assert out2.agg(F.sum("bytes")).collect()[0][0] == 0
    out3 = ops.rename(mini, time="ts")
    assert "time" in out3.columns and "ts" not in out3.columns


def test_head_tail(mini):
    assert [r.ts for r in ops.head(mini, 2, order_by="ts").collect()] == [1, 2]
    assert [r.ts for r in ops.tail(mini, 2, order_by="ts").collect()] == [4, 5]


def test_taste(mini):
    out = ops.taste(mini, 1, schema_col="schema", order_by="ts")
    assert sorted(r.ts for r in out.collect()) == [1, 3]


def test_unique_adjacent(mini):
    out = ops.unique(mini, order_by="ts")
    # rows 3 and 4 are identical except ts → not adjacent-duplicates
    assert out.count() == 5
    dup = mini.drop("ts")
    out2 = ops.unique(dup.orderBy("schema"), order_by=F.col("schema"))
    assert out2.count() < dup.count() or dup.distinct().count() == dup.count()


def test_deduplicate_max_lsn(spark):
    rows = [
        Row(url="a", lsn=1, v="a1"), Row(url="a", lsn=3, v="a3"),
        Row(url="a", lsn=2, v="a2"), Row(url="b", lsn=7, v="b7"),
    ]
    df = spark.createDataFrame(rows)
    out = {r.url: r.v for r in ops.deduplicate(df, "url", "lsn").collect()}
    assert out == {"a": "a3", "b": "b7"}


def test_summarize(mini):
    out = ops.summarize(mini, ["total=sum(bytes)", "n=count(.)"], by=["proto"])
    got = {r.proto: (r.total, r.n) for r in out.collect()}
    assert got == {"tcp": (60, 2), "udp": (60, 3)}


def test_summarize_no_keys(mini):
    out = ops.summarize(mini, ["n=count(.)", "d=count_distinct(proto)"])
    row = out.collect()[0]
    assert row.n == 5 and row.d == 2


def test_summarize_distinct_sorted(mini):
    out = ops.summarize(mini, ["protos=distinct(proto)"])
    assert out.collect()[0].protos == ["tcp", "udp"]


def test_sort_nulls(mini):
    asc = ops.sort(mini, "bytes").collect()
    assert asc[-1].bytes is None  # nulls last on ascending
    desc = ops.sort(mini, "bytes", ascending=False).collect()
    assert desc[0].bytes is None  # nulls first on descending


def test_top_rare(mini):
    t = ops.top(mini, "proto").collect()
    assert (t[0].proto, t[0]["count"]) == ("udp", 3)
    r = ops.rare(mini, "proto").collect()
    assert (r[0].proto, r[0]["count"]) == ("tcp", 2)


def test_flatten_unflatten(mini):
    flat = ops.flatten(mini)
    assert "nested.a" in flat.columns
    back = ops.unflatten(flat)
    assert "nested" in back.columns
    assert back.select("nested.a").collect()[0][0] == 1


def test_enumerate(mini):
    out = ops.enumerate_rows(mini, order_by="ts")
    assert [r.idx for r in out.orderBy("ts").collect()] == [0, 1, 2, 3, 4]
    per = ops.enumerate_rows(mini, order_by="ts", per_schema_col="schema")
    got = {(r.schema, r.ts): r.idx for r in per.collect()}
    assert got[("conn", 1)] == 0 and got[("dns", 3)] == 0 and got[("conn", 5)] == 2


def test_hash(mini):
    out = ops.hash_column(mini, "proto")
    row = out.filter("proto = 'tcp'").select("proto_hashed").collect()[0]
    import hashlib
    assert row.proto_hashed == hashlib.sha256(b"tcp").hexdigest()


def test_repeat(mini):
    assert ops.repeat(mini, 3).count() == 15


def test_measure(mini):
    m = ops.measure(mini, schema_col="schema")
    total = m.agg(F.sum("events")).collect()[0][0]
    assert total == 5


def test_select_drop_type_extractors(spark):
    from pyspark.sql import Row
    df = spark.createDataFrame([Row(a="x", n=1, t=2.5, b="y")])
    out = ops.select(df, ":string")
    assert out.columns == ["a", "b"]
    out2 = ops.drop(df, ":string")
    assert out2.columns == ["n", "t"]


def test_driver_contract_parity():
    """Every queries() entry must carry an oracle_sql() entry (the no-
    oracle driver path records a weaker check — never regress into it)."""
    import __spark_entry__ as e
    q, o = set(e.queries()), set(e.oracle_sql())
    assert q == o, f"missing oracles: {sorted(q - o)}; orphans: {sorted(o - q)}"


def test_select_schema_carry_contract(spark):
    """_schema rides through select implicitly (marked, so printers
    strip it) — but selecting it EXPLICITLY makes it data: no mark, and
    the ndjson printer keeps the column."""
    from pyspark.sql import Row as R
    from tenzir_spark.sources import formats as fmt
    df = spark.createDataFrame(
        [R(_schema="suricata.alert", x=1), R(_schema="suricata.flow", x=2)])
    implicit = ops.select(df, "x")
    assert sorted(implicit.columns) == ["_schema", "x"]
    assert implicit.__dict__.get("_tenzir_schema_carried") is True
    lines = sorted(r["value"] for r in fmt.ndjson_lines(implicit).collect())
    assert lines == ['{"x":1}', '{"x":2}']
    explicit = ops.select(df, "_schema", "x")
    assert explicit.__dict__.get("_tenzir_schema_carried") is None
    lines = sorted(r["value"] for r in fmt.ndjson_lines(explicit).collect())
    assert lines == ['{"_schema":"suricata.alert","x":1}',
                     '{"_schema":"suricata.flow","x":2}']
