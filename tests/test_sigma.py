"""Sigma rule compiler tests (semantics per the public Sigma spec;
reference behavior: plugins/sigma)."""

from __future__ import annotations

import pytest
from pyspark.sql import Row

from tenzir_spark.functions.sigma import compile_rule, sigma
from tenzir_spark.plans.registry import register_alias, get_alias, show

RULE = """
title: Suspicious PowerShell Download
id: 11111111-2222-3333-4444-555555555555
level: high
detection:
  selection_img:
    Image|endswith: '\\powershell.exe'
  selection_cmd:
    CommandLine|contains:
      - 'DownloadString'
      - 'Invoke-WebRequest'
  filter:
    User: 'SYSTEM'
  condition: selection_img and selection_cmd and not filter
"""


@pytest.fixture(scope="module")
def events(spark):
    rows = [
        Row(Image=r"C:\Windows\powershell.exe", CommandLine="IEX (New-Object Net.WebClient).DownloadString('http://x')", User="alice"),
        Row(Image=r"C:\Windows\powershell.exe", CommandLine="Get-ChildItem", User="bob"),
        Row(Image=r"C:\Windows\cmd.exe", CommandLine="DownloadString", User="carol"),
        Row(Image=r"C:\Windows\powershell.exe", CommandLine="Invoke-WebRequest http://y", User="SYSTEM"),
    ]
    return spark.createDataFrame(rows)


def test_rule_matches(events):
    pred, meta = compile_rule(RULE, events)
    got = [r.User for r in events.filter(pred).collect()]
    assert got == ["alice"]  # bob: no cmd match; carol: wrong image; SYSTEM: filtered
    assert meta["level"] == "high"


def test_sigma_operator_wraps(events):
    out = sigma(events, RULE)
    rows = out.collect()
    assert len(rows) == 1
    assert rows[0].rule.title == "Suspicious PowerShell Download"
    assert rows[0].event.User == "alice"


def test_case_insensitive_default(spark):
    df = spark.createDataFrame([Row(Image="POWERSHELL.EXE x")])
    pred, _ = compile_rule(
        {"detection": {"sel": {"Image|contains": "powershell"}, "condition": "sel"}}, df)
    assert df.filter(pred).count() == 1


def test_wildcards_and_lists(spark):
    df = spark.createDataFrame([Row(path="/usr/bin/curl"), Row(path="/opt/wget")])
    rule = {"detection": {
        "sel": {"path": ["*curl", "*wget*"]},
        "condition": "1 of them"}}
    pred, _ = compile_rule(rule, df)
    assert df.filter(pred).count() == 2


def test_nested_field_suffix(spark):
    df = spark.createDataFrame([Row(proc=Row(Image="a\\powershell.exe")),
                                Row(proc=Row(Image="b\\cmd.exe"))])
    pred, _ = compile_rule(
        {"detection": {"s": {"Image|endswith": "powershell.exe"}, "condition": "s"}}, df)
    assert df.filter(pred).count() == 1


def test_alias_registry(spark):
    from tenzir_spark import operators as ops
    register_alias("top_users", lambda df, n=3: ops.top(df, "User", limit=n))
    df = spark.createDataFrame([Row(User="a"), Row(User="a"), Row(User="b")])
    out = get_alias("top_users")(df, 1).collect()
    assert out[0].User == "a"
    assert "top_users" in [r[0] for r in show(spark, "aliases").collect()]


def test_show_aspects(spark):
    ops_list = [r[0] for r in show(spark, "operators").collect()]
    assert "summarize" in ops_list and "deduplicate" in ops_list
    with pytest.raises(ValueError):
        show(spark, "nope")


def test_show_aspects_cover_reference_set(spark):
    """The reference ships 11 aspect files (libtenzir/builtins/aspects/);
    every one has a counterpart here (fields/partitions take an object)."""
    for aspect in ("operators", "formats", "connectors",
                   "aggregation-functions", "functions", "aliases",
                   "version", "build", "dependencies", "config",
                   "plugins", "types"):
        df = show(spark, aspect)
        assert df.count() > 0 or aspect == "aliases", aspect
    import pytest as _pytest
    with _pytest.raises(ValueError, match="unknown aspect"):
        show(spark, "nonsense")


def test_show_fields_and_partitions(spark, tmp_path):
    from pyspark.sql import types as T
    from tenzir_spark.lake import LakeTable
    from tenzir_spark.plans.registry import show_fields, show_partitions

    df = spark.createDataFrame([(1, ("a", 2.0))], "id long, rec struct<s:string,d:double>")
    fields = {r.field: r.type for r in show_fields(df).collect()}
    assert fields == {"id": "bigint", "rec.s": "string", "rec.d": "double"}

    schema = T.StructType([T.StructField("k", T.StringType(), False),
                           T.StructField("v", T.LongType(), True)])
    t = LakeTable.create(spark, str(tmp_path / "pt"), schema, "k", num_buckets=2)
    t.append(spark.createDataFrame([("a", 1), ("b", 2)], schema))
    parts = show_partitions(t).collect()
    assert sum(r.rows for r in parts) == 2
    assert all(r.kind == "base" for r in parts)


def test_tql_show_source(spark):
    from tenzir_spark import exec_pipeline
    out = exec_pipeline("show formats | where formats ni 'zeek' | sort formats", spark=spark)
    got = [r.formats for r in out.collect()]
    assert "zeek-json" in got and "zeek-tsv" in got
