"""TQL wiring for pcap/decapsulate/shell/local-remote
(tests.yaml pcap-format steps as golden shapes)."""

import os

from pyspark.sql import functions as F

from tenzir_spark.plans.tql import exec_pipeline, parse_pipeline

FIX = os.path.abspath(os.path.join(os.path.dirname(__file__), "..", "fixtures"))


def test_tql_read_pcap_decapsulate(spark):
    df = exec_pipeline(
        f"from {FIX}/example.pcap.gz read pcap | decapsulate", spark=spark)
    assert df.count() == 1000
    first = df.select("community_id").limit(1).collect()[0][0]
    assert first == "1:Qk7Gm4iQRNO1aS3Yt98NgELpTuM="


def test_tql_pcap_format_inferred(spark):
    df = exec_pipeline(f"from {FIX}/vlan-double-tagging.pcap", spark=spark)
    assert df.count() == 6


def test_tql_shell_source(spark):
    """tests.yaml:1064-1066: `shell "cat vlan-*.pcap" | read pcap -e` —
    concatenated traces resequence file header and packet events."""
    df = exec_pipeline(
        f'shell "cat {FIX}/vlan-double-tagging.pcap '
        f'{FIX}/vlan-single-tagging.pcap" | read pcap -e', spark=spark)
    counts = dict(df.groupBy("_schema").count().collect())
    assert counts == {"pcap.file_header": 2, "pcap.packet": 11}


def test_tql_shell_transform_position(spark, tmp_path):
    """`load f | shell <cmd> | read json`: upstream bytes become the
    child's stdin (shell.cpp transformation position)."""
    p = tmp_path / "rows.json"
    p.write_text('{"a": 1}\n{"a": 2}\n{"a": 3}\n')
    df = exec_pipeline(
        f"load {p} | shell \"grep -v '2'\" | read json", spark=spark)
    assert sorted(r["a"] for r in df.collect()) == [1, 3]


def test_tql_local_remote_modifiers(spark, tmp_path):
    p = tmp_path / "rows.json"
    p.write_text('{"a": 1}\n{"a": 2}\n')
    df = exec_pipeline(
        f"from {p} read json | local where a > 1 | remote select a",
        spark=spark)
    assert [r["a"] for r in df.collect()] == [2]


def test_tql_shell_failure_raises(spark):
    import pytest

    with pytest.raises(RuntimeError, match="exited"):
        parse_pipeline('shell "false" | read json', spark=spark)
