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


def test_tql_zeek_tsv_and_yaml_sinks(spark, tmp_path):
    """`write zeek-tsv | save f` and `to f.yaml` round-trip through the
    native printers (zeek_tsv.cpp / yaml.cpp print sides)."""
    import json

    src = tmp_path / "rows.json"
    src.write_text('{"name": "a", "n": 1}\n{"name": "b", "n": 2}\n')
    zout = tmp_path / "out.log"
    exec_pipeline(f"from {src} read json | sort name"
                  f" | write zeek-tsv | save {zout}", spark=spark)
    from tenzir_spark.sources.formats import read_zeek_tsv
    back = read_zeek_tsv(spark, str(zout))
    assert sorted((r["name"], r["n"]) for r in back.collect()) == \
        [("a", 1), ("b", 2)]
    yout = tmp_path / "out.yaml"
    exec_pipeline(f"from {src} read json | where n == 2 | to {yout}",
                  spark=spark)
    text = yout.read_text()
    assert "name: b" in text and "n: 2" in text


def test_tql_pcap_sink_round_trip(spark, tmp_path):
    """`read pcap -e | write pcap` reproduces the trace byte-for-byte
    through the TQL string surface (tests.yaml:1058-1063)."""
    import gzip
    import os

    out = tmp_path / "round.pcap"
    exec_pipeline(f"from {FIX}/example.pcap.gz read pcap -e"
                  f" | write pcap | save {out}", spark=spark)
    orig = gzip.open(os.path.join(FIX, "example.pcap.gz"), "rb").read()
    assert out.read_bytes() == orig


def test_tql_url_source(spark):
    """`from <url> [read fmt]` routes through the curl connector's
    driver fetch; format inference uses the URL's extension, not the
    spool path (file:// exercises the identical urllib path)."""
    df = exec_pipeline(
        "from file:///root/repo/fixtures/eve.json"
        ' | where event_type == "dns" | select src_ip', spark=spark)
    assert df.count() == 2
    df2 = exec_pipeline(
        "from file:///root/repo/fixtures/events.cef read cef"
        " | select device_vendor | sort device_vendor"
        " | head 1 --order-by device_vendor", spark=spark)
    assert df2.collect()[0][0] == "acme"


def test_tql_shell_failure_raises(spark):
    import pytest

    with pytest.raises(RuntimeError, match="exited"):
        parse_pipeline('shell "false" | read json', spark=spark)
