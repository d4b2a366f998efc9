"""Format parser tests against hand-built fixtures (model: the
reference's parser unit tests + golden files,
tenzir/integration/reference/)."""

from __future__ import annotations

import gzip
import os

import pytest

from tenzir_spark.sources import formats


@pytest.fixture(scope="module")
def fixtures(tmp_path_factory):
    d = tmp_path_factory.mktemp("fmt")

    (d / "eve.json").write_text(
        '{"timestamp":"2024-01-01T00:00:00Z","event_type":"flow","src_ip":"10.0.0.1","flow":{"pkts_toserver":5}}\n'
        '{"timestamp":"2024-01-01T00:00:01Z","event_type":"dns","src_ip":"10.0.0.2","dns":{"rrname":"example.com"}}\n'
    )

    (d / "conn.log").write_text(
        "#separator \\x09\n"
        "#set_separator\t,\n"
        "#empty_field\t(empty)\n"
        "#unset_field\t-\n"
        "#path\tconn\n"
        "#fields\tts\tuid\tid.orig_h\tid.orig_p\tproto\tduration\n"
        "#types\ttime\tstring\taddr\tport\tenum\tinterval\n"
        "1704067200.5\tC1\t10.0.0.1\t1234\ttcp\t0.25\n"
        "1704067201.0\tC2\t-\t80\tudp\t-\n"
    )

    (d / "events.cef").write_text(
        "CEF:0|security|threatmanager|1.0|100|worm stopped|10|src=10.0.0.1 dst=2.1.2.2 spt=1232\n"
        "CEF:0|vendor|product|2.0|200|name with space|5|msg=hello world act=blocked\n"
    )

    (d / "data.csv").write_text("a,b,c\n1,x,-\n2,y,3\n")
    (d / "lines.txt").write_text("alpha\n\nbeta\n")
    return str(d)


def test_suricata_selector(spark, fixtures):
    df = formats.read_suricata(spark, f"{fixtures}/eve.json")
    got = {r["_schema"] for r in df.select("_schema").collect()}
    assert got == {"suricata.flow", "suricata.dns"}


def test_zeek_tsv(spark, fixtures):
    df = formats.read_zeek_tsv(spark, f"{fixtures}/conn.log")
    rows = {r.uid: r for r in df.collect()}
    assert rows["C1"]["id.orig_h"] == "10.0.0.1"
    assert rows["C1"]["duration"] == 0.25
    assert rows["C2"]["id.orig_h"] is None  # unset_field '-'
    assert rows["C1"]["ts"].year == 2024  # epoch -> timestamp
    assert df.schema["id.orig_p"].dataType.simpleString() == "bigint"


def test_cef(spark, fixtures):
    df = formats.read_cef(spark, f"{fixtures}/events.cef")
    rows = df.orderBy("signature_id").collect()
    assert rows[0].device_vendor == "security"
    assert rows[0].extension["src"] == "10.0.0.1"
    assert rows[0].extension["spt"] == "1232"
    assert rows[1].name == "name with space"
    assert rows[1].extension["msg"] == "hello world"
    assert rows[1].extension["act"] == "blocked"


def test_csv_null_token(spark, fixtures):
    df = formats.read_csv(spark, f"{fixtures}/data.csv")
    rows = df.orderBy("a").collect()
    assert rows[0].c is None  # '-' null token
    assert rows[1].c == 3


def test_lines(spark, fixtures):
    df = formats.read_lines(spark, f"{fixtures}/lines.txt", skip_empty=True)
    assert [r.line for r in df.collect()] == ["alpha", "beta"]
    assert formats.read_lines(spark, f"{fixtures}/lines.txt").count() == 3


def test_zeek_tsv_null_bool_roundtrips_as_unset(spark, tmp_path):
    """NULL booleans must print as the unset token '-', not 'F'
    (round-2 advice #2), and round-trip back to null."""
    from tenzir_spark.sources.formats import read_zeek_tsv, write_zeek_tsv

    df = spark.createDataFrame(
        [("a", True), ("b", None), ("c", False)], "name string, ok boolean")
    path = str(tmp_path / "b.log")
    write_zeek_tsv(df, path)
    body = [l for l in open(path) if not l.startswith("#")]
    assert any(l.strip().endswith("-") for l in body), body
    back = {r["name"]: r["ok"] for r in read_zeek_tsv(spark, path).collect()}
    assert back == {"a": True, "b": None, "c": False}


def test_yaml_roundtrip(spark, tmp_path):
    """write_yaml emits a '---'-separated document stream that read_yaml
    parses back (reference formats/yaml.cpp print+parse)."""
    import json

    from pyspark.sql import functions as F
    from tenzir_spark.sources.formats import read_yaml, write_yaml

    df = spark.createDataFrame(
        [(1, "x", 1.5), (2, "multi\nline", None)], "id long, s string, v double")
    path = str(tmp_path / "out.yaml")
    write_yaml(df, path)
    back = read_yaml(spark, path)
    docs = sorted((r.asDict() for r in back.collect()),
                  key=lambda d: d["id"])
    assert docs[0] == {"id": 1, "s": "x", "v": 1.5}
    # nulls are omitted from the yaml document; inference backfills None
    assert docs[1] == {"id": 2, "s": "multi\nline", "v": None}


def test_assemble_parts_respects_fileio_seam(spark, tmp_path):
    """The single-stream printers must route every driver-side path
    operation through the FileIO seam so an object-store backend (with
    its own path semantics) can take over — no bare open()/os.listdir
    on the assembly path."""
    from tenzir_spark.lake.format import LocalFileIO
    from tenzir_spark.sources.formats import _assemble_parts

    calls = []

    class RecordingIO(LocalFileIO):
        def open_write(self, path):
            calls.append(("open_write", path))
            return super().open_write(path)

        def open_read(self, path):
            calls.append(("open_read", path))
            return super().open_read(path)

        def list(self, path):
            calls.append(("list", path))
            return super().list(path)

        def join(self, *parts):
            calls.append(("join", parts))
            return super().join(*parts)

        def delete_dir(self, path):
            calls.append(("delete_dir", path))
            return super().delete_dir(path)

    out = str(tmp_path / "one.txt")
    df = spark.range(5).selectExpr("CAST(id AS STRING) AS v")
    _assemble_parts(df, out, head=b"H\n", tail=b"T\n", io=RecordingIO())
    lines = open(out).read().splitlines()
    assert lines[0] == "H" and lines[-1] == "T"
    assert sorted(lines[1:-1]) == ["0", "1", "2", "3", "4"]
    ops = {c[0] for c in calls}
    assert {"open_write", "open_read", "list", "join", "delete_dir"} <= ops
    # the temporary parts dir is a sibling of the destination (shared
    # storage on a cluster), and it is cleaned up
    parts_dirs = [c[1] for c in calls if c[0] == "delete_dir"]
    assert parts_dirs and parts_dirs[0].startswith(out + ".parts-")
    import os
    assert not os.path.exists(parts_dirs[0])


def test_read_syslog_rfc5424(spark):
    """RFC 5424 reader over the reference's own integration capture
    (tenzir/integration/data/syslog/syslog.log) with the reference
    semantics (format/syslog.hpp header_parser; import-syslog goldens):
    facility=prival/8, severity=prival%8, '-' -> empty string fields /
    null timestamp, tz offsets normalize to UTC, BOM stripped from the
    message, priority-less lines route to syslog.unknown."""
    from tenzir_spark.sources.formats import read_syslog

    df = read_syslog(spark, "/root/repo/fixtures/syslog.log")
    rows = df.collect()
    assert len(rows) == 13
    by_schema = {}
    for r in rows:
        by_schema.setdefault(r["_schema"], []).append(r)
    assert len(by_schema["syslog.unknown"]) == 1
    assert by_schema["syslog.unknown"][0]["syslog_message"].startswith(
        "2003-10-11T22:14:15.003Z mymachineexamplecom")
    parsed = by_schema["syslog.rfc5424"]
    assert len(parsed) == 12

    # line 1: <34>8 ... su asd ID47 [exampleSDID@32473 ...] BOM'su root'...
    first = [r for r in parsed if r["process_id"] == "asd"][0]
    assert (first["facility"], first["severity"], first["version"]) == (4, 2, 8)
    assert first["hostname"] == "mymachineexamplecom"
    assert first["app_name"] == "su"
    assert first["message_id"] == "ID47"
    # escaped \] inside a param value (pattern from the reference data)
    assert first["structured_data"]["exampleSDID@32473"]["eventSource"] \
        == "App]lication"
    assert first["message"].startswith("BOM'su root' failed")
    assert str(first["ts"]).startswith("2003-10-11 22:14:15.003")

    # line 3: nil timestamp ('-') and nil msg_id; pid present
    nil_ts = [r for r in parsed if r["hostname"] == "192.0.2.1"][0]
    assert nil_ts["ts"] is None
    assert nil_ts["process_id"] == "8710"
    assert nil_ts["message_id"] == ""
    assert nil_ts["message"] == "%% It's time to make the do-nuts."

    # escaped \" and \\ in param values
    v4 = [r for r in parsed if r["structured_data"] and
          r["structured_data"].get("exampleSDID@32473", {}).get("iut") == "4"][0]
    assert v4["structured_data"]["exampleSDID@32473"]["eventSource"] \
        == 'Applic"ation'
    v5 = [r for r in parsed if r["structured_data"] and
          r["structured_data"].get("exampleSDID@32473", {}).get("iut") == "5"][0]
    assert v5["structured_data"]["exampleSDID@32473"]["eventSource"] \
        == "Applic\\ation"
    # two SD elements on one message; no trailing message content
    assert v5["structured_data"]["examplePriority@32473"]["class"] == "high"
    assert v5["message"] is None

    # tz-offset timestamps normalize to UTC (import-syslog/step_01.ref:
    # 19:37:57+01:00 -> 18:37:57)
    rsys = [r for r in parsed if r["app_name"] == "rsyslogd"][0]
    assert str(rsys["ts"]).startswith("2020-03-02 18:37:57.819")
    # nil SD: the bracketed text stays in the message
    assert rsys["message"].lstrip().startswith("[origin software=")

    # message preserves its leading space after the one separator
    # (step_01.ref: " no mapping for commit")
    gnome = [r for r in parsed if r["app_name"] == "gnome-software"][0]
    assert gnome["message"] == " no mapping for commit"
    assert (gnome["facility"], gnome["severity"]) == (1, 4)


def test_read_syslog_tql(spark):
    """`from <file> read syslog | where severity <= N` through TQL."""
    from tenzir_spark.plans.tql import parse_pipeline

    p = parse_pipeline(
        "from /root/repo/fixtures/syslog.log read syslog"
        " | where _schema == \"syslog.rfc5424\" && severity == 2"
        " | select hostname app_name", spark=spark)
    rows = p.df.collect()
    assert len(rows) == 2  # both <34> lines (severity 34%8=2)
    assert {r.app_name for r in rows} == {"su"}


def test_read_zeek_tsv_glob_of_same_schema_files(spark, tmp_path):
    """A glob / directory of same-schema zeek logs has one #separator
    PER FILE — that must stay on the distributed single-schema path
    (regression: the multi-block counter summed headers across files and
    routed to the driver-side block splitter, which open()s the literal
    glob string and fails)."""
    import shutil

    from tenzir_spark.sources.formats import read_zeek_tsv

    src = "/root/repo/fixtures/conn.log"
    shutil.copy(src, tmp_path / "conn.1.log")
    shutil.copy(src, tmp_path / "conn.2.log")
    one = read_zeek_tsv(spark, src)
    both = read_zeek_tsv(spark, str(tmp_path / "conn.*.log"))
    assert both.count() == 2 * one.count()
    assert both.schema == one.schema


def test_read_zeek_tsv_multi_block_without_path_gets_default(spark, tmp_path):
    """A later header block that lacks its own #path must get the
    default schema name, not inherit the previous block's #path."""
    from tenzir_spark.sources.formats import read_zeek_tsv

    blk1 = ("#separator \\x09\n#path\tconn\n#fields\tuid\n#types\tstring\n"
            "u1\nu2\n")
    blk2 = ("#separator \\x09\n#fields\tname\n#types\tstring\n"
            "n1\n")
    p = tmp_path / "merged.log"
    p.write_text(blk1 + blk2)
    df = read_zeek_tsv(spark, str(p))
    got = {r["_schema"]: r["count"] for r in
           df.groupBy("_schema").count().collect()}
    assert got == {"zeek.conn": 2, "zeek.tenzir": 1}


def test_read_zeek_tsv_multi_schema_stream(spark):
    """'Zeek TSV Pipeline Format' shape: one stream carrying several
    zeek logs (conn + dns header blocks): each block parses with its
    own #fields/#types and the frames unify with _schema = zeek.<path>."""
    from tenzir_spark.sources.formats import read_zeek_tsv

    df = read_zeek_tsv(spark, "/root/repo/fixtures/zeek_merge.log")
    counts = {r["_schema"]: r["n"] for r in
              df.groupBy("_schema").count().withColumnRenamed("count", "n")
              .collect()}
    assert counts == {"zeek.conn": 4, "zeek.dns": 5}
    conn = df.filter("_schema = 'zeek.conn'")
    assert {r["uid"] for r in conn.select("uid").collect()} == \
        {"Pii6cUUq1v4", "nkCxlvNN8pi", "9VdICMMnxQ7", "bEgBnkI31Vf"}
    # conn-only columns are null on dns rows and vice versa
    dns = df.filter("_schema = 'zeek.dns'")
    assert all(r["service"] is None for r in dns.select("service").collect())
    assert {r["query"] for r in dns.select("query").collect()} == \
        {"WORKGROUP", "DOMEX"}
    # typed per block: conn duration is double-ish, dns trans_id numeric
    assert conn.schema["duration"].dataType.typeName() in ("double", "float")


def test_syslog_reference_unit_suite(spark, tmp_path):
    """The reference's syslog format unit tests
    (libtenzir/test/format/syslog.cpp) over its own artifact
    (libtenzir_test/artifacts/logs/syslog/syslog-test.txt): 5 events,
    all schema syslog.rfc5424, facility/severity split of <34> -> 4/2,
    structured-data escape handling (\\], \\", \\\\), two SD elements
    on one line, nil timestamp, absent message, and the header-parser
    case of a nil `-` hostname parsing to the empty string."""
    import os

    from tenzir_spark.sources.formats import read_syslog

    art = ("/root/reference/libtenzir_test/artifacts/logs/syslog/"
           "syslog-test.txt")
    if not os.path.isfile(art):
        pytest.skip("reference tree not present")
    rows = sorted((r.asDict(recursive=True)
                   for r in read_syslog(spark, art).collect()),
                  key=lambda r: r["version"])
    assert len(rows) == 5
    assert {r["_schema"] for r in rows} == {"syslog.rfc5424"}
    r1 = rows[0]
    assert (r1["facility"], r1["severity"]) == (4, 2)  # <34>
    assert (r1["hostname"], r1["app_name"], r1["process_id"],
            r1["message_id"]) == ("mymachineexamplecom", "su", "asd",
                                  "ID47")
    # SD escapes: \] -> ], \" -> ", \\ -> backslash
    assert r1["structured_data"]["exampleSDID@32473"]["eventSource"] \
        == "App]lication"
    assert rows[3]["structured_data"]["exampleSDID@32473"][
        "eventSource"] == 'Applic"ation'
    assert rows[4]["structured_data"]["exampleSDID@32473"][
        "eventSource"] == "Applic\\ation"
    # two SD elements on the last line; its message is absent
    assert rows[4]["structured_data"]["examplePriority@32473"] == \
        {"class": "high"}
    assert rows[4]["message"] is None
    # nil timestamp on line 3 (<165> -> facility 20 severity 5)
    assert rows[2]["ts"] is None
    assert (rows[2]["facility"], rows[2]["severity"]) == (20, 5)
    # header-parser case: nil `-` hostname parses to empty string
    p = tmp_path / "nilhost.log"
    p.write_text("<34>1 2003-10-11T22:14:15.003Z - su asd ID47 - m\n")
    r = read_syslog(spark, str(p)).collect()[0]
    assert r["hostname"] == ""
