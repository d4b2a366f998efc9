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
    docs = [json.loads(r["json"]) for r in back.collect()]
    docs.sort(key=lambda d: d["id"])
    assert docs[0] == {"id": 1, "s": "x", "v": 1.5}
    assert docs[1] == {"id": 2, "s": "multi\nline"}  # nulls omitted


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
