"""Connector-layer tests: kafka offset translation, http loader
(file:// in-sandbox), byte-stream codecs, zeek-tsv printer round-trip."""

from __future__ import annotations

import gzip
import json
import os

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from tenzir_spark.sources import codecs, formats
from tenzir_spark.sources.kafka import kafka_options, parse_offset_spec
from tenzir_spark.sources.net import http_fetch, http_load


# ------------------------------------------------------------------- kafka

def test_offset_spec_named():
    # reference grammar: plugins/kafka/src/plugin.cpp:43-47
    assert parse_offset_spec("beginning")["startingOffsets"] == "earliest"
    assert parse_offset_spec("end")["startingOffsets"] == "latest"
    assert parse_offset_spec("stored")["kind"] == "stored"


def test_offset_spec_numeric():
    assert parse_offset_spec(42) == {"kind": "absolute", "offset": 42}
    assert parse_offset_spec("7") == {"kind": "absolute", "offset": 7}
    assert parse_offset_spec("-100") == {"kind": "tail", "offset": 100}


def test_offset_spec_invalid():
    with pytest.raises(ValueError, match="invalid kafka offset"):
        parse_offset_spec("sideways")


def test_kafka_options_absolute_per_partition():
    opts = kafka_options("logs", "b1:9092", offset=500, partitions=[0, 1, 2])
    assert opts["subscribe"] == "logs"
    assert json.loads(opts["startingOffsets"]) == {
        "logs": {"0": 500, "1": 500, "2": 500}}


def test_kafka_options_named():
    opts = kafka_options("logs", offset="beginning")
    assert opts["startingOffsets"] == "earliest"


# -------------------------------------------------------------------- http

def test_http_fetch_and_load_file_url(spark, tmp_path):
    src = tmp_path / "feed.json"
    src.write_text('{"a": 1}\n{"a": 2}\n')
    url = "file://" + str(src)
    local = http_fetch(url)
    assert open(local).read().startswith('{"a": 1}')
    os.unlink(local)
    df = http_load(spark, url)
    assert sorted(r.a for r in df.collect()) == [1, 2]


def test_http_fetch_size_ceiling(tmp_path):
    big = tmp_path / "big.bin"
    big.write_bytes(b"x" * 4096)
    with pytest.raises(ValueError, match="driver-spool limit"):
        http_fetch("file://" + str(big), max_bytes=1024)


# ------------------------------------------------------------------ codecs

def test_decompress_gzip_roundtrip(tmp_path):
    raw = tmp_path / "x.log"
    raw.write_text("hello\nworld\n")
    gz = codecs.compress_file(str(raw), "gzip")
    assert gz.endswith(".gz")
    out = codecs.decompress_file(gz)
    assert open(out).read() == "hello\nworld\n"
    os.unlink(out)


def test_codec_inference():
    assert codecs.codec_of("a.json.gz") == "gz"
    assert codecs.codec_of("a.parquet") is None


def test_spark_reads_gzip_natively(spark, tmp_path):
    # load file x.json.gz | read json == spark.read.json(path.gz):
    # Hadoop codecs decompress by extension, distributed
    p = tmp_path / "ev.json.gz"
    with gzip.open(p, "wt") as fh:
        fh.write('{"k": 10}\n{"k": 20}\n')
    df = formats.read_json(spark, str(p))
    assert sorted(r.k for r in df.collect()) == [10, 20]


# ---------------------------------------------------------- zeek-tsv printer

def test_zeek_tsv_roundtrip(spark, tmp_path):
    df = spark.createDataFrame([
        Row(uid="C1", port=80, duration=0.25, ok=True, note="x"),
        Row(uid="C2", port=None, duration=None, ok=False, note=""),
    ]).withColumn("ts", F.timestamp_seconds(F.lit(1704067200.5))) \
      .select("ts", "uid", "port", "duration", "ok", "note")
    dest = str(tmp_path / "out.log")
    formats.write_zeek_tsv(df, dest, log_path="conn")
    text = open(dest).read()
    assert text.startswith("#separator \\x09\n")
    assert "#fields\tts\tuid\tport\tduration\tok\tnote" in text
    assert "#types\ttime\tstring\tcount\tinterval\tbool\tstring" in text
    back = formats.read_zeek_tsv(spark, dest)
    rows = {r.uid: r for r in back.collect()}
    assert rows["C1"].port == 80 and abs(rows["C1"].duration - 0.25) < 1e-9
    assert rows["C1"].ok is True and rows["C2"].ok is False
    assert rows["C2"].port is None and rows["C2"].duration is None
    assert rows["C2"].note == ""  # set-but-empty survives, distinct from unset
    assert rows["C1"].ts.year == 2024
