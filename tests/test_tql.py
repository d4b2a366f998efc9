"""TQL pipeline-string parser tests.

Golden-style cases shaped like the reference's integration suite
(tenzir/integration/tests.yaml:851-857 runs
``sort --stable proto | select ts uid | head 3`` over a zeek-tsv conn
log and diffs stdout against a golden file); here we parse the same
pipeline strings and assert the resulting rows.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import Row

from tenzir_spark import exec_pipeline, parse_pipeline
from tenzir_spark.plans.tql import split_pipeline


@pytest.fixture(scope="module")
def conn_log(tmp_path_factory):
    d = tmp_path_factory.mktemp("tql")
    p = d / "conn.log"
    p.write_text(
        "#separator \\x09\n"
        "#set_separator\t,\n"
        "#empty_field\t(empty)\n"
        "#unset_field\t-\n"
        "#path\tconn\n"
        "#fields\tts\tuid\tid.orig_h\tid.orig_p\tproto\tduration\n"
        "#types\ttime\tstring\taddr\tport\tenum\tinterval\n"
        "1704067201.0\tC2\t10.0.0.2\t80\tudp\t0.5\n"
        "1704067200.5\tC1\t10.0.0.1\t1234\ttcp\t0.25\n"
        "1704067202.0\tC3\t10.0.0.3\t443\ttcp\t1.5\n"
    )
    return str(p)


def test_split_pipeline_respects_quotes_and_or():
    segs = split_pipeline('where a == "x|y" || b > 1 | select a b | head 5')
    assert segs == ['where a == "x|y" || b > 1', "select a b", "head 5"]


def test_golden_sort_select_head(spark, conn_log):
    # tests.yaml:851-857 shape: read zeek-tsv, sort, select, head
    out = exec_pipeline(
        f"from {conn_log} read zeek-tsv | sort uid | select uid proto | head 2",
        spark=spark,
    )
    assert [tuple(r) for r in out.collect()] == [("C1", "tcp"), ("C2", "udp")]


def test_golden_where_arithmetic(spark, conn_log):
    out = exec_pipeline(
        f"from {conn_log} read zeek-tsv | where duration * 2 >= 1.0 | select uid",
        spark=spark,
    )
    assert sorted(r.uid for r in out.collect()) == ["C2", "C3"]


def test_golden_summarize_by(spark, conn_log):
    out = exec_pipeline(
        f"from {conn_log} read zeek-tsv"
        " | summarize n=count(.), total=sum(duration) by proto | sort proto",
        spark=spark,
    )
    rows = out.collect()
    assert [(r.proto, r.n) for r in rows] == [("tcp", 2), ("udp", 1)]
    assert abs(rows[0].total - 1.75) < 1e-9


def test_put_extend_function_calls(spark):
    df = spark.createDataFrame([Row(a=1, b="x"), Row(a=2, b="yy")])
    out = exec_pipeline(
        "extend c=a * 10 + 1, blen=length(b) | put a=a, c=c, blen=blen, u=upper(b)",
        source=df,
    )
    got = {r.a: (r.c, r.blen, r.u) for r in out.collect()}
    assert got == {1: (11, 1, "X"), 2: (21, 2, "YY")}


def test_sink_and_roundtrip(spark, tmp_path, conn_log):
    dest = str(tmp_path / "out.parquet")
    exec_pipeline(
        f"from {conn_log} read zeek-tsv | select uid | to {dest} write parquet",
        spark=spark,
    )
    back = spark.read.parquet(dest)
    assert back.count() == 3


def test_parse_rejects_unknown_operator(spark, conn_log):
    with pytest.raises(ValueError, match="unknown operator"):
        parse_pipeline(f"from {conn_log} read zeek-tsv | frobnicate x", spark=spark)


def test_load_read_split(spark, conn_log):
    # from f read g  ==  load f | read g (reference rewrite,
    # from_load_read.cpp:19)
    out = exec_pipeline(f"load {conn_log} | read zeek-tsv | top proto", spark=spark)
    rows = out.collect()
    assert rows[0].proto == "tcp" and rows[0]["count"] == 2


def test_stdin_stdout_dash_connector(spark, monkeypatch, capsys):
    """`from - read json | ... | to -` — the reference's dash connector
    (connectors/dash.cpp) as driver-side spool + NDJSON print."""
    import io

    monkeypatch.setattr("sys.stdin", io.StringIO('{"a": 3}\n{"a": 1}\n{"a": 2}\n'))
    exec_pipeline("from - read json | where a >= 2 | sort a | to -", spark=spark)
    out = capsys.readouterr().out.strip().splitlines()
    assert out == ['{"a":2}', '{"a":3}']
    # BARE `from -` (no explicit read): format inference must use the
    # spool's .json suffix, not the literal '-' (regression guard)
    monkeypatch.setattr("sys.stdin", io.StringIO('{"a": 7}\n'))
    exec_pipeline("from - | select a | to -", spark=spark)
    assert capsys.readouterr().out.strip() == '{"a":7}'


def test_tql_export_import_lake_roundtrip(spark, tmp_path):
    """`export <table> | where ... | import <other>` — the reference's
    storage operators driven from a pipeline string, under the
    exactly-once ledger."""
    from pyspark.sql import types as T

    from tenzir_spark.lake import LakeTable
    from tenzir_spark.plans.registry import register_table

    schema = T.StructType([T.StructField("k", T.StringType(), False),
                           T.StructField("v", T.LongType(), True)])
    src = LakeTable.create(spark, str(tmp_path / "src"), schema, "k", num_buckets=2)
    src.append(spark.createDataFrame([("a", 1), ("b", 20), ("c", 300)], schema))
    dst = LakeTable.create(spark, str(tmp_path / "dst"), schema, "k",
                           num_buckets=2, write_mode="mor")
    register_table("tql_src", src)
    register_table("tql_dst", dst)

    exec_pipeline("export tql_src | where v >= 20 | import tql_dst", spark=spark)
    dst.refresh()
    got = {r.k: r.v for r in dst.read().collect()}
    assert got == {"b": 20, "c": 300}
    # replaying the same epoch is a no-op (exactly-once)
    exec_pipeline("export tql_src | where v >= 20 | import tql_dst --epoch 0",
                  spark=spark)
    dst.refresh()
    assert {r.k: r.v for r in dst.read().collect()} == {"b": 20, "c": 300}


def test_tql_cef_import_export_sort(spark, tmp_path):
    """tests.yaml 'Sort with Remote Operators' shape: `read cef |
    import` then `export | sort signature_id asc` — format ingest into
    the lake and sorted export, all through pipeline strings."""
    from pyspark.sql import types as T

    from tenzir_spark.lake import LakeTable
    from tenzir_spark.plans.registry import register_table
    from tenzir_spark.sources.formats import read_cef

    schema = read_cef(spark, "/root/repo/fixtures/events.cef").schema
    t = LakeTable.create(spark, str(tmp_path / "cef"), schema,
                         "signature_id", num_buckets=2)
    register_table("tql_cef", t)
    exec_pipeline("from /root/repo/fixtures/events.cef read cef"
                  " | import tql_cef", spark=spark)
    t.refresh()
    out = exec_pipeline("export tql_cef | sort signature_id"
                        " | select signature_id name", spark=spark)
    rows = [(r["signature_id"], r["name"]) for r in out.collect()]
    assert rows == sorted(rows)
    assert ("100", "worm stopped") in rows


def test_sigma_rule_directory(spark, tmp_path):
    from tenzir_spark.functions.sigma import load_rules

    d = tmp_path / "rules"
    d.mkdir()
    (d / "r1.yml").write_text(
        "title: one\ndetection:\n  sel:\n    event_type: purchase\n  condition: sel\n")
    (d / "r2.yaml").write_text(
        "title: two\ndetection:\n  sel:\n    event_type: error\n  condition: sel\n")
    rules = load_rules(str(d))
    assert [r["title"] for r in rules] == ["one", "two"]
    from pyspark.sql import Row
    df = spark.createDataFrame([Row(event_type="purchase", v=1),
                                Row(event_type="view", v=2),
                                Row(event_type="error", v=3)])
    from tenzir_spark.functions.sigma import sigma as sigma_op
    out = sigma_op(df, rules)
    got = sorted((r.rule.title, r.event.event_type) for r in out.collect())
    assert got == [("one", "purchase"), ("two", "error")] or \
           got == [("one", "purchase"), ("two", "error")][::-1] or \
           sorted(got) == [("one", "purchase"), ("two", "error")]


def test_put_operands_with_spaces(spark):
    from pyspark.sql import Row
    df = spark.createDataFrame([Row(a=3, b=4)])
    out = exec_pipeline("put y=a + 1 z=b * 2, w=concat('v', to_string(a))",
                        source=df)
    r = out.collect()[0]
    assert (r.y, r.z, r.w) == (4, 8, "v3")


def test_write_then_save_split_form(spark, tmp_path, conn_log):
    # `write <fmt> | save <path>` == `to <path> write <fmt>`
    # (reference fuses them: to_write_save.cpp:267)
    dest = str(tmp_path / "split.parquet")
    exec_pipeline(
        f"from {conn_log} read zeek-tsv | select uid | write parquet | save {dest}",
        spark=spark)
    assert spark.read.parquet(dest).count() == 3


def test_follow_file_streaming_pipeline(spark, tmp_path):
    """`from <dir> --follow read json | where ... | to <dir>` — the
    reference's follow connector as a Structured Streaming pipeline
    (availableNow drains existing files then stops)."""
    import json as _json

    src = tmp_path / "grow"
    src.mkdir()
    (src / "a.json").write_text('{"v": 1}\n{"v": 5}\n')
    (src / "b.json").write_text('{"v": 9}\n')
    dest = str(tmp_path / "sunk")
    exec_pipeline(
        f"from {src} --follow read json | where v >= 5 | to {dest} write json",
        spark=spark)
    rows = []
    for name in os.listdir(dest):
        if name.startswith("part-"):
            with open(os.path.join(dest, name)) as fh:
                rows += [_json.loads(l) for l in fh if l.strip()]
    assert sorted(r["v"] for r in rows) == [5, 9]


def test_kv_pairs_quoted_operand_with_equals():
    """put msg="a b = c" must keep the quoted operand intact — the old
    regex split saw through quotes (round-2 advice #1)."""
    from tenzir_spark.plans.tql import _kv_pairs

    kv = _kv_pairs('msg="a b = c" n=1 + 2')
    assert kv == {"msg": '"a b = c"', "n": "1 + 2"}
    # function args containing ' x = ' don't mis-split either
    kv2 = _kv_pairs('y=coalesce(a, "x = y") z=b * 2')
    assert kv2 == {"y": 'coalesce(a, "x = y")', "z": "b * 2"}


def test_tail_requires_order_by(spark, conn_log):
    with pytest.raises(ValueError, match="order-by"):
        parse_pipeline(f"from {conn_log} read zeek-tsv | tail 2", spark=spark)


def test_write_without_save_rejected(spark, conn_log):
    with pytest.raises(ValueError, match="save"):
        parse_pipeline(f"from {conn_log} read zeek-tsv | write parquet",
                       spark=spark)


def test_reader_options_selector_and_schema(spark, tmp_path):
    """--selector and --schema reach the json reader through the TQL
    string form (reference json.cpp:96-105)."""
    f = tmp_path / "e.json"
    f.write_text('{"event_type":"flow","v":1}\n{"event_type":"dns","v":2}\n')
    p = parse_pipeline(
        f"from {f} read json --selector event_type:suricata | sort _schema",
        spark=spark)
    assert [r["_schema"] for r in p.df.collect()] == \
        ["suricata.dns", "suricata.flow"]
    p2 = parse_pipeline(
        f'from {f} read json --schema "event_type string, v long"',
        spark=spark)
    assert dict(p2.df.dtypes)["v"] == "bigint"
    with pytest.raises(ValueError, match="unknown reader option"):
        parse_pipeline(f"from {f} read json --bogus x", spark=spark)


def test_reader_options_csv_no_header(spark, tmp_path):
    f = tmp_path / "h.csv"
    f.write_text("1,a\n2,b\n")
    p = parse_pipeline(f"from {f} read csv --no-header", spark=spark)
    assert p.df.count() == 2 and len(p.df.columns) == 2


def test_tql_comments(spark, tmp_path):
    """Reference TQL /* */ comments (tests.yaml:647): non-nested (the
    first */ ends the comment), standalone-delimited so glob paths
    survive; unterminated opener and a bare comment segment error."""
    import pytest as _pt

    from tenzir_spark.plans.tql import exec_pipeline, parse_pipeline

    p = tmp_path / "c.json"
    p.write_text('{"a": 1, "s": "foo"}\n{"a": 2, "s": "bar"}\n')
    out = parse_pipeline(
        f"from {p} read json | select a /*double beginning /* is valid */",
        spark=spark)
    assert sorted(r.a for r in out.df.collect()) == [1, 2]
    with _pt.raises(ValueError):
        parse_pipeline(f"from {p} read json | select a | /**/", spark=spark)
    with _pt.raises(ValueError, match="unterminated"):
        parse_pipeline(f"from {p} read json /* no closer", spark=spark)
    # a pattern literal whose body ends in '*' does not close a comment
    out2 = parse_pipeline(
        f"from {p} read json | where s != /x.*/ | select a", spark=spark)
    assert sorted(r.a for r in out2.df.collect()) == [1, 2]


def test_json_printer_flags(spark, tmp_path):
    """tests.yaml:1018 'JSON Printer': the reference default INCLUDES
    null fields; --omit-nulls drops them; -c is accepted (NDJSON is
    already compact); the omit-empty family refuses loudly."""
    import glob
    import json as _json

    import pytest as _pt

    from tenzir_spark.plans.tql import exec_pipeline

    src = tmp_path / "n.json"
    src.write_text('{"a": 1, "b": null}\n{"a": 2}\n')

    def read_out(d):
        rows = []
        for f in glob.glob(str(d) + "/part-*"):
            rows += [_json.loads(line) for line in open(f) if line.strip()]
        return sorted(rows, key=lambda r: r["a"])

    d1 = tmp_path / "with_nulls"
    exec_pipeline(f"from {src} read json | to {d1} write json", spark=spark)
    assert read_out(d1) == [{"a": 1, "b": None}, {"a": 2, "b": None}]

    d2 = tmp_path / "omit"
    exec_pipeline(f"from {src} read json | to {d2} write json --omit-nulls",
                  spark=spark)
    assert read_out(d2) == [{"a": 1}, {"a": 2}]

    d3 = tmp_path / "compact"
    exec_pipeline(f"from {src} read json | to {d3} write json -c --omit-nulls",
                  spark=spark)
    assert read_out(d3) == [{"a": 1}, {"a": 2}]

    # --omit-empty implies all three omit flags (json.cpp:989-994)
    src2 = tmp_path / "e.json"
    src2.write_text('{"a": 1, "b": null, "c": [], "d": 2}\n')
    d4 = tmp_path / "omit_empty"
    exec_pipeline(f"from {src2} read json | to {d4} write json --omit-empty",
                  spark=spark)
    assert read_out(d4) == [{"a": 1, "d": 2}]


def test_zeek_tsv_timestamp_tags(spark, tmp_path):
    """zeek_tsv.cpp:312-342: #open/#close wall-clock tags by default,
    none with --disable-timestamp-tags."""
    from tenzir_spark.plans.tql import exec_pipeline

    src = tmp_path / "r.json"
    src.write_text('{"uid": "u1", "n": 1}\n')
    out1 = tmp_path / "tagged.log"
    exec_pipeline(f"from {src} read json | write zeek-tsv | save {out1}",
                  spark=spark)
    text = out1.read_text()
    assert "#open\t" in text and "#close\t" in text
    out2 = tmp_path / "untagged.log"
    exec_pipeline(f"from {src} read json"
                  f" | write zeek-tsv --disable-timestamp-tags"
                  f" | save {out2}", spark=spark)
    t2 = out2.read_text()
    assert "#open" not in t2 and "#close" not in t2
    # round trip unaffected either way
    from tenzir_spark.sources.formats import read_zeek_tsv
    assert read_zeek_tsv(spark, str(out1)).count() == 1
    assert read_zeek_tsv(spark, str(out2)).count() == 1


def test_json_unnest_separator(spark, tmp_path):
    """json.cpp --unnest-separator: nested records flatten into
    separator-joined top-level names at parse time."""
    from tenzir_spark.plans.tql import parse_pipeline

    src = tmp_path / "nested.json"
    src.write_text('{"a": {"b": 1, "c": {"d": "x"}}, "e": 2}\n')
    p = parse_pipeline(
        f"from {src} read json --unnest-separator . | select a.b a.c.d e",
        spark=spark)
    assert sorted(p.df.columns) == ["a.b", "a.c.d", "e"]
    r = p.df.collect()[0]
    assert (r["a.b"], r["a.c.d"], r["e"]) == (1, "x", 2)


def test_ascii_printer(spark, tmp_path, capsys):
    """Reference ascii debug format (format/ascii.cpp, the export ascii
    default): <v1, v2, ...> rows — null/true/false, quoted strings,
    bare numbers/timestamps, [] lists."""
    from tenzir_spark.plans.tql import exec_pipeline

    src = tmp_path / "a.json"
    src.write_text(
        '{"n": 1, "s": "x", "b": true, "l": [1, 2], "m": null,'
        ' "t": "2009-11-18T21:01:53.173350"}\n'
        '{"n": 2, "s": "y \\"q\\"", "b": false, "l": [], "m": 3,'
        ' "t": null}\n')
    exec_pipeline(
        f"from {src} read json | select n s b l m"
        " | sort n | write ascii", spark=spark)
    out = capsys.readouterr().out.strip().splitlines()
    # the reader preserves the input's key order (n, s, b, l, m) and
    # select keeps the layout order like the reference
    assert out == [
        '<1, "x", true, [1, 2], null>',
        '<2, "y \\"q\\"", false, [], 3>',
    ]
    # timestamps print bare in ISO form with microseconds
    exec_pipeline(
        "from /root/repo/fixtures/syslog.log read syslog"
        " | where app_name == \"rsyslogd\" | select ts app_name"
        " | write ascii", spark=spark)
    out2 = capsys.readouterr().out.strip().splitlines()
    assert out2 == ['<2020-03-02T18:37:57.819303, "rsyslogd">']
    # file sink via the cluster-safe assembly
    dest = tmp_path / "out.txt"
    exec_pipeline(
        f"from {src} read json | select n | sort n"
        f" | write ascii | save {dest}", spark=spark)
    assert dest.read_text().strip().splitlines() == ["<1>", "<2>"]


def test_xsv_printer_quoting_and_lists(spark, tmp_path):
    """xsv.cpp quoting: strings quote ONLY when they contain the field
    sep or a quote (backslash escapes); lists join on the list sep;
    null token differs per format (csv "", tsv "-")."""
    src = tmp_path / "in.json"
    src.write_text(
        '{"a": "plain", "b": "with,comma", "c": "with\\"quote", '
        '"d": [1, 2], "e": null}\n')
    from tenzir_spark.plans.tql import exec_pipeline
    out_csv = tmp_path / "o.csv"
    exec_pipeline(f"from {src} read json | to {out_csv} write csv",
                  spark=spark)
    head, row = out_csv.read_text().splitlines()
    assert head == "a,b,c,d,e"
    assert row == 'plain,"with,comma","with\\"quote",1;2,'
    out_tsv = tmp_path / "o.tsv"
    exec_pipeline(f"from {src} read json | to {out_tsv} write tsv",
                  spark=spark)
    # quotes trigger quoting regardless of the field sep (xsv.cpp
    # visitor checks sep OR '"'); commas are plain data in tsv
    assert out_tsv.read_text().splitlines()[1] == \
        'plain\twith,comma\t"with\\"quote"\t1,2\t-'


def test_si_literal_edges(spark, tmp_path):
    """SI magnitudes fold at lex time: fractional coefficients and the
    binary/decimal distinction (2.5k=2500, 1.5Ki=1536)."""
    src = tmp_path / "n.json"
    src.write_text('{"x": 2500}\n{"x": 1536}\n{"x": 9}\n')
    from tenzir_spark.plans.tql import parse_pipeline
    df = parse_pipeline(f"from {src} read json | where x == 2.5k",
                        spark=spark).df
    assert [r.x for r in df.collect()] == [2500]
    df2 = parse_pipeline(f"from {src} read json | where x == 1.5Ki",
                         spark=spark).df
    assert [r.x for r in df2.collect()] == [1536]


def test_duration_to_seconds_units(spark):
    from pyspark.sql import functions as F

    from tenzir_spark.sources.formats import duration_to_seconds
    df = spark.createDataFrame(
        [("20ns",), ("1.5ms",), ("2m",), ("3",), ("4h",)], ["v"])
    vals = [r.s for r in df.select(
        duration_to_seconds(F.col("v"), "ms").alias("s")).collect()]
    assert vals[0] == 2e-08
    assert abs(vals[1] - 0.0015) < 1e-12
    # 'm' is not a unit (reference uses 'min'); bare numbers take the
    # schema unit
    assert vals[3] == 0.003
    assert vals[4] == 4 * 3600.0
