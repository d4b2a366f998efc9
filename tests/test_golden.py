"""Golden end-to-end pipeline tests — the reference's primary test model
(tenzir/integration/tests.yaml runs `tenzir exec '<pipeline>'` and diffs
stdout against golden files in tenzir/integration/reference/). Here each
case runs a TQL pipeline string over the committed fixtures with the
`to -` NDJSON sink and diffs captured stdout against tests/golden/*.txt.
"""

from __future__ import annotations

import os

import pytest

from tenzir_spark import exec_pipeline

GOLDEN_DIR = os.path.join(os.path.dirname(__file__), "golden")
CONN = "/root/repo/fixtures/conn.log"
CEF = "/root/repo/fixtures/events.cef"
EVE = "/root/repo/fixtures/eve.json"

CASES = [
    # tests.yaml:851-857 shape: sort | select | head over zeek-tsv
    ("sort_select_head.txt",
     f"from {CONN} read zeek-tsv | sort uid | select uid proto duration | head 3"),
    ("summarize_by_proto.txt",
     f"from {CONN} read zeek-tsv"
     " | summarize n=count(.), total=sum(duration) by proto | sort proto"),
    ("top_proto.txt",
     f"from {CONN} read zeek-tsv | top proto"),
    ("cef_vendors.txt",
     f"from {CEF} read cef | select device_vendor name | sort name"),
    # tests.yaml:88 shape: predicate filter + projection
    ("where_proto_tcp.txt",
     f"from {CONN} read zeek-tsv | where proto == \"tcp\" && duration > 0.2"
     " | select uid duration | sort uid"),
    # tests.yaml pipeline-operators shape: enumerate with explicit order
    ("enumerate_uid.txt",
     f"from {CONN} read zeek-tsv | enumerate --order-by uid | select idx uid"
     " | sort idx | head 4"),
    # tail requires --order-by (stream order does not exist distributed)
    ("tail_ordered.txt",
     f"from {CONN} read zeek-tsv | tail 2 --order-by uid | select uid proto"),
    # rare = least-frequent values (top_rare.cpp:88)
    ("rare_proto.txt",
     f"from {CONN} read zeek-tsv | rare proto"),
    # sort | unique canonical idiom (unique.cpp:18)
    ("unique_proto.txt",
     f"from {CONN} read zeek-tsv | select proto | sort proto | unique"
     " | sort proto"),
    # json --selector reaches the reader through the TQL string form
    # (json.cpp:96-105); filter on the synthesized _schema column
    ("eve_selector_dns.txt",
     f"from {EVE} read json --selector event_type:suricata"
     " | where _schema == \"suricata.dns\" | select src_ip dest_port"
     " | sort src_ip"),
    # put with a quoted operand containing spaces and '=' (depth-aware
    # kv split; round-2 advice #1)
    ("put_quoted.txt",
     f"from {CONN} read zeek-tsv | head 1 --order-by uid"
     " | put msg=\"a b = c\" n=1 + 2 | select msg n"),
    # tests.yaml Shell shape: child-process stdout as the byte source
    ("shell_csv.txt",
     "shell \"printf 'x,y\\n1,a\\n2,b\\n3,c\\n'\" | read csv"
     " | where x >= 2 | sort x"),
    # tests.yaml:745: measure | summarize events by schema
    ("measure_summarize.txt",
     f"from {CONN} read zeek-tsv | measure"
     " | summarize events=sum(events) by schema"),
    # tests.yaml:857 shape: sort <field> nulls-first
    ("sort_nulls_first.txt",
     f"from {CONN} read zeek-tsv | select duration"
     " | sort duration nulls-first"),
    # pcap-format step_02 shape: decapsulate | select vlan (record
    # extractor keeps the subtree)
    ("pcap_decap_select.txt",
     "from /root/repo/fixtures/vlan-double-tagging.pcap read pcap"
     " | decapsulate | select vlan | head 3 --order-by pcap.timestamp"),
    # tests.yaml:715 shape (read-json-with-new-field-in-record-list):
    # records inside a list unify with null-fill, as the reference's
    # adaptive builder does (its golden prints the explicit null our
    # NDJSON omits — same rows)
    ("json_record_list_new_field.txt",
     "from /root/repo/fixtures/record-list-new-field.json read json"),
    # tests.yaml:730 shape (record-list-with-nulls-and-conflict) — two
    # DOCUMENTED divergences from the reference golden: (a) a field
    # whose type conflicts across rows (42 vs "qux") unifies to string
    # via Spark's inference lattice, where the reference keeps two
    # heterogeneous per-event schemas; (b) a list of EMPTY records has
    # no Spark type and the column is dropped, where the adaptive
    # builder keeps foo=[{}, null, {}]
    ("json_record_list_conflict.txt",
     "from /root/repo/fixtures/record-list-with-null-conflict.json"
     " read json"),
    # tests.yaml:919 'Summarize All None Some' — S-by-A (present field
    # grouped by meta), N-by-A (ABSENT field: aggregates as null/empty
    # instead of failing analysis), count-by-N (absent group key: one
    # null group; NDJSON omits the null key column)
    ("summarize_distinct_by_schema.txt",
     f"from {EVE} read suricata"
     " | summarize x=distinct(src_ip) by _schema | sort _schema"),
    ("summarize_distinct_absent.txt",
     f"from {EVE} read suricata"
     " | summarize x=distinct(nope) by _schema | sort _schema"),
    ("summarize_by_absent_key.txt",
     f"from {CONN} read zeek-tsv | summarize n=count(.) by zzz"),
    # tests.yaml:959 'Summarize Dot' — count(.) counts events
    ("summarize_count_dot.txt",
     f"from {CONN} read zeek-tsv | summarize x=count(.)"),
    # tests.yaml:971 'Flatten Operator' over suricata input: nested
    # records become dotted flat columns selectable by full name
    ("flatten_suricata_dns.txt",
     f"from {EVE} read suricata | where _schema == \"suricata.dns\""
     " | flatten | select src_ip dns.rrname | sort src_ip"),
    # tests.yaml:994 'Unflatten Operator' — flatten | unflatten
    # round-trips the nested shape (records inside lists included)
    ("flatten_unflatten_roundtrip.txt",
     "from /root/repo/fixtures/record-list-new-field.json read json"
     " | flatten | unflatten"),
    # tests.yaml:1077 'Lines' — read lines, and the -s skip-empty flag
    ("lines_count.txt",
     f"from {CEF} read lines | summarize n=count(.)"),
    ("lines_count_skip_empty.txt",
     f"from {CEF} read lines -s | summarize n=count(.)"),
    # tests.yaml:776 'Repeat'
    ("repeat_uid.txt",
     f"from {CONN} read zeek-tsv | head 1 --order-by uid | repeat 3"
     " | select uid"),
    # tests.yaml:873 'Slice Regression Test' shape — head then tail
    ("slice_head_tail.txt",
     f"from {CONN} read zeek-tsv | sort uid | head 5"
     " | tail 2 --order-by uid | select uid"),
    # show aspect as a TQL source piped through operators
    # (tests.yaml:1038 YAML shape: `show plugins | where name == ...`)
    ("show_version_component.txt",
     "show version | where version != \"\" | select version"),
    # tests.yaml:1046 'PCAP Format' concat step: shell-concatenated
    # captures with -e keep file_header/packet sequencing per input
    ("pcap_concat_schemas.txt",
     "shell \"cat /root/repo/fixtures/vlan-single-tagging.pcap"
     " /root/repo/fixtures/vlan-double-tagging.pcap\""
     " | read pcap -e | summarize n=count(.) by _schema | sort _schema"),
    # tests.yaml:792 'Zeek TSV Pipeline Format' / :104 'Node Zeek
    # multiple imports': one stream carrying several zeek logs — each
    # header block parses with its own #fields/#types, frames unify
    # with _schema = zeek.<path>
    ("zeek_merge_schemas.txt",
     "from /root/repo/fixtures/zeek_merge.log read zeek-tsv"
     " | summarize n=count(.) by _schema | sort _schema"),
]


@pytest.mark.parametrize("golden,pipeline", CASES, ids=[c[0] for c in CASES])
def test_golden_pipeline(spark, capsys, golden, pipeline):
    exec_pipeline(pipeline + " | to -", spark=spark)
    got = capsys.readouterr().out.strip().splitlines()
    expected = open(os.path.join(GOLDEN_DIR, golden)).read().strip().splitlines()
    assert got == expected, f"{golden}: {got} != {expected}"


def test_golden_decompress_gzip(spark, tmp_path, capsys):
    """tests.yaml:1068 'Compression': `load file x.gz | decompress gzip
    | read ...` — the byte-stream codec between load and read."""
    import gzip
    import shutil

    gz = str(tmp_path / "eve.json.gz")
    with open(EVE, "rb") as src, gzip.open(gz, "wb") as dst:
        shutil.copyfileobj(src, dst)
    exec_pipeline(
        f"load {gz} | decompress gzip | read json"
        " --selector event_type:suricata"
        " | summarize n=count(.) by _schema | sort _schema | to -",
        spark=spark)
    got = capsys.readouterr().out.strip().splitlines()
    assert got == ['{"_schema":"suricata.alert","n":1}',
                   '{"_schema":"suricata.dns","n":2}',
                   '{"_schema":"suricata.flow","n":2}']


def test_golden_import_export_roundtrip(spark, tmp_path, capsys):
    """tests.yaml:92/149 'Node Zeek conn log' + 'Export json' shape:
    ingest via `import`, query back via `export | where | sort`, all
    through TQL against a registered lake table."""
    from pyspark.sql import types as T

    from tenzir_spark.lake import LakeTable
    from tenzir_spark.plans.registry import register_table

    schema = T.StructType([
        T.StructField("uid", T.StringType(), False),
        T.StructField("proto", T.StringType(), True),
        T.StructField("duration", T.DoubleType(), True),
    ])
    t = LakeTable.create(spark, str(tmp_path / "conn_t"), schema, "uid",
                         num_buckets=4)
    register_table("golden_conn", t)
    entry = exec_pipeline(
        f"from {CONN} read zeek-tsv | select uid proto duration"
        " | import golden_conn", spark=spark)
    assert entry["rows_applied"] == 6
    exec_pipeline(
        "export golden_conn | where proto == \"tcp\""
        " | select uid proto | sort uid | to -", spark=spark)
    got = capsys.readouterr().out.strip().splitlines()
    assert got == ['{"uid":"Cu1","proto":"tcp"}',
                   '{"uid":"Cu3","proto":"tcp"}',
                   '{"uid":"Cu5","proto":"tcp"}',
                   '{"uid":"Cu6","proto":"tcp"}']
