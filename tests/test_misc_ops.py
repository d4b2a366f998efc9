"""Coverage for the small operators that round 1 left untested: batch,
discard, feather, directory saver, repeat, measure."""

from __future__ import annotations

import os

from pyspark.sql import Row

from tenzir_spark import Pipeline, operators as ops
from tenzir_spark.sources import formats


def test_batch_is_identity(spark):
    df = spark.createDataFrame([Row(a=1), Row(a=2)])
    out = ops.batch(df, 1024)
    assert [r.a for r in out.orderBy("a").collect()] == [1, 2]


def test_discard_sink(spark):
    # noop sink: consumes the plan, returns nothing, leaves no files
    Pipeline(spark.createDataFrame([Row(a=1)])).discard()


def test_feather_roundtrip(spark, tmp_path):
    import pyarrow as pa
    import pyarrow.feather as feather

    p = str(tmp_path / "t.feather")
    feather.write_feather(pa.table({"x": [1, 2, 3], "s": ["a", "b", "c"]}), p)
    df = formats.read_feather(spark, p)
    assert sorted(r.x for r in df.collect()) == [1, 2, 3]


def test_directory_saver_partitioned(spark, tmp_path):
    """directory connector: one subtree per schema value (reference
    connectors/directory.cpp writes one file per schema)."""
    df = spark.createDataFrame([Row(_schema="zeek.conn", v=1),
                                Row(_schema="zeek.dns", v=2),
                                Row(_schema="zeek.conn", v=3)])
    dest = str(tmp_path / "out")
    Pipeline(df).to_parquet(dest, partition_by=["_schema"])
    subdirs = {d for d in os.listdir(dest) if d.startswith("_schema=")}
    assert subdirs == {"_schema=zeek.conn", "_schema=zeek.dns"}
    back = spark.read.parquet(dest)
    assert back.count() == 3


def test_repeat_multiplies(spark):
    df = spark.createDataFrame([Row(a=1), Row(a=2)])
    assert ops.repeat(df, 3).count() == 6
    assert ops.repeat(df, 1).count() == 2


def test_measure_totals(spark):
    df = spark.createDataFrame([Row(k="a"), Row(k="a"), Row(k="b")])
    m = ops.measure(df, schema_col="k")
    got = {r["schema"]: 0 for r in m.collect()}
    total = sum(r["events"] for r in m.collect())
    assert total == 3 and set(got) == {"a", "b"}


def test_map_key_access_select_extend_drop(spark):
    """tests.yaml:873 'Slice Regression Test' shape: `select
    extension.dvc` / `extend foo=extension.dvc` reach keys of the cef
    extension map through dotted paths; drop removes the key."""
    from tenzir_spark.operators.transform import drop, select
    from tenzir_spark.plans.tql import parse_pipeline
    from tenzir_spark.sources.formats import read_cef

    df = read_cef(spark, "/root/repo/fixtures/events.cef")
    out = select(df, "extension.src")
    assert out.columns == ["extension"]
    assert out.schema["extension"].dataType.typeName() == "struct"
    srcs = {r["extension"]["src"] for r in out.collect()}
    assert any(s for s in srcs)  # at least one row carries src=
    # extend via the expression surface
    p = parse_pipeline(
        "from /root/repo/fixtures/events.cef read cef"
        " | extend foo=extension.src | select name foo | sort name",
        spark=spark)
    rows = p.df.collect()
    assert "foo" in p.df.columns
    assert {r.foo for r in rows} == srcs
    # where over a map key
    p2 = parse_pipeline(
        "from /root/repo/fixtures/events.cef read cef"
        " | where extension.src != null | select name", spark=spark)
    assert p2.df.count() == len([s for s in srcs if s is not None])
    # drop removes the key from the map, keeps the rest
    d = drop(df, "extension.src")
    assert all("src" not in (r["extension"] or {}) for r in d.collect())
    assert any((r["extension"] or {}) for r in d.collect())
