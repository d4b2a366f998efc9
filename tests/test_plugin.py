"""UDx surface (tenzir_spark.plugin ≅ plugin.hpp extension kinds).

The reference extends via C++ plugin classes — operator_plugin,
aggregation_function_plugin, parser_plugin, printer_plugin,
loader_plugin/saver_plugin (libtenzir/include/tenzir/plugin.hpp);
here each kind is a registry the TQL compiler consults, and these
tests drive every kind end-to-end through TQL strings.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from tenzir_spark import plugin
from tenzir_spark.plans.tql import exec_pipeline, parse_pipeline


@pytest.fixture
def clean(request):
    """Unregister everything a test registers."""
    regs: list[tuple[str, str]] = []

    def reg(kind, name, *a, **kw):
        getattr(plugin, f"register_{kind}")(name, *a, **kw)
        regs.append((kind, name))

    yield reg
    for kind, name in regs:
        plugin.unregister(kind, name)


def test_source_plugin_first_position(spark, clean):
    def ticks(sp, n="5"):
        return sp.range(int(n)).select(
            F.col("id").alias("tick"), (F.col("id") * 2).alias("v"))

    clean("source", "ticks", ticks)
    df = parse_pipeline('ticks 7 | where v >= 6 | select tick',
                        spark=spark).df
    assert [r.tick for r in df.orderBy("tick").collect()] == [3, 4, 5, 6]


def test_operator_plugin_mid_pipeline(spark, clean):
    def double(df, col):
        return df.withColumn(col, F.col(col) * 2)

    clean("operator", "double", double)
    src = spark.range(3).select(F.col("id").alias("x"))
    df = parse_pipeline('double x | where x == 4', source=src).df
    assert [r.x for r in df.collect()] == [4]


def test_operator_plugin_not_a_source(spark, clean):
    clean("operator", "double", lambda df, c: df)
    with pytest.raises(ValueError, match="no source"):
        parse_pipeline('double x | pass', spark=spark)


def test_aggregation_plugin_in_summarize(spark, clean):
    # geometric mean as a native Spark aggregate: partial aggregation
    # (map-side combine) applies because it compiles to exp(avg(ln x))
    clean("aggregation", "geomean",
          lambda c: F.exp(F.avg(F.log(c))))
    src = spark.createDataFrame(
        [("a", 2.0), ("a", 8.0), ("b", 3.0)], "k string, v double")
    df = parse_pipeline('summarize g=geomean(v) by k | sort k',
                        source=src).df
    rows = df.collect()
    assert [r.k for r in rows] == ["a", "b"]
    assert rows[0].g == pytest.approx(4.0)
    assert rows[1].g == pytest.approx(3.0)


def test_parser_plugin_read_and_inference(spark, clean, tmp_path):
    # a key=value line format, with extension-driven inference
    def read_kv(sp, path, opts):
        lines = sp.read.text(str(path))
        kv = F.transform(F.split(F.trim(F.col("value")), r"\s+"),
                         lambda p: F.split(p, "="))
        m = F.map_from_entries(
            F.transform(kv, lambda p: F.struct(p[0], p[1])))
        df = lines.select(m.alias("m")).select(
            F.col("m")["host"].alias("host"),
            F.col("m")["port"].cast("long").alias("port"))
        if "--drop-null-port" in opts:
            df = df.where(F.col("port").isNotNull())
        return df

    clean("parser", "kv", read_kv, extensions=[".kv"])
    f = tmp_path / "hosts.kv"
    f.write_text("host=a port=80\nhost=b port=443\nhost=c\n")
    # explicit `read kv` with a plugin-owned option token
    df = parse_pipeline(f'from {f} read kv --drop-null-port | sort port',
                        spark=spark).df
    assert [(r.host, r.port) for r in df.collect()] == [("a", 80),
                                                        ("b", 443)]
    # extension inference: bare `from <path>` routes to the plugin
    df2 = parse_pipeline(f'from {f} | summarize n=count(.)',
                         spark=spark).df
    assert df2.collect()[0].n == 3


def test_printer_plugin_write_save(spark, clean, tmp_path):
    # a pipe-separated printer exercising write <name> | save <path>
    def write_psv(df, path, opts):
        cols = [F.col(c).cast("string") for c in df.columns]
        (df.select(F.concat_ws("|", *cols).alias("value"))
           .coalesce(1).write.mode("overwrite").text(str(path)))

    clean("printer", "psv", write_psv)
    src = spark.createDataFrame([(1, "x"), (2, "y")], "a int, b string")
    out = tmp_path / "out_psv"
    exec_pipeline(f'sort a | write psv | save {out}', spark=spark,
                  source=src)
    lines = sorted(r.value for r in spark.read.text(str(out)).collect())
    assert lines == ["1|x", "2|y"]


def test_builtin_shadowing_rejected(clean):
    with pytest.raises(ValueError, match="builtin"):
        plugin.register_operator("where", lambda df: df)
    with pytest.raises(ValueError, match="builtin"):
        plugin.register_aggregation("sum", lambda c: F.sum(c))
    with pytest.raises(ValueError, match="builtin"):
        plugin.register_parser("json", lambda sp, p, o: None)
    with pytest.raises(ValueError, match="builtin"):
        plugin.register_printer("parquet", lambda df, p, o: None)
    with pytest.raises(ValueError, match="builtin"):
        plugin.register_source("from", lambda sp: None)


def test_show_plugins_lists_registrations(spark, clean):
    clean("operator", "noop_op", lambda df: df)
    from tenzir_spark.plans.registry import show
    rows = {(r.name, r.kind) for r in show(spark, "plugins").collect()}
    assert ("noop_op", "operators") in rows
    # builtins still listed
    assert any(k == "builtin" for _, k in rows)


def test_unregister_restores_unknown(spark, clean):
    plugin.register_operator("transient", lambda df: df)
    plugin.unregister("operator", "transient")
    src = spark.range(1)
    with pytest.raises(ValueError, match="unknown operator"):
        parse_pipeline("transient | pass", source=src)
    # parser extension mapping is removed too
    plugin.register_parser("tmpfmt", lambda sp, p, o: None,
                           extensions=[".tmpfmt"])
    plugin.unregister("parser", "tmpfmt")
    from tenzir_spark.plans.tql import _EXT_FORMAT
    assert ".tmpfmt" not in _EXT_FORMAT
