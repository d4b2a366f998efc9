"""Expression compiler unit tests (reference semantics:
libtenzir/test/expression_evaluation.cpp, web/docs/language/expressions.md)."""

from __future__ import annotations

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from tenzir_spark.expr import (
    Binder,
    FieldExtractor,
    Predicate,
    compile_expression,
    parse_expression,
)


@pytest.fixture(scope="module")
def conn(spark):
    rows = [
        Row(ts="2024-01-01", uid="C1", id=Row(orig_h="10.0.0.1", orig_p=1234, resp_h="192.168.1.5", resp_p=80),
            proto="tcp", service="http", orig_bytes=100),
        Row(ts="2024-01-02", uid="C2", id=Row(orig_h="10.0.0.2", orig_p=999, resp_h="8.8.8.8", resp_p=53),
            proto="udp", service="dns", orig_bytes=200),
        Row(ts="2024-01-03", uid="C3", id=Row(orig_h="172.16.0.9", orig_p=22, resp_h="10.0.0.1", resp_p=22),
            proto="tcp", service=None, orig_bytes=None),
    ]
    return spark.createDataFrame(rows)


def test_parse_shapes():
    ast = parse_expression('proto == "tcp" && orig_bytes > 50')
    assert ast.__class__.__name__ == "Conjunction"
    pred = parse_expression("orig_h")
    assert isinstance(pred, Predicate) and isinstance(pred.lhs, FieldExtractor)


def test_suffix_field_match(conn):
    # orig_h is a suffix of id.orig_h → matches the nested column
    out = conn.filter(compile_expression('orig_h == "10.0.0.1"', conn))
    assert [r.uid for r in out.collect()] == ["C1"]


def test_disjunction_over_matches(conn):
    # resp_p matches only id.resp_p; equality on 22 hits C3
    out = conn.filter(compile_expression("resp_p == 22", conn))
    assert [r.uid for r in out.collect()] == ["C3"]


def test_bare_field_means_not_null(conn):
    out = conn.filter(compile_expression("service", conn))
    assert sorted(r.uid for r in out.collect()) == ["C1", "C2"]


def test_null_compare(conn):
    out = conn.filter(compile_expression("service == null", conn))
    assert [r.uid for r in out.collect()] == ["C3"]


def test_conjunction_disjunction_negation(conn):
    # negation normalizes into the predicate (expression.cpp De Morgan +
    # operator flip), so `!(service == "http")` ≡ `service != "http"` —
    # and a NULL cell never matches any operator (evaluate.cpp:229),
    # which drops C3 (null service) too
    out = conn.filter(compile_expression('proto == "tcp" && ! (service == "http")', conn))
    assert [r.uid for r in out.collect()] == []
    out_ne = conn.filter(compile_expression('! (service == "dns")', conn))
    assert [r.uid for r in out_ne.collect()] == ["C1"]
    out2 = conn.filter(compile_expression('uid == "C1" || uid == "C2"', conn))
    assert sorted(r.uid for r in out2.collect()) == ["C1", "C2"]


def test_in_list(conn):
    out = conn.filter(compile_expression('proto in ["udp", "icmp"]', conn))
    assert [r.uid for r in out.collect()] == ["C2"]


def test_substring_in(conn):
    # "x ni y" : x contains y
    out = conn.filter(compile_expression('service ni "tt"', conn))
    assert [r.uid for r in out.collect()] == ["C1"]


def test_subnet_containment(conn):
    out = conn.filter(compile_expression("orig_h in 10.0.0.0/8", conn))
    assert sorted(r.uid for r in out.collect()) == ["C1", "C2"]


def test_type_extractor_with_hints(conn):
    binder_expr = compile_expression(
        ":ip == 8.8.8.8", conn,
        type_hints={"id.orig_h": "ip", "id.resp_h": "ip"},
    )
    out = conn.filter(binder_expr)
    assert [r.uid for r in out.collect()] == ["C2"]


def test_type_extractor_int(conn):
    # :int64 > 500 matches any integer column (ports, bytes)
    out = conn.filter(compile_expression(":int64 > 500", conn))
    assert sorted(r.uid for r in out.collect()) == ["C1", "C2"]


def test_unresolvable_is_false(conn):
    out = conn.filter(compile_expression('no_such_field == 1', conn))
    assert out.count() == 0


def test_bare_literal_type_sugar(conn):
    # bare "dns" means :string == "dns" — any string field equals it
    out = conn.filter(compile_expression('"dns"', conn))
    assert [r.uid for r in out.collect()] == ["C2"]


def test_bare_ip_literal_over_untyped_strings(spark):
    """`where 1.2.3.4` / `where 10.0.0.0/8` over schema-on-read data:
    the reference's schemas TYPE address fields as ip, so a bare ip
    literal matches them; with no ip hints declared, the :ip extractor
    falls back to string leaves with value-guarded comparison
    (expressions.md short forms)."""
    df = spark.createDataFrame(
        [("a", "10.0.0.1", "flow"), ("b", "10.0.0.2", "dns"),
         ("c", "172.16.9.9", "alert"), ("d", None, "flow")],
        "uid string, src string, kind string")
    got = df.filter(compile_expression("10.0.0.2", df))
    assert [r.uid for r in got.collect()] == ["b"]
    got = df.filter(compile_expression("10.0.0.0/8", df))
    assert sorted(r.uid for r in got.collect()) == ["a", "b"]
    # non-address strings and nulls never match
    got = df.filter(compile_expression("192.168.0.0/16", df))
    assert got.count() == 0


def test_bare_ip_searches_cef_extension_map(spark):
    """tests.yaml:635 shape: `where <field-pred> && 192.168.101.100` —
    the bare ip reaches the cef extension bag (a map<string,string>
    here; the reference types those extension fields individually)."""
    from tenzir_spark.sources.formats import read_cef

    df = read_cef(spark, "/root/repo/fixtures/events.cef")
    got = df.filter(compile_expression("10.0.0.1", df))
    assert got.count() == 1
    assert got.first()["device_vendor"] == "security"
    got = df.filter(compile_expression(
        'device_vendor == "acme" && 192.168.0.0/16', df))
    assert got.count() == 1
    got = df.filter(compile_expression(
        'device_vendor == "security" && 192.168.0.0/16', df))
    assert got.count() == 0


def test_concept_taxonomy(conn):
    # taxonomy: one concept name fans out to many per-schema fields
    out = conn.filter(compile_expression(
        "source_address == 10.0.0.2", conn,
        concepts={"source_address": ["orig_h", "src_ip"]}))
    assert [r.uid for r in out.collect()] == ["C2"]
    # unknown concept member extractors resolve to nothing -> still works
    out2 = conn.filter(compile_expression(
        "source_address == 8.8.8.8", conn,
        concepts={"source_address": ["orig_h", "no_such"]}))
    assert out2.count() == 0


def test_linear_bound_pushdown(spark, tmp_path):
    """Arithmetic predicates gain a redundant bare-column range that
    reaches parquet PushedFilters; results stay exact (the original
    predicate is conjoined)."""
    import io
    from contextlib import redirect_stdout

    from tenzir_spark import operators as ops

    p = str(tmp_path / "lin.parquet")
    spark.createDataFrame([(i, float(i)) for i in range(1000)], "id long, v double") \
        .write.mode("overwrite").parquet(p)
    df = spark.read.parquet(p)
    out = ops.where(df, "v * 2 + 1 > 501")
    assert out.count() == 1000 - 251  # v > 250
    buf = io.StringIO()
    with redirect_stdout(buf):
        out.explain("formatted")
    plan = buf.getvalue()
    assert "GreaterThanOrEqual(v," in plan  # the redundant bound pushed

    # negative coefficient flips the bound direction
    out2 = ops.where(df, "10 - v * 2 >= 4")   # v <= 3
    assert out2.count() == 4
    # non-linear shapes opt out silently
    out3 = ops.where(df, "v * v > 4")
    assert out3.count() == 1000 - 3


def test_load_concepts_yaml(tmp_path, spark):
    from tenzir_spark.expr import load_concepts
    from pyspark.sql import Row

    p = tmp_path / "taxonomy.yaml"
    p.write_text(
        "concepts:\n"
        "  - concept:\n"
        "      name: source_ip\n"
        "      fields: [orig_h, src_ip]\n")
    concepts = load_concepts(str(p))
    assert concepts == {"source_ip": ["orig_h", "src_ip"]}
    df = spark.createDataFrame([Row(src_ip="10.0.0.1", x=1),
                                Row(src_ip="8.8.8.8", x=2)])
    # concepts thread through compile_expression (and ops.where)
    from tenzir_spark.expr import compile_expression
    pred = compile_expression('source_ip == "8.8.8.8"', df, concepts=concepts)
    assert [r.x for r in df.filter(pred).collect()] == [2]


def test_pattern_literal_full_match(spark):
    """Reference pattern semantics (pattern.cpp:41-51): `== /re/` is a
    FULL match, `in` is a partial search, /re/i is case-insensitive
    (pattern.hpp:41)."""
    from tenzir_spark.operators.transform import where

    df = spark.createDataFrame(
        [("netflow",), ("flow",), ("FLOW",), ("flowing",), (None,)],
        "event_type string")
    got = sorted(r.event_type for r in
                 where(df, "event_type == /.*flow$/").collect())
    assert got == ["flow", "netflow"]
    got_i = sorted(r.event_type for r in
                   where(df, "event_type == /.*FLOW$/i").collect())
    assert got_i == ["FLOW", "flow", "netflow"]
    # != drops null cells like every other operator (evaluate.cpp:229
    # skips null rows before the cell evaluator — negated ops included)
    got_ne = [r.event_type for r in
              where(df, "event_type != /.*flow$/").collect()]
    assert sorted(got_ne) == ["FLOW", "flowing"]
    # `in` searches (PartialMatch): 'flowing' now matches
    got_in = sorted(r.event_type for r in
                    where(df, "event_type in /flow/").collect())
    assert got_in == ["flow", "flowing", "netflow"]


def test_pattern_vs_division_disambiguation(spark):
    """'/' in value position stays arithmetic division: a/2 + b/3 must
    not lex as one pattern literal spanning the middle."""
    from tenzir_spark.operators.transform import where

    df = spark.createDataFrame([(4, 6), (1, 1)], "a int, b int")
    got = [(r.a, r.b) for r in where(df, "a/2 + b/3 >= 4").collect()]
    assert got == [(4, 6)]


def test_schema_id_meta_extractor(spark):
    """#schema_id (tests.yaml:732 'Schema ID Extractor'): a stable
    16-hex fingerprint usable in put and where. Values diverge from the
    reference's C++ type fingerprints by construction; the semantics —
    same schema => same id, equality filters partition the stream —
    are what the test pins."""
    import re as _re

    from tenzir_spark.operators.transform import put, where
    from tenzir_spark.sources.formats import read_cef

    df = read_cef(spark, "/root/repo/fixtures/events.cef")
    from tenzir_spark.expr import compile_operand
    tagged = put(df, fingerprint=compile_operand("#schema_id", df),
                 name=F.col("name"))
    fps = [r.fingerprint for r in tagged.collect()]
    assert len(set(fps)) == 1 and _re.fullmatch(r"[0-9a-f]{16}", fps[0])
    fp = fps[0]
    assert where(df, f'#schema_id == "{fp}"').count() == df.count()
    assert where(df, f'#schema_id != "{fp}"').count() == 0
    # multi-schema frames fold the routing column in: per-_schema ids differ
    from tenzir_spark.sources.formats import read_suricata
    eve = read_suricata(spark, "/root/repo/fixtures/eve.json")
    ids = {(r["_schema"], r["fingerprint"]) for r in
           put(eve, _schema=F.col("_schema"),
               fingerprint=compile_operand("#schema_id", eve)).collect()}
    assert len({i for _, i in ids}) == len({s for s, _ in ids})


def test_ipv6_subnet_containment(spark):
    """IPv6 CIDR containment ('Query Operators' test: `id.orig_h in
    fe80:...::/64`): v6 literals tokenize and containment evaluates via
    the Arrow-batched stdlib path (v4 keeps the JVM fast path)."""
    from tenzir_spark.operators.transform import where

    df = spark.createDataFrame(
        [("fe80:5074:1b53:7e7::10",), ("fe80:5074:1b53:7e8::10",),
         ("192.168.1.5",), (None,)], "h string")
    got = [r.h for r in
           where(df, "h in fe80:5074:1b53:7e7::/64",
                 type_hints={"h": "ip"}).collect()]
    assert got == ["fe80:5074:1b53:7e7::10"]
    got4 = [r.h for r in
            where(df, "h in 192.168.1.0/24", type_hints={"h": "ip"}).collect()]
    assert got4 == ["192.168.1.5"]


def test_pattern_reference_unit_vectors(spark):
    """The reference pattern unit suite (libtenzir/test/pattern.cpp:30-72)
    replayed through the expression surface: `== /re/` is match(),
    `in /re/` is search(), `/re/i` sets the case-insensitive option —
    every vector of the `functionality` and `case insensitive` tests."""
    from tenzir_spark.operators.transform import where

    def match(pat, s):
        df = spark.createDataFrame([(s,)], "v string")
        return where(df, f"v == {pat}").count() == 1

    def search(pat, s):
        df = spark.createDataFrame([(s,)], "v string")
        return where(df, f"v in {pat}").count() == 1

    # TEST(functionality)
    assert match("/[0-9]/", "1")
    assert not match("/[^1]/", "1")
    assert search("/bar/", "foobarbaz")
    assert not search("/bar/", "FOOBARBAZ")
    assert not search("/^bar$/", "foobarbaz")
    assert match(r"/^\w{3}\w{3}\w{3}$/", "foobarbaz")
    assert match(r"/\w+ die Waldfe{2}./", "Holla die Waldfee!")
    assert search(r"/\w+ die Waldfe{2}./", "Holla die Waldfee!")
    assert not match(r"/(\w+ )/", "Holla die Waldfee!")
    assert search(r"/(\w+ )/", "Holla die Waldfee!")
    # TEST(comparison with string): equality both ways is match()
    assert match("/foo.*baz/", "foobarbaz")
    # TEST(case insensitive): all seven case permutations of "bar"
    for s in ("bar", "BAR", "Bar", "bAr", "baR", "BAr", "bAR"):
        assert search("/bar/i", s), s
        assert match("/bar/i", s), s
    # TEST(to pattern): /test/ is case-sensitive, /test/i insensitive
    assert match("/test/", "test") and not match("/test/", "TEST")
    assert match("/test/i", "TEST")


def test_taxonomy_cyclic_concepts(spark):
    """taxonomies.cpp:59-81: concepts referencing each other must
    resolve without divergence, flattening both field lists."""
    from pyspark.sql import Row

    from tenzir_spark.expr import compile_expression

    df = spark.createDataFrame([Row(fo0=1, foM=2, foe=3, bar=4, bax=5),
                                Row(fo0=9, foM=9, foe=9, bar=1, bax=9)])
    concepts = {"foo": ["a.fo0", "b.foM", "x.foe", "bar"],
                "bar": ["a.bar", "b.bax", "foo"]}
    # `foo == 1` expands to the OR over foo's fields AND bar's fields
    # (cycle back into foo expands to nothing); row2 matches only via
    # the referenced concept's field
    assert df.filter(
        compile_expression("foo == 1", df, concepts=concepts)).count() == 2
    # nested resolve also works from the inner concept
    assert df.filter(
        compile_expression("bar == 5", df, concepts=concepts)).count() == 1
