"""Pure parser tests (no Spark session) — tokenizer/AST shapes,
literal typing, duration/time/subnet recognition (reference:
web/docs/language/expressions.md)."""

from __future__ import annotations

import pytest

from tenzir_spark.expr import (
    Conjunction,
    Disjunction,
    FieldExtractor,
    Literal,
    MetaExtractor,
    Negation,
    Predicate,
    TypeExtractor,
    parse_expression,
    tokenize,
)


def test_precedence_or_lowest():
    ast = parse_expression("a == 1 && b == 2 || c == 3")
    assert isinstance(ast, Disjunction)
    assert isinstance(ast.parts[0], Conjunction)


def test_parens_override():
    ast = parse_expression("a == 1 && (b == 2 || c == 3)")
    assert isinstance(ast, Conjunction)
    assert isinstance(ast.parts[1], Disjunction)


def test_negation_nests():
    ast = parse_expression("! ! a == 1")
    assert isinstance(ast, Negation) and isinstance(ast.inner, Negation)


def test_duration_literals():
    for text, ns in [("10s", 10_000_000_000), ("1.5ms", 1_500_000),
                     ("2h", 7_200_000_000_000), ("3d", 259_200_000_000_000)]:
        pred = parse_expression(f"dur > {text}")
        assert pred.rhs == Literal(ns, "duration"), text


def test_time_literal():
    pred = parse_expression("ts >= 2024-01-15T10:30:00")
    assert pred.rhs.type_name == "time"


def test_subnet_and_ip_literals():
    p1 = parse_expression("orig_h in 10.0.0.0/8")
    assert p1.rhs == Literal("10.0.0.0/8", "subnet")
    p2 = parse_expression("orig_h == 192.168.1.1")
    assert p2.rhs == Literal("192.168.1.1", "ip")
    p3 = parse_expression("x == ::1")
    assert p3.rhs.type_name == "ip"


def test_meta_and_type_extractors():
    p = parse_expression('#schema == "zeek.conn"')
    assert isinstance(p.lhs, MetaExtractor) and p.lhs.name == "schema"
    p2 = parse_expression(":timestamp > 2020-01-01")
    assert isinstance(p2.lhs, TypeExtractor)


def test_list_literal():
    p = parse_expression('proto in ["tcp", "udp", 53]')
    assert p.rhs.value == ["tcp", "udp", 53]


def test_string_escapes():
    p = parse_expression(r'msg == "a\"b\nc"')
    assert p.rhs.value == 'a"b\nc'


def test_relop_flip_on_literal_lhs():
    # literal-first predicates are normalized at bind time; parser keeps shape
    p = parse_expression("5 < x")
    assert isinstance(p.lhs, Literal) and isinstance(p.rhs, FieldExtractor)


def test_bad_input_raises():
    with pytest.raises(ValueError):
        parse_expression("a ==")
    with pytest.raises(ValueError):
        parse_expression("a == 1 &&")
    with pytest.raises(ValueError):
        parse_expression("(a == 1")
    with pytest.raises(ValueError):
        tokenize("a == $$$")


def test_nested_dotted_suffix():
    p = parse_expression("id.orig_h == 10.0.0.1")
    assert p.lhs == FieldExtractor("id.orig_h")


# --------------- expression_parseable.cpp behavioral replay
# (libtenzir/test/expression_parseable.cpp) — the parse-tree checks
# there are AST-shape assertions; here each contract is replayed
# behaviorally through compile_expression over a live frame.

def _count(spark, df, text):
    from tenzir_spark.expr import compile_expression

    return df.filter(compile_expression(text, df)).count()


@pytest.fixture()
def _frame(spark):
    from pyspark.sql import Row

    return spark.createDataFrame(
        [Row(x=42, a=5, b=3, s=None), Row(x=1, a=1, b=9, s="v")])


def test_ref_precedence_and_over_or(spark, _frame):
    # expression_parseable.cpp:154-156: && binds tighter than ||
    assert _count(spark, _frame, "x == 42 && a > b || a < b && x == 1") == 2
    # with OR-first grouping it would be ((42||a<b) && x==1) -> 1 row
    assert _count(spark, _frame, "(x == 42 && a > b) || (a < b && x == 1)") == 2


def test_ref_negation_forms(spark, _frame):
    # :143-146
    assert _count(spark, _frame, "! x == 42") == 1
    assert _count(spark, _frame, "!(x == 42 || a > b)") == 1
    # :148-151 redundant parentheses
    assert _count(spark, _frame, "((x == 42))") == 1


def test_ref_value_only_predicate(spark, _frame):
    # :164-175 — a bare value is sugar for `:uint64 == 42`
    assert _count(spark, _frame, "42") == 1


def test_ref_field_extractor_predicate(spark, _frame):
    # :177-187 — a bare field is sugar for `field != null`
    assert _count(spark, _frame, "s") == 1


def test_ref_stray_dot_rejected(spark):
    # :157-161 — leading-dot field must fail to parse
    with pytest.raises(ValueError):
        parse_expression('#schema == "suricata.http" && .community_id == "x"')


def test_ref_comments_inside_expressions(spark, _frame):
    # :214-230 — /* */ is whitespace anywhere between tokens,
    # non-nesting (the first */ closes), incl. the pathological forms
    assert _count(spark, _frame, "x == 42 /* c */ && a > b") == 1
    assert _count(spark, _frame, "x/**/==/******/42") == 1
    assert _count(spark, _frame,
                  "x == 1 /*/*fo* /*/|| a > b") == 2
    assert _count(spark, _frame,
                  'x == 42/* && s != null */&& a > b') == 1


def test_ref_record_and_map_literals():
    # parse_data.cpp:52-75 — record literals (named, ordered with ""
    # names, nested) and map literals (k->v entries)
    assert parse_expression("x == <>").rhs == Literal([], "record")
    assert parse_expression("x == <foo: 1>").rhs == \
        Literal([("foo", 1)], "record")
    assert parse_expression("x == <foo: 1, bar: <baz: 3>>").rhs == \
        Literal([("foo", 1), ("bar", [("baz", 3)])], "record")
    assert parse_expression("baz != <_, 3.0>").rhs == \
        Literal([("", None), ("", 3.0)], "record")
    assert parse_expression("m == {}").rhs == Literal([], "map")
    assert parse_expression("m == {+1->true,+2->false}").rhs == \
        Literal([(1, True), (2, False)], "map")
    assert parse_expression("m == {-1 -> true, -2 -> false}").rhs == \
        Literal([(-1, True), (-2, False)], "map")


def test_record_literal_compare_behavioral(spark):
    from pyspark.sql import Row

    from tenzir_spark.expr import compile_expression

    df = spark.createDataFrame([Row(x=Row(foo=1, bar=2), y=1),
                                Row(x=Row(foo=9, bar=9), y=2)])
    assert df.filter(
        compile_expression("x == <foo: 1, bar: 2>", df)).count() == 1
    # the full comment-suite vector parses and compiles with a missing
    # field (the reference drops unresolved extractors the same way)
    assert df.filter(compile_expression(
        '#schema == "foo" && (foo.bar != [1, 2, 3] || baz != <_, 3.0>)',
        df)).count() == 0


def test_complex_literal_comparison_semantics(spark):
    """Type-incompatible complex comparisons follow the reference's
    data semantics (unequal, never an analysis error), null cells never
    match, and compatible struct/map literals compare structurally."""
    from pyspark.sql import types as T

    from tenzir_spark.expr import compile_expression

    schema = T.StructType([
        T.StructField("x", T.StructType([
            T.StructField("foo", T.LongType()),
            T.StructField("bar", T.LongType())])),
        T.StructField("m", T.MapType(T.LongType(), T.BooleanType())),
        T.StructField("y", T.LongType()),
    ])
    df = spark.createDataFrame(
        [({"foo": 1, "bar": 2}, {1: True, 2: False}, 1),
         (None, None, 2)], schema)

    def count(text):
        return df.filter(compile_expression(text, df)).count()

    # scalar vs struct column: unequal, not a crash
    assert count('x == "GET"') == 0
    # same-kind incompatibility (wrong field name): unequal
    assert count("x == <zap: 1>") == 0
    assert count("x != <zap: 1>") == 1  # only the non-null cell
    # null cells never match, even <> / empty-map equality
    assert count("x == <>") == 0
    assert count("m == {}") == 0
    # structural equality: named, ordered-positional, nested-mismatch
    assert count("x == <foo: 1, bar: 2>") == 1
    assert count("x == <1, 2>") == 1
    assert count("x == <_, 2>") == 0
    assert count("x == <foo: 1, bar: <baz: 3>>") == 0
    assert count("x != <foo: 1, bar: <baz: 3>>") == 1
    # map literals compare against real map columns (sorted entries)
    assert count("m == {+1->true,+2->false}") == 1
    assert count("m != {+1->true}") == 1
    # no-space colon before a letter value
    assert count("y == 1 && x != <foo:true, bar:2>") == 1


def test_sigma_and_summarize_keep_leaf_resolution(spark):
    """Struct-root resolution is predicate-only: a sigma field or
    summarize key naming a struct root must not resolve to the whole
    struct column (the reference evaluates record operands in those
    positions to no-match)."""
    from pyspark.sql import types as T

    from tenzir_spark.expr import Binder

    schema = T.StructType([
        T.StructField("http", T.StructType([
            T.StructField("host", T.StringType())])),
    ])
    b = Binder(schema)
    assert b.field_matches("http") == []            # leaf-only default
    assert b.field_matches("http", roots=True) == ["http"]
    assert b.field_matches("http.host") == ["http.host"]


def test_hour_only_timezone_in_time_literal():
    # the exact time.cpp vector form previously split as arithmetic
    p = parse_expression("ts < 2012-08-12+23:55:04.001234-01")
    assert p.rhs == Literal("2012-08-12+23:55:04.001234-01", "time")
