"""Property-based tests (hypothesis) — beyond the reference's test
strategy (SURVEY §5 notes it has none): random inputs pin the expression
compiler's arithmetic against Python's own evaluation, and the
uniq/dedup operators against their obvious sequential models.

Spark-session work per example is expensive, so each property batches
all generated cases into ONE DataFrame evaluation.
"""

from __future__ import annotations

import itertools

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import Row
from pyspark.sql import functions as F

from tenzir_spark import operators as ops
from tenzir_spark.expr import compile_operand

_settings = settings(max_examples=20, deadline=None,
                     suppress_health_check=[HealthCheck.function_scoped_fixture])


# ---------------------------------------------------------- arithmetic

@st.composite
def arith_expr(draw, depth=0):
    """Random integer arithmetic over columns a, b and small literals
    (nonnegative operands; + - * only, so Python and Spark agree exactly
    — / is float-div in both but rounding repr differs, % differs on
    negatives)."""
    if depth >= 3 or draw(st.booleans()):
        return draw(st.sampled_from(["a", "b", "1", "2", "3", "7", "10"]))
    op = draw(st.sampled_from(["+", "-", "*"]))
    lhs = draw(arith_expr(depth=depth + 1))
    rhs = draw(arith_expr(depth=depth + 1))
    return f"({lhs} {op} {rhs})"


@_settings
@given(st.lists(arith_expr(), min_size=1, max_size=8),
       st.integers(0, 50), st.integers(0, 50))
def test_arithmetic_matches_python(spark, exprs, a, b):
    df = spark.createDataFrame([Row(a=a, b=b)])
    cols = [compile_operand(e, df).alias(f"e{i}") for i, e in enumerate(exprs)]
    row = df.select(*cols).collect()[0]
    for i, e in enumerate(exprs):
        expected = eval(e, {}, {"a": a, "b": b})  # noqa: S307 — generated grammar only
        assert row[i] == expected, f"{e} with a={a} b={b}"


# ------------------------------------------------------------- unique

@_settings
@given(st.lists(st.integers(0, 3), min_size=1, max_size=40))
def test_unique_adjacent_matches_groupby_model(spark, seq):
    df = spark.createDataFrame(
        [Row(i=i, v=v) for i, v in enumerate(seq)])
    out = ops.unique(df, order_by="i", compare_cols=["v"])
    got = [r.v for r in out.orderBy("i").collect()]
    expected = [k for k, _ in itertools.groupby(seq)]
    assert got == expected


# ---------------------------------------------------------- deduplicate

@_settings
@given(st.lists(st.tuples(st.integers(0, 5), st.integers(0, 1000)),
                min_size=1, max_size=40, unique_by=lambda t: t[1]))
def test_deduplicate_keeps_max_lsn(spark, rows):
    df = spark.createDataFrame([Row(k=k, lsn=lsn, payload=f"p{lsn}")
                                for k, lsn in rows])
    out = {r.k: (r.lsn, r.payload) for r in ops.deduplicate(df, "k", "lsn").collect()}
    expected = {}
    for k, lsn in rows:
        if k not in expected or lsn > expected[k]:
            expected[k] = lsn
    assert {k: v[0] for k, v in out.items()} == expected
    assert all(v[1] == f"p{v[0]}" for v in out.values())  # payload rides along
