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


# ------------------------------------------------------ round-4 parsers

json_scalars = st.one_of(st.none(), st.booleans(),
                         st.integers(min_value=-2**62, max_value=2**63 - 1),
                         st.floats(allow_nan=False, allow_infinity=False),
                         st.text(max_size=40))
json_values = st.recursive(
    json_scalars,
    lambda inner: st.one_of(
        st.lists(inner, max_size=5),
        st.dictionaries(st.text(max_size=10), inner, max_size=5)),
    max_leaves=12)


@given(json_values)
@settings(max_examples=200, deadline=None)
def test_msgpack_round_trip_property(v):
    """The from-spec MessagePack codec round-trips every JSON-shaped
    value the forward protocol can carry."""
    from tenzir_spark.sources.fluentbit import msgpack_decode, msgpack_encode

    enc = msgpack_encode(v)
    dec, off = msgpack_decode(enc)
    assert off == len(enc)
    assert dec == v


@given(st.binary(max_size=120))
@settings(max_examples=200, deadline=None)
def test_msgpack_decoder_never_hangs_on_garbage(buf):
    """Adversarial bytes either decode, signal incompleteness, or raise
    a clean ValueError — never loop or crash the interpreter."""
    from tenzir_spark.sources.fluentbit import _Incomplete, msgpack_decode

    try:
        _, off = msgpack_decode(buf)
        assert 0 < off <= len(buf)
    except (_Incomplete, ValueError, UnicodeDecodeError):
        pass


@given(st.text(max_size=200).filter(lambda s: "\n" not in s))
@settings(max_examples=300, deadline=None)
def test_syslog_line_parser_total(line):
    """The RFC 5424 line parser is TOTAL: every input yields either a
    parsed rfc5424 row or the syslog.unknown fallback — no exceptions
    (the reference's multi_schema_reader falls back the same way,
    syslog.cpp:130-141)."""
    from tenzir_spark.sources.formats import _parse_syslog_line

    row = _parse_syslog_line(line)
    assert row["_schema"] in ("syslog.rfc5424", "syslog.unknown")
    if row["_schema"] == "syslog.unknown":
        assert row["syslog_message"] == line
    else:
        assert 0 <= row["facility"] <= 23 and 0 <= row["severity"] <= 7


# ------------------------------------------------- predicate fuzz vs model
#
# Random boolean TQL expressions over a schema with NULLs, checked
# against an independent model of the reference's DEFINITE-BITMAP
# semantics: a null cell never matches any relational operator —
# negated ones included (evaluate.cpp:229 skips null rows before the
# cell evaluator) — negation distributes into predicates by De Morgan +
# operator flipping (expression.cpp normalization), a bare field means
# "exists and is not null", and a WHERE keeps rows whose bit is TRUE.

_PRED_ROWS = [
    (0, None, None, None),
    (1, 0, 0.0, "a"),
    (2, 1, 1.5, "b"),
    (3, 2, 2.5, "cat"),
    (4, 3, 2.5, "dog"),
    (5, 5, 4.0, "a"),
    (6, None, 1.5, "cat"),
    (7, 3, None, "b"),
    (8, 1, 4.0, None),
    (9, 2, 0.0, "dog"),
]
_INT_LITS = [0, 1, 2, 3, 5]
_DBL_LITS = [0.0, 1.5, 2.5, 4.0]
_STR_LITS = ["a", "b", "cat", "dog"]
_CMP_OPS = ["==", "!=", "<", "<=", ">", ">="]


@st.composite
def predicate_ast(draw, depth=0):
    if depth >= 3 or draw(st.booleans()):
        kind = draw(st.sampled_from(
            ["cmp_i", "cmp_d", "cmp_s", "in_i", "in_s", "bare_i", "bare_s"]))
        if kind.startswith("cmp"):
            fld, lits = {"cmp_i": ("i", _INT_LITS), "cmp_d": ("d", _DBL_LITS),
                         "cmp_s": ("s", _STR_LITS)}[kind]
            return ("cmp", fld, draw(st.sampled_from(_CMP_OPS)),
                    draw(st.sampled_from(lits)))
        if kind.startswith("in"):
            fld, lits = {"in_i": ("i", _INT_LITS), "in_s": ("s", _STR_LITS)}[kind]
            return ("in", fld, draw(st.lists(st.sampled_from(lits),
                                             min_size=1, max_size=3,
                                             unique=True)))
        return ("bare", kind.split("_")[1])
    form = draw(st.sampled_from(["and", "or", "not"]))
    if form == "not":
        return ("not", draw(predicate_ast(depth=depth + 1)))
    return (form, draw(predicate_ast(depth=depth + 1)),
            draw(predicate_ast(depth=depth + 1)))


def _pred_text(node):
    tag = node[0]
    if tag == "cmp":
        _, fld, op, lit = node
        lit_s = f'"{lit}"' if isinstance(lit, str) else repr(lit)
        return f"({fld} {op} {lit_s})"
    if tag == "in":
        _, fld, lits = node
        body = ", ".join(f'"{x}"' if isinstance(x, str) else repr(x)
                         for x in lits)
        return f"({fld} in [{body}])"
    if tag == "bare":
        return node[1]
    if tag == "not":
        return f"! {_pred_text(node[1])}"
    joiner = " && " if tag == "and" else " || "
    return f"({_pred_text(node[1])}{joiner}{_pred_text(node[2])})"


_CMP_FN = {"==": lambda v, l: v == l, "!=": lambda v, l: v != l,
           "<": lambda v, l: v < l, "<=": lambda v, l: v <= l,
           ">": lambda v, l: v > l, ">=": lambda v, l: v >= l}


def _pred_eval(node, row, negated=False):
    """Definite-bitmap model; always returns True/False. ``negated``
    threads a pending `!` down to the predicate level, exactly like the
    reference's normalizer (De Morgan + operator flip) — so null cells
    stay FALSE under negation too."""
    i, d, s = row[1], row[2], row[3]
    env = {"i": i, "d": d, "s": s}
    tag = node[0]
    if tag == "cmp":
        _, fld, op, lit = node
        v = env[fld]
        if v is None:
            return False  # evaluate.cpp:229 — null never matches
        hit = _CMP_FN[op](v, lit)
        return (not hit) if negated else hit
    if tag == "in":
        _, fld, lits = node
        v = env[fld]
        if v is None:
            return False
        return (v not in lits) if negated else (v in lits)
    if tag == "bare":
        # bare-field exists-predicate; its negation is the residual
        # two-valued ~coalesce path (null -> True under `!`)
        exists = env[node[1]] is not None
        return (not exists) if negated else exists
    if tag == "not":
        return _pred_eval(node[1], row, negated=not negated)
    a_and = (tag == "and") != negated  # De Morgan under a pending `!`
    a = _pred_eval(node[1], row, negated=negated)
    b = _pred_eval(node[2], row, negated=negated)
    return (a and b) if a_and else (a or b)


@_settings
@given(predicate_ast())
def test_random_predicates_match_bitmap_model(spark, ast):
    from tenzir_spark.expr import compile_expression

    text = _pred_text(ast)
    df = spark.createDataFrame(_PRED_ROWS, "id long, i long, d double, s string")
    kept = {r.id for r in df.filter(compile_expression(text, df)).collect()}
    want = {row[0] for row in _PRED_ROWS if _pred_eval(ast, row) is True}
    assert kept == want, f"{text}: spark={sorted(kept)} model={sorted(want)}"


@given(st.text(max_size=80))
@settings(max_examples=300, deadline=None)
def test_expression_parser_total_on_garbage(text):
    """parse_expression is total: any input either yields an AST or
    raises a clean ValueError — no hangs, no interpreter errors."""
    from tenzir_spark.expr import parse_expression

    try:
        parse_expression(text)
    except ValueError:
        pass


@given(predicate_ast(), st.integers(0, 200), st.sampled_from(
    ["", "(", ")", "!", "&&", "||", '"', "[", "]", " in ", "== ="]))
@settings(max_examples=150, deadline=None)
def test_expression_parser_total_on_mutations(ast, pos, junk):
    """Near-valid inputs (valid expression with junk spliced in) also
    parse or raise ValueError — exercises deeper parser states than
    uniform random text reaches."""
    from tenzir_spark.expr import parse_expression

    text = _pred_text(ast)
    mutated = text[: pos % (len(text) + 1)] + junk + text[pos % (len(text) + 1):]
    try:
        parse_expression(mutated)
    except ValueError:
        pass


# ------------------------------------------------- kafka RecordBatch v2

_kv = st.one_of(st.none(), st.binary(max_size=64))
_hdrs = st.lists(
    st.tuples(st.text(min_size=1, max_size=12), st.binary(max_size=16)),
    max_size=3)


@settings(max_examples=60, deadline=None)
@given(st.lists(st.tuples(_kv, _kv), min_size=1, max_size=12),
       st.integers(0, 2**40), st.integers(0, 2**31 - 1), _hdrs)
def test_kafka_record_batch_round_trip(records, base_ts, base_off, headers):
    """encode_record_batch -> decode_record_batches is the identity on
    (key, value) payloads, offsets and timestamps — the CRC32C seal and
    all varint/zigzag field codecs exercised with arbitrary byte
    payloads (incl. None keys/values and record headers)."""
    from tenzir_spark.sources.kafka_wire import (decode_record_batches,
                                                 encode_record_batch)
    batch = encode_record_batch(base_off, records, base_ts, headers=headers)
    out = decode_record_batches(batch)
    assert [(r.key, r.value) for r in out] == records
    assert [r.offset for r in out] == [base_off + i
                                       for i in range(len(records))]
    assert all(r.timestamp == base_ts for r in out)
    # headers survive too (null header values decode as b"")
    assert all(r.headers == [(k, v) for k, v in headers] for r in out)


@settings(max_examples=40, deadline=None)
@given(st.lists(st.tuples(_kv, _kv), min_size=1, max_size=6),
       st.integers(0, 10_000), st.data())
def test_kafka_crc_rejects_payload_corruption(records, base_ts, data):
    """Any single-byte corruption inside the CRC-covered section
    (attributes..records, i.e. everything after byte 21) must raise —
    the integrity contract a consumer relies on at fetch time."""
    from tenzir_spark.sources.kafka_wire import (decode_record_batches,
                                                 encode_record_batch)
    batch = bytearray(encode_record_batch(0, records, base_ts))
    pos = data.draw(st.integers(21, len(batch) - 1))
    delta = data.draw(st.integers(1, 255))
    batch[pos] = (batch[pos] + delta) % 256
    with pytest.raises((ValueError, NotImplementedError)):
        decode_record_batches(bytes(batch))


# ---------------------------------------------------------------- HPACK

_hname = st.text(alphabet="abcdefghijklmnopqrstuvwxyz-", min_size=1,
                 max_size=16)
_hval = st.text(
    alphabet=st.characters(min_codepoint=0x20, max_codepoint=0x7E),
    max_size=24)


@settings(max_examples=60, deadline=None)
@given(st.lists(st.tuples(_hname, _hval), min_size=1, max_size=10))
def test_hpack_encode_decode_round_trip(headers):
    """HpackEncoder -> HpackDecoder is the identity on arbitrary header
    lists — static-table hits (indexed and name-indexed forms) and
    literal emission both land on the same decoded pairs, with fresh
    codec state per message (the encoder is stateless by design)."""
    from tenzir_spark.sources.grpc_client import HpackDecoder, HpackEncoder
    wire = HpackEncoder().encode(headers)
    assert HpackDecoder().decode(wire) == headers
