"""Tests of the pure-Python replay oracle itself (no Spark) — the oracle
must be trustworthy for the equality gate to mean anything."""

from __future__ import annotations

import json

from tenzir_spark.cdc.extract import extract_text
from tenzir_spark.cdc.replay import replay


def _row(lsn, op, url=None, html=None, lang=None, warc_ts=None, desc=None):
    return {"lsn": lsn, "op": op, "url": url, "html": html, "lang": lang,
            "warc_ts": warc_ts, "schema_descriptor": desc}


def test_last_writer_wins_and_delete():
    rows = [
        _row(1, "insert", "a", b"<p>one</p>"),
        _row(3, "update", "a", b"<p>three</p>"),
        _row(2, "update", "a", b"<p>two</p>"),
        _row(4, "insert", "b", b"<p>bee</p>"),
        _row(5, "delete", "b"),
    ]
    state, cols = replay(rows)
    assert set(state) == {"a"}
    assert state["a"]["text"] == "three"


def test_out_of_order_input_is_sorted_by_lsn():
    rows = [_row(9, "update", "x", b"<p>late</p>"), _row(1, "insert", "x", b"<p>early</p>")]
    state, _ = replay(list(reversed(rows)))
    assert state["x"]["text"] == "late"


def test_schema_add_and_rename():
    rows = [
        _row(1, "insert", "a", b"<p>t</p>", lang="en"),
        _row(2, "schema", desc=json.dumps({"type": "add", "name": "tags"})),
        _row(3, "schema", desc=json.dumps({"type": "rename", "from": "lang", "to": "language"})),
        _row(4, "insert", "b", b"<p>u</p>", lang="de"),
    ]
    state, cols = replay(rows)
    assert "tags" in cols and "language" in cols and "lang" not in cols
    assert state["a"]["language"] == "en"  # renamed in place
    assert state["a"]["tags"] is None


def test_delete_then_reinsert():
    rows = [
        _row(1, "insert", "k", b"<p>v1</p>"),
        _row(2, "delete", "k"),
        _row(3, "update", "k", b"<p>v2</p>"),  # upsert semantics revive it
    ]
    state, _ = replay(rows)
    assert state["k"]["text"] == "v2"


def test_extract_text_edge_cases():
    assert extract_text(None) is None
    assert extract_text(b"") == ""
    assert extract_text(b"<html><script>x<y</script><p>ok</p></html>") == "ok"
    assert extract_text(b"<p>a&amp;b   c</p>") == "a&b c"
    assert extract_text(b"plain no tags") == "plain no tags"
    # invalid utf-8 is replaced deterministically
    out = extract_text(b"<p>\xff\xfe</p>")
    assert out == "��"
