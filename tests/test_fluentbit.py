"""fluent-bit connector: spec-level forward protocol (MessagePack over
TCP) loader/saver run against each other over loopback, plus raw-socket
frames in every forward mode. Reference surface:
plugins/fluent-bit/src/plugin.cpp (timestamp/metadata/message rows);
wire format: Fluentd Forward Protocol Specification v1.
"""

import gzip
import json
import socket
import threading

import pytest

from tenzir_spark.sources.fluentbit import (
    EventTime,
    decode_forward_message,
    load_forward,
    msgpack_decode,
    msgpack_encode,
    save_forward,
)


def _free_port() -> int:
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_msgpack_round_trip():
    cases = [
        None, True, False, 0, 1, 127, 128, 2**40, -1, -32, -33, -2**40,
        1.5, "", "hi", "x" * 100, b"\x00\xff", [], [1, [2, 3], "a"],
        {}, {"k": "v", "n": {"m": [1, None]}},
    ]
    for obj in cases:
        enc = msgpack_encode(obj)
        dec, off = msgpack_decode(enc)
        assert dec == obj, obj
        assert off == len(enc)
    t = EventTime(1700000000, 250_000_000)
    dec, _ = msgpack_decode(msgpack_encode(t))
    assert isinstance(dec, EventTime)
    assert dec.seconds() == pytest.approx(1700000000.25)


def test_message_mode():
    rows, opt = decode_forward_message(
        ["app.log", 1700000000, {"msg": "hello", "level": 3}])
    assert len(rows) == 1
    assert rows[0]["tag"] == "app.log"
    assert rows[0]["timestamp"] == 1700000000.0
    assert rows[0]["message"] == {"msg": "hello", "level": 3}
    assert opt is None


def test_forward_mode_with_eventtime():
    msg = ["t", [[EventTime(100, 500_000_000), {"a": 1}], [101, {"a": 2}]],
           {"size": 2}]
    rows, opt = decode_forward_message(msg)
    assert [r["timestamp"] for r in rows] == [100.5, 101.0]
    assert opt == {"size": 2}


def test_packed_forward_modes():
    entries = b"".join(msgpack_encode([100 + i, {"i": i}]) for i in range(3))
    rows, _ = decode_forward_message(["t", entries])
    assert [r["message"]["i"] for r in rows] == [0, 1, 2]
    # compressed variant
    rows, opt = decode_forward_message(
        ["t", gzip.compress(entries), {"compressed": "gzip", "size": 3}])
    assert [r["message"]["i"] for r in rows] == [0, 1, 2]


def test_packed_forward_str_typed_payload():
    """Spec-legal clients may type the PackedForward payload as msgpack
    str rather than bin. The decoder's utf-8 pass must stay byte-lossless
    through re-encode — multibyte UTF-8 AND invalid-UTF-8 bytes in the
    payload both previously aborted load_forward (latin-1 re-encode
    raised UnicodeEncodeError)."""
    import struct

    entries = b"".join(
        msgpack_encode([100 + i, {"msg": "café", "i": i}])
        for i in range(3))
    # wrap the payload in a str32 header instead of bin32
    as_str = struct.pack(">BI", 0xDB, len(entries)) + entries
    wire = msgpack_encode(["t", None]).replace(b"\xc0", as_str, 1)
    msg, _ = msgpack_decode(wire)
    assert isinstance(msg[1], str)
    rows, _ = decode_forward_message(msg)
    assert [r["message"]["i"] for r in rows] == [0, 1, 2]
    assert rows[0]["message"]["msg"] == "café"
    # invalid-UTF-8 bytes inside the str-typed payload survive too
    raw = msgpack_encode([100, {"k": 1}]) + b"\xff\xfe"  # trailing garbage
    as_str = struct.pack(">BI", 0xDB, len(raw)) + raw
    msg, _ = msgpack_decode(msgpack_encode(["t", None]).replace(b"\xc0", as_str, 1))
    payload = msg[1].encode("utf-8", "surrogateescape")
    assert payload == raw  # byte-identical round trip


def test_loopback_with_ack():
    """save_forward ships one chunk'd Forward message; load_forward must
    decode it, reply the ack (at-least-once), and spool NDJSON rows in
    the reference's timestamp/metadata/message shape."""
    port = _free_port()
    results: dict = {}

    def client():
        try:
            results["sent"] = save_forward(
                [(1700000000.5, {"msg": "a"}), (1700000001.0, {"msg": "b"})],
                f"tcp://127.0.0.1:{port}", tag="pytest.fwd")
        except Exception as e:
            results["error"] = e

    t = threading.Thread(target=client, daemon=True)
    t.start()
    spool = load_forward(f"tcp://127.0.0.1:{port}", n_events=2, timeout=15)
    t.join(timeout=15)
    assert "error" not in results, results.get("error")
    assert results["sent"] == 2  # ack received — client did not raise
    rows = [json.loads(line) for line in open(spool)]
    assert [r["message"]["msg"] for r in rows] == ["a", "b"]
    assert rows[0]["tag"] == "pytest.fwd"
    assert rows[0]["timestamp"] == pytest.approx(1700000000.5)
    assert set(rows[0]) == {"tag", "timestamp", "metadata", "message"}


def test_raw_socket_message_mode():
    """An agent sending plain Message-mode frames (no ack) lands rows."""
    port = _free_port()

    def client():
        import time
        deadline = time.monotonic() + 10
        while True:
            try:
                s = socket.create_connection(("127.0.0.1", port), timeout=10)
                break
            except OSError:
                if time.monotonic() >= deadline:
                    raise
                time.sleep(0.05)
        with s:
            s.sendall(msgpack_encode(["raw.tag", 42, {"k": "v"}]))

    t = threading.Thread(target=client, daemon=True)
    t.start()
    spool = load_forward(f"tcp://127.0.0.1:{port}", n_events=1, timeout=15)
    t.join(timeout=10)
    rows = [json.loads(line) for line in open(spool)]
    assert rows == [{"tag": "raw.tag", "timestamp": 42.0,
                     "metadata": {}, "message": {"k": "v"}}]


def test_tql_fluent_bit_source_and_sink(spark):
    """`... | fluent-bit forward host=... port=...` publishing into
    `fluent-bit forward listen=... port=... | ...` — the reference's
    operator spelling (plugin.cpp:548) at both pipeline ends."""
    from tenzir_spark.plans.tql import exec_pipeline

    port = _free_port()
    results: dict = {}

    def producer():
        try:
            src = spark.createDataFrame([(1, "x"), (2, "y")], "a int, b string")
            results["out"] = exec_pipeline(
                f"fluent-bit forward host=127.0.0.1 port={port} "
                f"tag=tql.test", spark=spark, source=src)
        except Exception as e:
            results["error"] = e

    t = threading.Thread(target=producer, daemon=True)
    t.start()
    df = exec_pipeline(
        f"fluent-bit forward listen=127.0.0.1 port={port} count=2 "
        f"timeout=15 | select tag, message | sort message.a", spark=spark)
    t.join(timeout=15)
    assert "error" not in results, results.get("error")
    assert results["out"] == 2
    rows = df.collect()
    assert [r["message"]["a"] for r in rows] == [1, 2]
    assert rows[0]["tag"] == "tql.test"


def test_tql_unsupported_plugin_raises(spark):
    from tenzir_spark.plans.tql import parse_pipeline
    with pytest.raises(NotImplementedError, match="fluent-bit"):
        parse_pipeline("fluent-bit splunk host=x | pass", spark=spark)


# ---------------------------------------------------------------- natives
# The reference embeds libfluent-bit and its integration suite
# (plugins/fluent-bit/integration/tests.sh + reference/fluentbit/
# step_00.ref) drives five plugins beyond `forward`: random + stdin
# sources, stdout/null/counter sinks. Those are implemented natively
# (sources/fluentbit.py); this replay pins our output against the
# reference's recorded stdout, applying the same `cut` trims its
# script does for determinism.

import contextlib
import io
import os

_REF_FLB = "/root/reference/plugins/fluent-bit/integration"


@pytest.mark.skipif(not os.path.isdir(_REF_FLB),
                    reason="reference tree not present")
def test_reference_fluentbit_suite_replay(spark, monkeypatch):
    from tenzir_spark.plans.tql import parse_pipeline, run_pipeline

    golden = open(os.path.join(
        _REF_FLB, "reference/fluentbit/step_00.ref")).read().splitlines()

    # `fluent-bit please-do-not-crash` errors without crashing (the
    # script runs it under `|| true`)
    with pytest.raises(NotImplementedError, match="please-do-not-crash"):
        parse_pipeline("fluent-bit please-do-not-crash", spark=spark)

    # `fluent-bit random | head 1 | put schema=#schema`
    p = parse_pipeline("fluent-bit random | head 1 | put schema=#schema",
                       spark=spark)
    rows = [r.asDict(recursive=True) for r in p.df.collect()]
    assert rows == [json.loads("".join(golden[0:3]))] == \
        [{"schema": "tenzir.fluentbit"}]

    # `echo '{"foo": {"bar": 42}}' | tenzir 'fluent-bit stdin | drop
    # timestamp'`
    monkeypatch.setattr("sys.stdin", io.StringIO('{"foo": {"bar": 42}}\n'))
    p = parse_pipeline("fluent-bit stdin | drop timestamp", spark=spark)
    rows = [r.asDict(recursive=True) for r in p.df.collect()]
    assert rows == [json.loads("".join(golden[3:10]))] == \
        [{"message": {"foo": {"bar": 42}}}]

    # `show operators | fluent-bit null` — no output
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        run_pipeline(parse_pipeline("show operators | fluent-bit null",
                                    spark=spark))
    assert buf.getvalue() == ""

    # `show operators | where name == "unique" | fluent-bit stdout`,
    # trimmed with `cut -d ' ' -f 5-`
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        run_pipeline(parse_pipeline(
            'show operators | where name == "unique" | fluent-bit stdout',
            spark=spark))
    lines = buf.getvalue().splitlines()
    assert [" ".join(ln.split(" ")[4:]) for ln in lines] == [golden[10]]

    # `show operators | head | fluent-bit counter`, `cut -d , -f 2`
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        run_pipeline(parse_pipeline("show operators | head | fluent-bit "
                                    "counter", spark=spark))
    lines = buf.getvalue().splitlines()
    assert [ln.split(",", 1)[1] for ln in lines] == [golden[11]]
