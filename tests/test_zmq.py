"""zmq connector: pure-stdlib ZMTP 3.0 (NULL mechanism) loader/saver
run against each other over loopback (reference surface:
web/docs/connectors/zmq.md — SUB loader connects, PUB saver binds,
--filter prefix subscription, default endpoint)."""

import socket
import threading

import pytest

from tenzir_spark.sources.zmq import load_zmq, save_zmq


def _free_port() -> int:
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def _pub(lines, port, results):
    try:
        results["sent"] = save_zmq(lines, f"tcp://127.0.0.1:{port}",
                                   bind=True, timeout=15)
    except Exception as e:  # surfaced by the main thread's assert
        results["error"] = e


def test_pub_sub_round_trip():
    port = _free_port()
    results: dict = {}
    t = threading.Thread(target=_pub,
                         args=([b"one", b"two", b"three"], port, results))
    t.start()
    spool = load_zmq(f"tcp://127.0.0.1:{port}", n_messages=3, timeout=15)
    t.join(timeout=15)
    assert "error" not in results, results.get("error")
    assert results["sent"] == 3
    assert open(spool, "rb").read() == b"one\ntwo\nthree\n"


def test_sub_filter_prefix():
    """--filter performs a prefix match on the raw message bytes
    (zmq.md loader filter semantics)."""
    port = _free_port()
    results: dict = {}
    t = threading.Thread(
        target=_pub,
        args=([b"alpha 1", b"beta 2", b"alpha 3"], port, results))
    t.start()
    spool = load_zmq(f"tcp://127.0.0.1:{port}", n_messages=2, timeout=15,
                     filter=b"alpha")
    t.join(timeout=15)
    assert results["sent"] == 2  # beta filtered at the publisher
    assert open(spool, "rb").read() == b"alpha 1\nalpha 3\n"


def test_tql_zmq_source_and_sink(spark, tmp_path):
    """`... | to zmq <ep>` publishing into `from zmq <ep> read json`."""
    from tenzir_spark.plans.tql import exec_pipeline

    src = tmp_path / "rows.json"
    src.write_text('{"a": 1}\n{"a": 2}\n')
    port = _free_port()
    results: dict = {}

    def run_sink():
        try:
            results["sent"] = exec_pipeline(
                f"from {src} read json | sort a"
                f" | to zmq tcp://127.0.0.1:{port}", spark=spark)
        except Exception as e:
            results["error"] = e

    t = threading.Thread(target=run_sink)
    t.start()
    df = exec_pipeline(
        f"from zmq tcp://127.0.0.1:{port} --count 2 read json",
        spark=spark)
    t.join(timeout=30)
    assert "error" not in results, results.get("error")
    assert results["sent"] == 2
    assert sorted(r["a"] for r in df.collect()) == [1, 2]


def test_bad_endpoint_rejected():
    with pytest.raises(ValueError, match="tcp"):
        load_zmq("ipc:///tmp/x", n_messages=1, timeout=1)


def test_pub_without_subscriber_returns_zero():
    """ZeroMQ PUB semantics: messages to nobody are dropped, not an
    error — both the never-connected and connected-but-never-subscribed
    cases exit gracefully."""
    port = _free_port()
    assert save_zmq([b"x"], f"tcp://127.0.0.1:{port}", bind=True,
                    timeout=1.0) == 0


def test_oversized_frame_refused():
    """A peer announcing a multi-GB frame is refused before any
    allocation (adversarial-input cap)."""
    import socket as s
    import struct

    from tenzir_spark.sources.zmq import _recv_frame

    a, b = s.socketpair()
    try:
        b.sendall(b"\x02" + struct.pack(">Q", 1 << 40))
        a.settimeout(2)
        with pytest.raises(ConnectionError, match="cap"):
            _recv_frame(a)
    finally:
        a.close()
        b.close()


def test_shell_timeout_enforced():
    """The shell connector's timeout bounds a child that produces no
    output (regression: the streaming rewrite had dropped it)."""
    import time

    from tenzir_spark.sources.shell import run_shell

    t0 = time.monotonic()
    with pytest.raises(RuntimeError, match="timed out"):
        run_shell("sleep 30", timeout=1.0)
    assert time.monotonic() - t0 < 10


def test_shell_stderr_flood_no_deadlock():
    """A child writing far more than a pipe buffer to stderr completes
    (regression: sequential pipe reads deadlocked)."""
    from tenzir_spark.sources.shell import run_shell

    spool = run_shell(
        "head -c 200000 /dev/zero >&2; printf 'done\\n'", timeout=20)
    assert open(spool).read() == "done\n"


def test_multiline_payload_refused_in_line_spool():
    """A message with an embedded newline would silently split into
    several records under the line-framed spool — it must be refused
    with a pointer to raw mode instead."""
    port = _free_port()
    results: dict = {}
    t = threading.Thread(
        target=_pub, args=([b'{"a":\n 1}'], port, results))
    t.start()
    try:
        with pytest.raises(ValueError, match="raw"):
            load_zmq(f"tcp://127.0.0.1:{port}", n_messages=1, timeout=15)
    finally:
        t.join(timeout=15)


def test_multiline_payload_raw_spool_verbatim():
    """raw=True concatenates message bytes with no delimiter — framing
    belongs to the self-framing payload format."""
    port = _free_port()
    results: dict = {}
    t = threading.Thread(
        target=_pub, args=([b'{"a":\n 1}', b'{"b": 2}'], port, results))
    t.start()
    spool = load_zmq(f"tcp://127.0.0.1:{port}", n_messages=2, timeout=15,
                     raw=True)
    t.join(timeout=15)
    assert results["sent"] == 2
    assert open(spool, "rb").read() == b'{"a":\n 1}{"b": 2}'
