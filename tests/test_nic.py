"""nic connector: REAL live capture over AF_PACKET on loopback, decoded
by the pcap parser and decapsulate (reference: nic.md — the loader
emits a valid pcap byte stream; default parser pcap)."""

import socket
import threading
import time

import pytest

from tenzir_spark.sources.nic import load_nic


def _can_capture() -> bool:
    try:
        s = socket.socket(socket.AF_PACKET, socket.SOCK_RAW,
                          socket.htons(0x0003))
        s.bind(("lo", 0))
        s.close()
        return True
    except (PermissionError, OSError):
        return False


pytestmark = pytest.mark.skipif(
    not _can_capture(), reason="AF_PACKET capture unavailable")

MARKER_PORT = 47113


def _traffic(n=30, payload=b"tenzir-nic-test", stop=None):
    """Generate UDP datagrams to ourselves on loopback; with a ``stop``
    event, keep sending until told to quit (so a capture window that
    opens late under host load still sees traffic)."""
    u = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)
    sent = 0
    while (stop is not None and not stop.is_set()) or sent < n:
        u.sendto(payload, ("127.0.0.1", MARKER_PORT))
        sent += 1
        if stop is not None and sent >= 20000:
            break  # runaway guard; capture has long since finished
        time.sleep(0.01)
    u.close()


def _attempt(capture, check, attempts=3, **traffic_kw):
    """Run ``capture()`` with marker traffic flowing, up to ``attempts``
    times. A live AF_PACKET window can be starved when the whole suite's
    Spark sessions contend for CPU (round-4 verdict: order/load-flaky) —
    the capture itself is correct, the WINDOW is unlucky. Traffic keeps
    flowing until the capture returns, and an empty window retries
    instead of failing the suite."""
    last = None
    for i in range(attempts):
        stop = threading.Event()
        t = threading.Thread(target=_traffic, kwargs={**traffic_kw, "stop": stop})
        t.start()
        try:
            out = capture()
        finally:
            stop.set()
            t.join()
        last = check(out)
        if last:
            return last
    raise AssertionError(f"capture missed marker datagrams in {attempts} windows")


def test_live_capture_to_decapsulate(spark):
    from pyspark.sql import functions as F

    from tenzir_spark.operators.packet import decapsulate
    from tenzir_spark.sources.pcap import read_pcap

    def check(spool):
        pkts = read_pcap(spark, spool)
        if pkts.count() < 1:
            return None
        return decapsulate(pkts).filter(
            F.col("udp.dst_port") == MARKER_PORT).collect() or None

    rows = _attempt(lambda: load_nic("lo", n_packets=20, duration=10.0), check)
    r = rows[0]
    assert r["ip"]["src"] == "127.0.0.1" and r["ip"]["dst"] == "127.0.0.1"
    assert r["ip"]["type"] == 17
    assert r["community_id"].startswith("1:")


def test_tql_nic_source(spark):
    from tenzir_spark.plans.tql import exec_pipeline

    def capture():
        return exec_pipeline(
            "from nic lo --count 10 --duration 10 | decapsulate"
            " | where udp.dst_port == 47113 | select ip community_id",
            spark=spark)

    rows = _attempt(capture, lambda df: df.collect() or None)
    assert all(r["ip"]["dst"] == "127.0.0.1" for r in rows)


def test_snaplen_truncates(spark):
    from tenzir_spark.sources.pcap import read_pcap

    def check(spool):
        rows = read_pcap(spark, spool).collect()
        # need at least one of OUR oversized datagrams in the window
        if not any(r["original_packet_length"] > 64 for r in rows):
            return None
        return rows

    rows = _attempt(
        lambda: load_nic("lo", n_packets=10, duration=10.0, snaplen=64),
        check, payload=b"x" * 600, n=30)
    assert all(r["captured_packet_length"] <= 64 for r in rows)
