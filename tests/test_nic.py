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


def _traffic(n=30, payload=b"tenzir-nic-test"):
    """Generate UDP datagrams to ourselves on loopback."""
    u = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)
    for _ in range(n):
        u.sendto(payload, ("127.0.0.1", MARKER_PORT))
        time.sleep(0.01)
    u.close()


def test_live_capture_to_decapsulate(spark):
    t = threading.Thread(target=_traffic)
    t.start()
    spool = load_nic("lo", n_packets=20, duration=10.0)
    t.join()
    from pyspark.sql import functions as F

    from tenzir_spark.operators.packet import decapsulate
    from tenzir_spark.sources.pcap import read_pcap
    pkts = read_pcap(spark, spool)
    assert pkts.count() >= 1
    decap = decapsulate(pkts)
    ours = decap.filter(F.col("udp.dst_port") == MARKER_PORT)
    rows = ours.collect()
    assert rows, "capture missed our marker datagrams"
    r = rows[0]
    assert r["ip"]["src"] == "127.0.0.1" and r["ip"]["dst"] == "127.0.0.1"
    assert r["ip"]["type"] == 17
    assert r["community_id"].startswith("1:")


def test_tql_nic_source(spark):
    t = threading.Thread(target=_traffic)
    t.start()
    from tenzir_spark.plans.tql import exec_pipeline
    df = exec_pipeline(
        "from nic lo --count 10 --duration 10 | decapsulate"
        " | where udp.dst_port == 47113 | select ip community_id",
        spark=spark)
    t.join()
    rows = df.collect()
    assert rows and all(r["ip"]["dst"] == "127.0.0.1" for r in rows)


def test_snaplen_truncates(spark):
    t = threading.Thread(
        target=_traffic, kwargs={"payload": b"x" * 600, "n": 30})
    t.start()
    spool = load_nic("lo", n_packets=10, duration=10.0, snaplen=64)
    t.join()
    from tenzir_spark.sources.pcap import read_pcap
    rows = read_pcap(spark, spool).collect()
    assert rows
    assert all(r["captured_packet_length"] <= 64 for r in rows)
    assert any(r["original_packet_length"] > 64 for r in rows)
