"""pcap format + decapsulate operator, pinned to the reference's golden
outputs (tenzir/integration/reference/pcap-format/step_00..04.ref and the
md5-pinned byte-identical round trip of tests.yaml:1058-1063)."""

import gzip
import hashlib
import json
import os

import pytest
from pyspark.sql import functions as F

from tenzir_spark.operators.packet import decapsulate
from tenzir_spark.sources.pcap import read_pcap, write_pcap

FIX = os.path.join(os.path.dirname(__file__), "..", "fixtures")


@pytest.fixture(scope="module")
def packets(spark):
    return read_pcap(spark, os.path.join(FIX, "example.pcap.gz"))


def test_read_pcap_schema_and_counts(packets):
    assert [f.name for f in packets.schema.fields] == [
        "linktype", "timestamp", "captured_packet_length",
        "original_packet_length", "data"]
    assert packets.count() == 1000
    first = packets.limit(1).collect()[0]
    # golden step_00.ref first event's nested pcap record
    assert first["linktype"] == 1
    assert str(first["timestamp"]) == "2018-10-30 08:56:07.459844"
    assert first["captured_packet_length"] == 78
    assert first["original_packet_length"] == 78
    assert len(first["data"]) == 78


def test_read_pcap_emit_file_headers(spark):
    df = read_pcap(spark, os.path.join(FIX, "example.pcap.gz"),
                   emit_file_headers=True)
    hdrs = df.filter(F.col("_schema") == "pcap.file_header").collect()
    assert len(hdrs) == 1
    h = hdrs[0]
    assert h["magic_number"] == 0xA1B2C3D4
    assert (h["major_version"], h["minor_version"]) == (2, 4)
    assert h["snaplen"] == 262144
    assert df.filter(F.col("_schema") == "pcap.packet").count() == 1000


def test_write_pcap_byte_identical_round_trip(spark, tmp_path):
    """read pcap -e | write pcap reproduces the input byte-for-byte —
    the reference pins md5 2696858410a08f5edb405b8630a9858c
    (tests.yaml:1058-1063)."""
    df = read_pcap(spark, os.path.join(FIX, "example.pcap.gz"),
                   emit_file_headers=True)
    out = str(tmp_path / "round.pcap")
    write_pcap(df.coalesce(1), out)
    md5 = hashlib.md5(open(out, "rb").read()).hexdigest()
    assert md5 == "2696858410a08f5edb405b8630a9858c"
    # and equals the gunzipped original
    orig = gzip.open(os.path.join(FIX, "example.pcap.gz"), "rb").read()
    assert open(out, "rb").read() == orig


def test_concatenated_pcap_streams(spark, tmp_path):
    """Multiple file headers in one byte stream resync correctly
    (tests.yaml:1064-1066 `shell "cat vlan-*.pcap" | read pcap -e`:
    2 file_header + 11 packet events)."""
    blob = (open(os.path.join(FIX, "vlan-double-tagging.pcap"), "rb").read()
            + open(os.path.join(FIX, "vlan-single-tagging.pcap"), "rb").read())
    p = tmp_path / "cat.pcap"
    p.write_bytes(blob)
    df = read_pcap(spark, str(p), emit_file_headers=True)
    counts = dict(df.groupBy("_schema").count().collect())
    assert counts == {"pcap.file_header": 2, "pcap.packet": 11}


def test_decapsulate_golden(spark, packets):
    """Full 1000-event equality against the reference engine's own
    decapsulate output (reference/pcap-format/step_00.ref)."""
    got = decapsulate(packets).select(
        F.col("ether.src").alias("ether_src"),
        F.col("ether.dst").alias("ether_dst"),
        F.col("ether.type").alias("ether_type"),
        F.col("ip.src").alias("ip_src"),
        F.col("ip.dst").alias("ip_dst"),
        F.col("ip.type").alias("ip_type"),
        F.col("tcp.src_port").alias("src_port"),
        F.col("tcp.dst_port").alias("dst_port"),
        "community_id",
        F.col("pcap.captured_packet_length").alias("len"),
    ).collect()
    exp = [json.loads(l) for l in open(os.path.join(FIX, "decap_expected.json"))]
    assert len(got) == len(exp)
    for g, e in zip(got, exp):
        assert g["ether_src"] == e["ether"]["src"]
        assert g["ether_dst"] == e["ether"]["dst"]
        assert g["ether_type"] == e["ether"]["type"]
        assert g["ip_src"] == e["ip"]["src"]
        assert g["ip_dst"] == e["ip"]["dst"]
        assert g["ip_type"] == e["ip"]["type"]
        assert g["src_port"] == e["tcp"]["src_port"]
        assert g["dst_port"] == e["tcp"]["dst_port"]
        assert g["community_id"] == e["community_id"]
        assert g["len"] == e["pcap"]["captured_packet_length"]


def test_decapsulate_vlan_golden(spark):
    """VLAN tag extraction pinned to step_01/step_02.ref (tshark-verified
    by the reference)."""
    single = decapsulate(
        read_pcap(spark, os.path.join(FIX, "vlan-single-tagging.pcap")))
    got = [(r["vlan"]["outer"], r["vlan"]["inner"]) if r["vlan"] else None
           for r in single.select("vlan").collect()]
    assert got == [(32, None), (32, None), (104, None), (32, None), (32, None)]
    double = decapsulate(
        read_pcap(spark, os.path.join(FIX, "vlan-double-tagging.pcap")))
    got = [(r["vlan"]["outer"], r["vlan"]["inner"]) if r["vlan"] else None
           for r in double.select("vlan").collect()]
    assert got == [(1, 20)] * 6


def test_decapsulate_icmp_and_udp(spark, tmp_path):
    """Synthetic ICMP echo + UDP packets: layer-4 structs and the
    community-id ICMP dual normalization (icmp.cpp:15-40 — echo(8) pairs
    with echo_reply(0), so both directions share one flow hash)."""
    import struct as st

    def eth(dst, src, etype, payload):
        return dst + src + st.pack(">H", etype) + payload

    def ipv4(src, dst, proto, payload):
        hdr = st.pack(">BBHHHBBH4s4s", 0x45, 0, 20 + len(payload), 0, 0,
                      64, proto, 0, src, dst)
        return hdr + payload

    mac_a, mac_b = bytes(6), bytes([1] * 6)
    ip_a, ip_b = bytes([10, 0, 0, 1]), bytes([10, 0, 0, 2])
    icmp_req = eth(mac_b, mac_a, 0x0800,
                   ipv4(ip_a, ip_b, 1, st.pack(">BBHHH", 8, 0, 0, 1, 1)))
    icmp_rep = eth(mac_a, mac_b, 0x0800,
                   ipv4(ip_b, ip_a, 1, st.pack(">BBHHH", 0, 0, 0, 1, 1)))
    udp = eth(mac_b, mac_a, 0x0800,
              ipv4(ip_a, ip_b, 17, st.pack(">HHHH", 5353, 53, 8, 0)))
    blob = st.pack("<IHHIIII", 0xA1B2C3D4, 2, 4, 0, 0, 65535, 1)
    for pkt in (icmp_req, icmp_rep, udp):
        blob += st.pack("<IIII", 1, 0, len(pkt), len(pkt)) + pkt
    p = tmp_path / "synth.pcap"
    p.write_bytes(blob)
    rows = decapsulate(read_pcap(spark, str(p))).orderBy(
        F.col("pcap.timestamp")).collect()
    req, rep, u = rows[0], rows[1], rows[2]
    assert req["icmp"]["type"] == 8 and req["icmp"]["code"] == 0
    assert rep["icmp"]["type"] == 0
    assert req["tcp"] is None and req["udp"] is None
    # echo and echo-reply normalize to the SAME community id
    assert req["community_id"] == rep["community_id"]
    assert u["udp"]["src_port"] == 5353 and u["udp"]["dst_port"] == 53
    assert u["ip"]["type"] == 17
    assert u["community_id"].startswith("1:")


def test_truncated_trailer_keeps_complete_packets(spark, tmp_path):
    """A capture killed mid-write (last packet header promises more
    bytes than exist) yields the complete packets, not a task failure."""
    import struct as st

    blob = st.pack("<IHHIIII", 0xA1B2C3D4, 2, 4, 0, 0, 65535, 1)
    blob += st.pack("<IIII", 1, 0, 4, 4) + b"\xaa\xbb\xcc\xdd"
    blob += st.pack("<IIII", 2, 0, 100, 100) + b"\x00" * 30  # truncated
    p = tmp_path / "cut.pcap"
    p.write_bytes(blob)
    rows = read_pcap(spark, str(p)).collect()
    assert len(rows) == 1
    assert bytes(rows[0]["data"]) == b"\xaa\xbb\xcc\xdd"


def test_decapsulate_all_empty_payloads(spark, tmp_path):
    """A batch containing only zero-length payloads must not crash the
    vectorized gathers."""
    import struct as st

    blob = st.pack("<IHHIIII", 0xA1B2C3D4, 2, 4, 0, 0, 65535, 1)
    for _ in range(3):
        blob += st.pack("<IIII", 1, 0, 0, 0)
    p = tmp_path / "empty.pcap"
    p.write_bytes(blob)
    rows = decapsulate(read_pcap(spark, str(p))).collect()
    assert len(rows) == 3
    assert all(r["ether"] is None and r["community_id"] is None
               for r in rows)


def test_decapsulate_unparsable_keeps_pcap(spark, tmp_path):
    """A frame too short for layer 2 still yields a row with the original
    record nested under pcap and null layers (the reference pushes an
    empty row plus the nested input, decapsulate.cpp:362-390)."""
    import struct as st

    blob = st.pack("<IHHIIII", 0xA1B2C3D4, 2, 4, 0, 0, 65535, 1)
    blob += st.pack("<IIII", 1, 0, 4, 4) + b"\x00\x01\x02\x03"
    p = tmp_path / "short.pcap"
    p.write_bytes(blob)
    rows = decapsulate(read_pcap(spark, str(p))).collect()
    assert len(rows) == 1
    r = rows[0]
    assert r["ether"] is None and r["ip"] is None and r["community_id"] is None
    assert r["pcap"]["captured_packet_length"] == 4
