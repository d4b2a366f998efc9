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


def test_community_id_reference_unit_vectors():
    """The reference's full community_id unit suite
    (libtenzir/test/community_id.cpp:48-110 — ground truth from the
    spec author's Python module): UDP/TCP over v4/v6, ICMPv4/ICMPv6
    with and without a request/reply dual. Pins BOTH policies — the
    base64 string our decapsulate emits and the ascii-hex digest
    (community_id.hpp policy::ascii) recovered from it."""
    import base64
    import ipaddress
    import socket

    import numpy as np

    from tenzir_spark.operators.packet import _community_ids

    # (proto, src, dst, sport, dport, hex, b64)
    vectors = [
        (17, "192.168.1.102", "192.168.1.1", 68, 67,
         "1:69665f2c8aae6250b1286b89eb67d01a5805cc02",
         "1:aWZfLIquYlCxKGuJ62fQGlgFzAI="),
        (17, "fe80::2c23:b96c:78d:e116", "ff02::c", 58544, 3702,
         "1:662f40748c18bd99d8bee39b4cf806582052611b",
         "1:Zi9AdIwYvZnYvuObTPgGWCBSYRs="),
        (6, "192.168.1.102", "68.216.79.113", 1180, 37,
         "1:f4bfed67579b1f395687307fa49c92f405495b2f",
         "1:9L/tZ1ebHzlWhzB/pJyS9AVJWy8="),
        (6, "fe80::219:e3ff:fee7:5d23", "ff02::fb", 5353, 53,
         "1:03aaaffe2842910257a2fdf52f863395cb8a4769",
         "1:A6qv/ihCkQJXov31L4YzlcuKR2k="),
        (1, "1.2.3.4", "5.6.7.8", 0, 8,
         "1:d6f36bf9c570edbcd9fad1ac8761fbbe807069a6",
         "1:1vNr+cVw7bzZ+tGsh2H7voBwaaY="),
        (1, "192.168.0.89", "192.168.0.1", 128, 129,
         "1:86459c1ce1ea4c65aaffe7f01c48a6e5efa0d5f1",
         "1:hkWcHOHqTGWq/+fwHEim5e+g1fE="),
        (58, "fe80::200:86ff:fe05:80da", "fe80::260", 135, 136,
         "1:ffb2d8321708804a883ac02fe6c76655499b3ff5",
         "1:/7LYMhcIgEqIOsAv5sdmVUmbP/U="),
        (58, "fe80::dead", "fe80::beef", 42, 84,
         "1:118a3bbf175529a3d55dca55c4364ec47f1c4152",
         "1:EYo7vxdVKaPVXcpVxDZOxH8cQVI="),
    ]
    n = len(vectors)
    v4src = np.zeros(n, dtype=np.uint32)
    v4dst = np.zeros(n, dtype=np.uint32)
    v6src = np.empty(n, dtype=object)
    v6dst = np.empty(n, dtype=object)
    is_v6 = np.zeros(n, dtype=bool)
    proto = np.zeros(n, dtype=np.int64)
    sport = np.zeros(n, dtype=np.int64)
    dport = np.zeros(n, dtype=np.int64)
    for i, (pr, s, d, sp, dp, _, _) in enumerate(vectors):
        proto[i], sport[i], dport[i] = pr, sp, dp
        si, di = ipaddress.ip_address(s), ipaddress.ip_address(d)
        if si.version == 6:
            is_v6[i] = True
            v6src[i], v6dst[i] = si.packed, di.packed
        else:
            v4src[i] = int(si)
            v4dst[i] = int(di)
            v6src[i] = v6dst[i] = b""
    got = _community_ids(v4src, v4dst, v6src, v6dst, is_v6,
                         proto, sport, dport)
    for i, (_, _, _, _, _, hexs, b64s) in enumerate(vectors):
        assert got[i] == b64s, vectors[i]
        digest = base64.b64decode(got[i][2:])
        assert "1:" + digest.hex() == hexs, vectors[i]
