"""NetFlow v5/v9/IPFIX reader over synthesized deterministic captures
(from-spec: RFC 3954 / RFC 7011; reference surface:
web/docs/formats/netflow.md — auto-detected version)."""

import struct

import pytest

from tenzir_spark.sources.netflow import read_netflow


def _v5_packet(flows):
    hdr = struct.pack(">HHIIIIBBH", 5, len(flows), 1000, 1700000000,
                      500000000, 1, 0, 0, 0)
    recs = b""
    for (src, dst, sport, dport, proto, pkts, octets) in flows:
        recs += struct.pack(
            ">IIIHHIIIIHHBBBBHHBBH",
            src, dst, 0x0A000001, 1, 2, pkts, octets, 100, 200,
            sport, dport, 0, 0x18, proto, 0, 64512, 64513, 24, 16, 0)
    return hdr + recs


def _ip(a, b, c, d):
    return (a << 24) | (b << 16) | (c << 8) | d


@pytest.fixture(scope="module")
def v5_file(tmp_path_factory):
    p = tmp_path_factory.mktemp("nf") / "v5.bin"
    pkt1 = _v5_packet([
        (_ip(192, 168, 0, 1), _ip(10, 0, 0, 7), 443, 50123, 6, 10, 1400),
        (_ip(192, 168, 0, 2), _ip(10, 0, 0, 8), 53, 40000, 17, 2, 180),
    ])
    pkt2 = _v5_packet([
        (_ip(172, 16, 5, 5), _ip(8, 8, 8, 8), 1234, 53, 17, 1, 76),
    ])
    p.write_bytes(pkt1 + pkt2)
    return str(p)


def test_v5(spark, v5_file):
    df = read_netflow(spark, v5_file).orderBy("src_addr")
    rows = df.collect()
    assert len(rows) == 3
    r = {x["src_addr"]: x for x in rows}
    a = r["192.168.0.1"]
    assert a["dst_addr"] == "10.0.0.7"
    assert a["next_hop"] == "10.0.0.1"
    assert (a["src_port"], a["dst_port"], a["proto"]) == (443, 50123, 6)
    assert (a["packets"], a["bytes"]) == (10, 1400)
    assert (a["src_as"], a["dst_as"]) == (64512, 64513)
    assert (a["src_mask"], a["dst_mask"]) == (24, 16)
    assert a["tcp_flags"] == 0x18
    assert a["version"] == 5
    assert str(a["exported_at"]) == "2023-11-14 22:13:20.500000"
    assert r["172.16.5.5"]["dst_addr"] == "8.8.8.8"


def _v9_message():
    # template 256: src(8,4) dst(12,4) sport(7,2) dport(11,2) proto(4,1)
    # bytes(1,4)
    tmpl = struct.pack(">16H", 0, 4 + 4 + 6 * 4, 256, 6,
                       8, 4, 12, 4, 7, 2, 11, 2, 4, 1, 1, 4)
    rec = lambda s, d, sp, dp, pr, by: (
        struct.pack(">I", s) + struct.pack(">I", d)
        + struct.pack(">HH", sp, dp) + struct.pack(">B", pr)
        + struct.pack(">I", by))
    data = rec(_ip(1, 2, 3, 4), _ip(5, 6, 7, 8), 80, 55000, 6, 9999) \
        + rec(_ip(9, 9, 9, 9), _ip(4, 4, 4, 4), 123, 123, 17, 48)
    dset = struct.pack(">HH", 256, 4 + len(data)) + data
    # count = 1 template record + 2 data records
    hdr = struct.pack(">HHIIII", 9, 3, 5000, 1700000100, 7, 0)
    return hdr + tmpl + dset


def test_v9(spark, tmp_path):
    p = tmp_path / "v9.bin"
    p.write_bytes(_v9_message())
    rows = read_netflow(spark, str(p)).orderBy("src_addr").collect()
    assert len(rows) == 2
    a, b = rows
    assert (a["src_addr"], a["dst_addr"]) == ("1.2.3.4", "5.6.7.8")
    assert (a["src_port"], a["dst_port"], a["proto"]) == (80, 55000, 6)
    assert a["bytes"] == 9999
    assert a["version"] == 9
    # unmapped elements stay null
    assert a["src_as"] is None
    assert (b["src_addr"], b["proto"]) == ("9.9.9.9", 17)


def _ipfix_message():
    tmpl_body = struct.pack(">HHHHHHHHHH", 256, 4,
                            8, 4, 12, 4, 7, 2, 11, 2)
    tset = struct.pack(">HH", 2, 4 + len(tmpl_body)) + tmpl_body
    rec = struct.pack(">IIHH", _ip(10, 1, 1, 1), _ip(10, 2, 2, 2), 5000, 22)
    dset = struct.pack(">HH", 256, 4 + len(rec)) + rec
    body = tset + dset
    hdr = struct.pack(">HHIII", 10, 16 + len(body), 1700000200, 1, 0)
    return hdr + body


def test_ipfix(spark, tmp_path):
    p = tmp_path / "ipfix.bin"
    p.write_bytes(_ipfix_message())
    rows = read_netflow(spark, str(p)).collect()
    assert len(rows) == 1
    r = rows[0]
    assert (r["src_addr"], r["dst_addr"]) == ("10.1.1.1", "10.2.2.2")
    assert (r["src_port"], r["dst_port"]) == (5000, 22)
    assert r["version"] == 10
    assert str(r["exported_at"]).startswith("2023-11-14")


def test_v9_data_before_template_does_not_desync(spark, tmp_path):
    """RFC 3954 allows data FlowSets before their template arrives
    (templates are re-sent periodically): the unknown set is skipped by
    its length and the FOLLOWING message must still parse."""
    # message 1: data set for unseen template 300 with 3 records
    rec = struct.pack(">II", _ip(9, 9, 9, 9), _ip(8, 8, 8, 8))
    dset = struct.pack(">HH", 300, 4 + 3 * len(rec)) + rec * 3
    m1 = struct.pack(">HHIIII", 9, 3, 100, 1700000000, 1, 0) + dset
    p = tmp_path / "ooo.bin"
    p.write_bytes(m1 + _v9_message() + _v5_packet(
        [(_ip(3, 3, 3, 3), _ip(4, 4, 4, 4), 5, 6, 6, 1, 10)]))
    df = read_netflow(spark, str(p))
    rows = df.collect()
    # message 1's records are unparseable (no template) and skipped;
    # the later messages decode fully
    assert sorted(r["version"] for r in rows) == [5, 9, 9]
    assert {r["src_addr"] for r in rows} == {"1.2.3.4", "9.9.9.9", "3.3.3.3"}


def test_mixed_versions_one_file(spark, tmp_path):
    """The reference auto-detects per packet; v5 and v9 messages can share
    a capture file."""
    p = tmp_path / "mixed.bin"
    p.write_bytes(
        _v5_packet([(_ip(1, 1, 1, 1), _ip(2, 2, 2, 2), 1, 2, 6, 1, 10)])
        + _v9_message())
    df = read_netflow(spark, str(p))
    assert sorted(r["version"] for r in df.select("version").collect()) \
        == [5, 9, 9]


def test_v9_data_before_template_recovered(spark, tmp_path):
    """A capture that starts mid-stream (data FlowSet first, its template
    re-sent in a LATER message) must still yield the flows: collectors
    buffer unresolved data sets until the template registers."""
    # message 1: data set for template 256 — template not yet seen
    rec = (struct.pack(">I", _ip(7, 7, 7, 7)) + struct.pack(">I", _ip(6, 6, 6, 6))
           + struct.pack(">HH", 8080, 443) + struct.pack(">B", 6)
           + struct.pack(">I", 4242))
    dset = struct.pack(">HH", 256, 4 + len(rec)) + rec
    m1 = struct.pack(">HHIIII", 9, 1, 100, 1700000050, 1, 0) + dset
    # message 2: the template (+ its own data), as _v9_message builds it
    p = tmp_path / "recover.bin"
    p.write_bytes(m1 + _v9_message())
    rows = read_netflow(spark, str(p)).collect()
    assert len(rows) == 3  # 1 buffered-then-decoded + 2 from message 2
    got = {r["src_addr"]: r for r in rows}
    assert got["7.7.7.7"]["dst_addr"] == "6.6.6.6"
    assert (got["7.7.7.7"]["src_port"], got["7.7.7.7"]["dst_port"]) == (8080, 443)
    assert got["7.7.7.7"]["bytes"] == 4242
    assert got["7.7.7.7"]["version"] == 9


def test_ipfix_data_before_template_recovered(spark, tmp_path):
    """Same mid-stream start for IPFIX (RFC 7011): the data set arrives
    in an earlier message than its template and is decoded on the second
    pass."""
    rec = struct.pack(">IIHH", _ip(10, 5, 5, 5), _ip(10, 6, 6, 6), 1111, 22)
    dset = struct.pack(">HH", 256, 4 + len(rec)) + rec
    m1 = struct.pack(">HHIII", 10, 16 + len(dset), 1700000150, 1, 0) + dset
    p = tmp_path / "recover_ipfix.bin"
    p.write_bytes(m1 + _ipfix_message())
    rows = read_netflow(spark, str(p)).collect()
    assert len(rows) == 2
    got = {r["src_addr"]: r for r in rows}
    assert got["10.5.5.5"]["dst_addr"] == "10.6.6.6"
    assert (got["10.5.5.5"]["src_port"], got["10.5.5.5"]["dst_port"]) == (1111, 22)
    assert got["10.5.5.5"]["version"] == 10
