"""Generate the committed NetFlow fixture: a binary capture containing a
v5 packet, a v9 message (template + data), and an IPFIX message — plus
the expected decoded rows as NDJSON, written directly from the SAME
declared flow tuples (never by running the parser, so the expectation is
independent of the implementation).

Run from the repo root: python tools/make_netflow_fixture.py
"""

import json
import struct


def ip(a, b, c, d):
    return (a << 24) | (b << 16) | (c << 8) | d


def ipstr(v):
    return f"{(v >> 24) & 255}.{(v >> 16) & 255}.{(v >> 8) & 255}.{v & 255}"


V5_FLOWS = [
    # src, dst, nexthop, sport, dport, proto, pkts, bytes, flags
    (ip(192, 168, 1, 10), ip(10, 9, 8, 7), ip(10, 0, 0, 254), 443, 51820, 6, 12, 9000, 0x1B),
    (ip(172, 16, 0, 3), ip(8, 8, 4, 4), ip(10, 0, 0, 254), 137, 137, 17, 3, 234, 0x00),
]
V5_SECS, V5_NSECS = 1700000000, 250000000

V9_FLOWS = [
    # src, dst, sport, dport, proto, bytes
    (ip(203, 0, 113, 5), ip(198, 51, 100, 9), 8443, 62001, 6, 123456),
    (ip(203, 0, 113, 6), ip(198, 51, 100, 9), 53, 5353, 17, 777),
]
V9_SECS = 1700000100

IPFIX_FLOWS = [
    # src, dst, sport, dport
    (ip(100, 64, 0, 1), ip(100, 64, 0, 2), 6000, 22),
]
IPFIX_SECS = 1700000200


def v5_packet():
    hdr = struct.pack(">HHIIIIBBH", 5, len(V5_FLOWS), 123456, V5_SECS,
                      V5_NSECS, 42, 0, 0, 0)
    out = hdr
    for (src, dst, nh, sp, dp, pr, pk, by, fl) in V5_FLOWS:
        out += struct.pack(">IIIHHIIIIHHBBBBHHBBH",
                           src, dst, nh, 3, 4, pk, by, 1000, 2000, sp, dp,
                           0, fl, pr, 0, 65001, 65002, 24, 22, 0)
    return out


def v9_message():
    tmpl = struct.pack(">16H", 0, 32, 260, 6,
                       8, 4, 12, 4, 7, 2, 11, 2, 4, 1, 1, 4)
    data = b""
    for (src, dst, sp, dp, pr, by) in V9_FLOWS:
        data += struct.pack(">IIHHBI", src, dst, sp, dp, pr, by)
    dset = struct.pack(">HH", 260, 4 + len(data)) + data
    hdr = struct.pack(">HHIIII", 9, 1 + len(V9_FLOWS), 9999, V9_SECS, 1, 0)
    return hdr + tmpl + dset


def ipfix_message():
    tmpl_body = struct.pack(">HHHHHHHHHH", 300, 4, 8, 4, 12, 4, 7, 2, 11, 2)
    tset = struct.pack(">HH", 2, 4 + len(tmpl_body)) + tmpl_body
    data = b""
    for (src, dst, sp, dp) in IPFIX_FLOWS:
        data += struct.pack(">IIHH", src, dst, sp, dp)
    dset = struct.pack(">HH", 300, 4 + len(data)) + data
    body = tset + dset
    hdr = struct.pack(">HHIII", 10, 16 + len(body), IPFIX_SECS, 7, 0)
    return hdr + body


def expected_rows():
    rows = []
    for (src, dst, nh, sp, dp, pr, pk, by, fl) in V5_FLOWS:
        rows.append({
            "version": 5,
            "exported_at": V5_SECS * 1_000_000 + V5_NSECS // 1000,
            "src_addr": ipstr(src), "dst_addr": ipstr(dst),
            "next_hop": ipstr(nh), "input": 3, "output": 4,
            "packets": pk, "bytes": by, "first": 1000, "last": 2000,
            "src_port": sp, "dst_port": dp, "tcp_flags": fl, "proto": pr,
            "tos": 0, "src_as": 65001, "dst_as": 65002,
            "src_mask": 24, "dst_mask": 22})
    for (src, dst, sp, dp, pr, by) in V9_FLOWS:
        rows.append({
            "version": 9, "exported_at": V9_SECS * 1_000_000,
            "src_addr": ipstr(src), "dst_addr": ipstr(dst),
            "next_hop": None, "input": None, "output": None,
            "packets": None, "bytes": by, "first": None, "last": None,
            "src_port": sp, "dst_port": dp, "tcp_flags": None, "proto": pr,
            "tos": None, "src_as": None, "dst_as": None,
            "src_mask": None, "dst_mask": None})
    for (src, dst, sp, dp) in IPFIX_FLOWS:
        rows.append({
            "version": 10, "exported_at": IPFIX_SECS * 1_000_000,
            "src_addr": ipstr(src), "dst_addr": ipstr(dst),
            "next_hop": None, "input": None, "output": None,
            "packets": None, "bytes": None, "first": None, "last": None,
            "src_port": sp, "dst_port": dp, "tcp_flags": None,
            "proto": None, "tos": None, "src_as": None, "dst_as": None,
            "src_mask": None, "dst_mask": None})
    return rows


if __name__ == "__main__":
    with open("fixtures/netflow.bin", "wb") as f:
        f.write(v5_packet() + v9_message() + ipfix_message())
    with open("fixtures/netflow_expected.json", "w") as f:
        for r in expected_rows():
            f.write(json.dumps(r) + "\n")
    print("wrote fixtures/netflow.bin and fixtures/netflow_expected.json")
