"""decapsulate — parse raw packet bytes into link/network/transport fields.

Reference: ``libtenzir/builtins/operators/decapsulate.cpp`` (Ethernet
frame incl. 802.1Q single/double VLAN tags, IPv4/IPv6, TCP/UDP/ICMP,
Community ID) over ``pcap.packet`` events; the original event is nested
back under a ``pcap`` field (decapsulate.cpp:377-390).

Spark design: one ``mapInPandas`` stage. All header-field extraction is
vectorized numpy over a single concatenated byte buffer (per-row offsets
via cumsum + fancy indexing — no per-row Python in the parse path); the
only per-row loop is the SHA-1 call of the Community ID, which — like
the minhash md5 family — has no vectorized form in the stdlib. Output
uses one static union schema (ether/vlan/ip/icmp/tcp/udp structs, null
when the layer is absent), since a DataFrame cannot emit the reference's
per-row adaptive schemas; the JSON printer drops nulls, so rendered
output matches the reference's goldens
(tenzir/integration/reference/pcap-format/step_00.ref).
"""

from __future__ import annotations

import hashlib
import struct

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: ICMP request/reply duals (community-id spec; libtenzir/src/icmp.cpp:15).
_ICMP_DUAL = {8: 0, 0: 8, 13: 14, 14: 13, 15: 16, 16: 15,
              10: 9, 9: 10, 17: 18, 18: 17}

#: ICMPv6 duals (libtenzir/src/icmp.cpp:42; types icmp.hpp:36-47).
_ICMP6_DUAL = {128: 129, 129: 128, 130: 131, 131: 130, 133: 134,
               134: 133, 135: 136, 136: 135, 139: 140, 140: 139,
               144: 145, 145: 144}

_FLAT_SCHEMA = (
    "ether_src string, ether_dst string, ether_type double, "
    "vlan_outer double, vlan_inner double, "
    "ip_src string, ip_dst string, ip_type double, "
    "icmp_type double, icmp_code double, "
    "tcp_src double, tcp_dst double, udp_src double, udp_dst double, "
    "community_id string"
)


def _community_ids(v4src, v4dst, v6src, v6dst, is_v6, proto, sport, dport,
                   seed: int = 0):
    """Community ID v1 (github.com/corelight/community-id-spec;
    libtenzir/include/tenzir/community_id.hpp:102-163):
    ``"1:" + b64(sha1(seed_be16 . src_ip . dst_ip . proto . 0 . sport_be
    . dport_be))`` with the flow tuple ordered so the smaller endpoint
    comes first (one-way ICMP messages keep their direction)."""
    import base64

    import numpy as np

    n = len(proto)
    sport = sport.astype(np.int64).copy()
    dport = dport.astype(np.int64).copy()
    one_way = np.zeros(n, dtype=bool)
    # ICMP/ICMPv6: src=message type, dst=message code; hash the dual
    # type as the "destination port" when one exists, else one-way
    # (community_id.hpp:96-112 normalizes both protocols this way)
    for pnum, table in ((1, _ICMP_DUAL), (58, _ICMP6_DUAL)):
        icmp = proto == pnum
        if not icmp.any():
            continue
        duals = np.full(n, -1, dtype=np.int64)
        for k, v in table.items():
            duals[icmp & (sport == k)] = v
        one_way |= icmp & (duals < 0)
        has_dual = icmp & (duals >= 0)
        dport[has_dual] = duals[has_dual]
    seed_b = struct.pack(">H", seed)
    pad = b"\x00"
    out = np.empty(n, dtype=object)
    for i in range(n):
        if is_v6[i]:
            a, b = bytes(v6src[i]), bytes(v6dst[i])
        else:
            a, b = struct.pack(">I", int(v4src[i])), struct.pack(">I", int(v4dst[i]))
        sp, dp = int(sport[i]), int(dport[i])
        ordered = one_way[i] or a < b or (a == b and sp < dp)
        if not ordered:
            a, b, sp, dp = b, a, dp, sp
        msg = (seed_b + a + b + bytes([int(proto[i])]) + pad
               + struct.pack(">HH", sp, dp))
        out[i] = "1:" + base64.b64encode(hashlib.sha1(msg).digest()).decode()
    return out


def _decap_flat(pdf, data_col: str, linktype_col: str):
    """Vectorized layer-2/3/4 header extraction for one Arrow batch."""
    import numpy as np
    import pandas as pd

    data = [bytes(b) if b is not None else b"" for b in pdf[data_col]]
    n = len(data)
    lens = np.fromiter((len(b) for b in data), dtype=np.int64, count=n)
    ends = np.cumsum(lens)
    starts = ends - lens
    buf = np.frombuffer(b"".join(data), dtype=np.uint8)
    if len(buf) == 0:
        # a batch of only empty/null payloads: one pad byte keeps the
        # clip-then-mask gathers in at() well-defined (every row's mask
        # is False, so the pad value is never observed)
        buf = np.zeros(1, dtype=np.uint8)
    cap = len(buf) - 1

    def at(off):
        """byte at per-row offset, 0 when out of range (mask separately)."""
        idx = starts + off
        ok = (off >= 0) & (off < lens)
        return np.where(ok, buf[np.clip(idx, 0, cap)], 0).astype(np.int64)

    def u16(off):
        return (at(off) << 8) | at(off + 1)

    linktype = pdf[linktype_col].to_numpy()

    # ---- layer 2: Ethernet (linktype 1; frame::make decapsulate.cpp:36)
    l2 = (linktype == 1) & (lens >= 14)
    etype = u16(12)
    l3off = np.full(n, 14, dtype=np.int64)
    vlan_outer = np.full(n, np.nan)
    vlan_inner = np.full(n, np.nan)
    # 802.1Q single tag (TPID 0x8100), QinQ when the inner TPID repeats
    q1 = l2 & (etype == 0x8100)
    ok1 = q1 & (lens >= 18)
    l2 &= ~q1 | ok1
    vlan_outer[ok1] = (u16(14) & 0x0FFF)[ok1]
    etype = np.where(ok1, u16(16), etype)
    l3off[ok1] = 18
    q2 = ok1 & (etype == 0x8100)
    ok2 = q2 & (lens >= 22)
    l2 &= ~q2 | ok2
    vlan_inner[ok2] = (u16(18) & 0x0FFF)[ok2]
    etype = np.where(ok2, u16(20), etype)
    l3off[ok2] = 22
    # 0x9100 double-tagged frame (decapsulate.cpp:77-86)
    qdb = (linktype == 1) & (lens >= 22) & (u16(12) == 0x9100)
    vlan_outer[qdb] = (u16(14) & 0x0FFF)[qdb]
    vlan_inner[qdb] = (u16(18) & 0x0FFF)[qdb]
    etype = np.where(qdb, u16(20), etype)
    l3off[qdb] = 22
    l2 |= qdb
    # a truncated QinQ frame clears l2 AFTER the outer tag was assigned
    # — mask the vlan fields like every other layer-2 output, so an
    # unparsable frame never emits a lone vlan struct
    vlan_outer[~l2] = np.nan
    vlan_inner[~l2] = np.nan

    hexes = np.array([f"{i:02X}" for i in range(256)])

    def mac(off):
        parts = [hexes[at(off + k)] for k in range(6)]
        s = parts[0]
        for p in parts[1:]:
            s = np.char.add(np.char.add(s, "-"), p)
        return s

    # frame layout: destination MAC first (decapsulate.cpp:44-46)
    ether_dst = mac(0)
    ether_src = mac(6)

    # ---- layer 3: IPv4 / IPv6 (packet::make decapsulate.cpp:107-139)
    rem = lens - l3off
    is_v4 = l2 & (etype == 0x0800) & (rem >= 20)
    ihl = (at(l3off) & 0x0F) * 4
    # IHL < 5 words is malformed (the transport offset would point
    # INSIDE the IP header, yielding bogus ports/community ids)
    is_v4 &= (ihl >= 20) & (rem >= ihl)
    is_v6 = l2 & (etype == 0x86DD) & (rem >= 40)
    l3 = is_v4 | is_v6
    ip_proto = np.where(is_v4, at(l3off + 9), at(l3off + 6))
    l4off = np.where(is_v4, l3off + ihl, l3off + 40)

    decs = np.array([str(i) for i in range(256)])

    def v4str(off):
        s = decs[at(off)]
        for k in (1, 2, 3):
            s = np.char.add(np.char.add(s, "."), decs[at(off + k)])
        return s

    v4src = ((at(l3off + 12) << 24) | (at(l3off + 13) << 16)
             | (at(l3off + 14) << 8) | at(l3off + 15))
    v4dst = ((at(l3off + 16) << 24) | (at(l3off + 17) << 16)
             | (at(l3off + 18) << 8) | at(l3off + 19))
    ip_src = np.where(is_v4, v4str(l3off + 12), None)
    ip_dst = np.where(is_v4, v4str(l3off + 16), None)
    v6src = np.zeros((n, 16), dtype=np.uint8)
    v6dst = np.zeros((n, 16), dtype=np.uint8)
    if is_v6.any():
        import ipaddress

        for k in range(16):
            v6src[:, k] = at(l3off + 8 + k)
            v6dst[:, k] = at(l3off + 24 + k)
        idx6 = np.nonzero(is_v6)[0]
        src6 = np.array([str(ipaddress.IPv6Address(bytes(v6src[i])))
                         for i in idx6], dtype=object)
        dst6 = np.array([str(ipaddress.IPv6Address(bytes(v6dst[i])))
                         for i in idx6], dtype=object)
        ip_src = ip_src.astype(object)
        ip_dst = ip_dst.astype(object)
        ip_src[idx6] = src6
        ip_dst[idx6] = dst6

    # ---- layer 4: TCP / UDP / ICMP (segment::make decapsulate.cpp:147-190)
    rem4 = lens - l4off
    is_tcp = l3 & (ip_proto == 6) & (rem4 >= 20)
    tcp_doff = (at(l4off + 12) >> 4) * 4
    is_tcp &= rem4 >= tcp_doff
    is_udp = l3 & (ip_proto == 17) & (rem4 >= 8)
    is_icmp = l3 & (ip_proto == 1) & (rem4 >= 8)
    l4 = is_tcp | is_udp | is_icmp
    sport = u16(l4off)
    dport = u16(l4off + 2)
    icmp_t = at(l4off)
    icmp_c = at(l4off + 1)

    cid = np.full(n, None, dtype=object)
    if l4.any():
        idx = np.nonzero(l4)[0]
        sp = np.where(is_icmp, icmp_t, sport)[idx]
        dp = np.where(is_icmp, icmp_c, dport)[idx]
        cid[idx] = _community_ids(
            v4src[idx], v4dst[idx], v6src[idx], v6dst[idx],
            is_v6[idx], ip_proto[idx], sp, dp)

    def fnum(arr, mask):
        out = arr.astype(float)
        out[~mask] = np.nan
        return out

    def fstr(arr, mask):
        out = np.array(arr, dtype=object)
        out[~mask] = None
        return out

    return pd.DataFrame({
        "ether_src": fstr(ether_src, l2),
        "ether_dst": fstr(ether_dst, l2),
        "ether_type": fnum(etype, l2),
        "vlan_outer": vlan_outer,
        "vlan_inner": vlan_inner,
        "ip_src": fstr(ip_src, l3),
        "ip_dst": fstr(ip_dst, l3),
        "ip_type": fnum(ip_proto, l3),
        "icmp_type": fnum(icmp_t, is_icmp),
        "icmp_code": fnum(icmp_c, is_icmp),
        "tcp_src": fnum(sport, is_tcp),
        "tcp_dst": fnum(dport, is_tcp),
        "udp_src": fnum(sport, is_udp),
        "udp_dst": fnum(dport, is_udp),
        "community_id": cid,
    })


def decapsulate(df: DataFrame, vxlan_port: int | None = None) -> DataFrame:
    """Parse ``pcap.packet`` rows into ``tenzir.packet`` events.

    Output: ``ether``/``vlan``/``ip``/``icmp``/``tcp``/``udp`` structs
    (null where that layer failed to parse — the reference's adaptive
    rows simply omit them), ``community_id``, and the untouched input
    record nested under ``pcap`` (decapsulate.cpp:377-390). Pure
    map-side: no shuffle, parallel over input partitions; header math is
    vectorized numpy.

    ``vxlan_port`` is accepted for signature parity (``-v/--vxlan``,
    decapsulate.cpp:416-430); the cited reference version parses the flag
    but its ``parse()`` path does not consume it, so neither do we.
    """
    orig = df.columns
    if "data" not in orig or "linktype" not in orig:
        raise ValueError("decapsulate expects 'pcap.packet'-shaped input "
                         "with 'linktype' and 'data' columns")

    passthrough = ", ".join(
        f"`{f.name}` {f.dataType.simpleString()}" for f in df.schema.fields)
    out_schema = f"{passthrough}, {_FLAT_SCHEMA}"

    def run(batches):
        for pdf in batches:
            flat = _decap_flat(pdf, "data", "linktype")
            yield pdf.reset_index(drop=True).join(flat)

    flat_df = df.mapInPandas(run, out_schema)

    def opt_struct(cond_col, fields: dict[str, str]):
        cond = F.col(cond_col).isNotNull()
        s = F.struct(*[F.col(src).cast(typ).alias(name)
                       for name, (src, typ) in fields.items()])
        return F.when(cond, s)

    return flat_df.select(
        opt_struct("ether_src", {
            "src": ("ether_src", "string"), "dst": ("ether_dst", "string"),
            "type": ("ether_type", "long")}).alias("ether"),
        opt_struct("vlan_outer", {
            "outer": ("vlan_outer", "long"),
            "inner": ("vlan_inner", "long")}).alias("vlan"),
        opt_struct("ip_src", {
            "src": ("ip_src", "string"), "dst": ("ip_dst", "string"),
            "type": ("ip_type", "long")}).alias("ip"),
        opt_struct("icmp_type", {
            "type": ("icmp_type", "long"),
            "code": ("icmp_code", "long")}).alias("icmp"),
        opt_struct("tcp_src", {
            "src_port": ("tcp_src", "long"),
            "dst_port": ("tcp_dst", "long")}).alias("tcp"),
        opt_struct("udp_src", {
            "src_port": ("udp_src", "long"),
            "dst_port": ("udp_dst", "long")}).alias("udp"),
        F.col("community_id"),
        F.struct(*[F.col(f"`{c}`") for c in orig]).alias("pcap"),
    )
