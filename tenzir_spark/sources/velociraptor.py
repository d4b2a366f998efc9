"""Velociraptor source: submit VQL to a Velociraptor server over its
gRPC API and return the response stream as events.

Semantics match the reference plugin
(/root/reference/plugins/velociraptor/src/plugin.cpp:90-258; proto at
plugins/velociraptor/velociraptor.proto, which is the official
Velociraptor API proto): stage one `VQLRequest` per --query/--subscribe,
call `API.Query(VQLCollectorArgs) -> stream VQLResponse`, and map each
response to events — a *data* message (non-empty `Response`, a JSON
array) yields one row per object as
``{timestamp, query_id, query{name,vql}, part, response{...}}``; a
*control* message (non-empty `log`) yields ``{timestamp, query_id,
log}`` (plugin.cpp:190-254).

No grpcio or HTTP/2 library ships in this environment, so the wire
layer is spoken from the public specs — RFC 7540 (HTTP/2 framing),
RFC 7541 (HPACK, including the Appendix B huffman table) and the
protobuf wire format — the same way sources/zmq.py speaks ZMTP without
libzmq and sources/fluentbit.py speaks the forward protocol. gRPC
message framing per the public gRPC-over-HTTP/2 spec: each message is
``<1-byte compressed flag><4-byte big-endian length><payload>`` on a
POST to ``/<package>.<Service>/<Method>`` with
``content-type: application/grpc`` and trailers carrying
``grpc-status``.

The network listener/dialer is driver-side by nature (one control
channel, like load_zmq); response rows spool to NDJSON and flow through
the distributed JSON reader. Bulk data belongs on s3a/gs paths — a VQL
hunt result is control-plane sized.
"""
from __future__ import annotations

import json
import os
import socket
import ssl
import struct
import tempfile
import threading
import time as _time
import uuid

__all__ = [
    "query_velociraptor", "load_velociraptor", "read_velociraptor",
    "make_subscribe_query", "FakeVelociraptorServer",
]

# --------------------------------------------------------------- protobuf
# Hand-rolled codec for exactly the three messages the API needs
# (velociraptor.proto): VQLRequest{VQL=1,Name=2},
# VQLCollectorArgs{Query=2,env=3,max_row=4,max_wait=6,ops_per_second=24,
# org_id=35}, VQLResponse{Response=1,Columns=2,Query=3,timestamp=4,
# query_id=5,part=6,total_rows=7,types=8,log=9}.


def _uvarint(v: int) -> bytes:
    out = bytearray()
    while True:
        b = v & 0x7F
        v >>= 7
        if v:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def _read_uvarint(buf: bytes, off: int) -> tuple[int, int]:
    shift = v = 0
    while True:
        b = buf[off]
        off += 1
        v |= (b & 0x7F) << shift
        if not b & 0x80:
            return v, off
        shift += 7
        if shift > 63:
            raise ValueError("varint too long")


def _pb_len(field: int, payload: bytes) -> bytes:
    return _uvarint((field << 3) | 2) + _uvarint(len(payload)) + payload


def _pb_str(field: int, s: str) -> bytes:
    return _pb_len(field, s.encode("utf-8"))


def _pb_int(field: int, v: int) -> bytes:
    return _uvarint(field << 3) + _uvarint(v)


def _pb_fields(buf: bytes):
    """Yield (field_number, wire_type, raw_value) triples."""
    off, n = 0, len(buf)
    while off < n:
        key, off = _read_uvarint(buf, off)
        field, wt = key >> 3, key & 7
        if wt == 0:
            val, off = _read_uvarint(buf, off)
        elif wt == 1:
            val, off = buf[off:off + 8], off + 8
        elif wt == 2:
            ln, off = _read_uvarint(buf, off)
            val, off = buf[off:off + ln], off + ln
        elif wt == 5:
            val, off = buf[off:off + 4], off + 4
        else:
            raise ValueError(f"unsupported protobuf wire type {wt}")
        yield field, wt, val


def encode_collector_args(requests: list[tuple[str, str]], max_rows: int,
                          max_wait: int, org_id: str,
                          env: dict[str, str] | None = None) -> bytes:
    out = bytearray()
    for name, vql in requests:
        out += _pb_len(2, _pb_str(1, vql) + _pb_str(2, name))
    for k, v in (env or {}).items():
        out += _pb_len(3, _pb_str(1, k) + _pb_str(2, v))
    if max_rows:
        out += _pb_int(4, int(max_rows))
    if max_wait:
        out += _pb_int(6, int(max_wait))
    if org_id:
        out += _pb_str(35, org_id)
    return bytes(out)


def decode_collector_args(buf: bytes) -> dict:
    args = {"requests": [], "env": {}, "max_rows": 0, "max_wait": 0,
            "org_id": ""}
    for field, _wt, val in _pb_fields(buf):
        if field == 2:
            req = {"name": "", "vql": ""}
            for f2, _w2, v2 in _pb_fields(val):
                if f2 == 1:
                    req["vql"] = v2.decode("utf-8")
                elif f2 == 2:
                    req["name"] = v2.decode("utf-8")
            args["requests"].append(req)
        elif field == 3:
            kv = {}
            for f2, _w2, v2 in _pb_fields(val):
                kv[{1: "key", 2: "value"}.get(f2, f2)] = v2.decode("utf-8")
            args["env"][kv.get("key", "")] = kv.get("value", "")
        elif field == 4:
            args["max_rows"] = val
        elif field == 6:
            args["max_wait"] = val
        elif field == 35:
            args["org_id"] = val.decode("utf-8")
    return args


def encode_vql_response(response: str = "", columns: list[str] = (),
                        query: tuple[str, str] | None = None,
                        timestamp: int = 0, query_id: int = 0,
                        part: int = 0, total_rows: int = 0,
                        log: str = "") -> bytes:
    out = bytearray()
    if response:
        out += _pb_str(1, response)
    for c in columns:
        out += _pb_str(2, c)
    if query is not None:
        name, vql = query
        out += _pb_len(3, _pb_str(1, vql) + _pb_str(2, name))
    if timestamp:
        out += _pb_int(4, timestamp)
    if query_id:
        out += _pb_int(5, query_id)
    if part:
        out += _pb_int(6, part)
    if total_rows:
        out += _pb_int(7, total_rows)
    if log:
        out += _pb_str(9, log)
    return bytes(out)


def decode_vql_response(buf: bytes) -> dict:
    resp = {"response": "", "columns": [], "query": {"name": "", "vql": ""},
            "timestamp": 0, "query_id": 0, "part": 0, "total_rows": 0,
            "log": ""}
    for field, _wt, val in _pb_fields(buf):
        if field == 1:
            resp["response"] = val.decode("utf-8")
        elif field == 2:
            resp["columns"].append(val.decode("utf-8"))
        elif field == 3:
            for f2, _w2, v2 in _pb_fields(val):
                if f2 == 1:
                    resp["query"]["vql"] = v2.decode("utf-8")
                elif f2 == 2:
                    resp["query"]["name"] = v2.decode("utf-8")
        elif field == 4:
            resp["timestamp"] = val
        elif field == 5:
            resp["query_id"] = val
        elif field == 6:
            resp["part"] = val
        elif field == 7:
            resp["total_rows"] = val
        elif field == 9:
            resp["log"] = val.decode("utf-8")
    return resp


# ------------------------------------------------------------------ HPACK
# RFC 7541. The huffman code table below is the spec's Appendix B data
# (verified against the Appendix C test vectors in tests); the static
# header table is Appendix A.

_HUFF_CODES = (
    0x1ff8, 0x7fffd8, 0xfffffe2, 0xfffffe3, 0xfffffe4, 0xfffffe5,
    0xfffffe6, 0xfffffe7, 0xfffffe8, 0xffffea, 0x3ffffffc, 0xfffffe9,
    0xfffffea, 0x3ffffffd, 0xfffffeb, 0xfffffec, 0xfffffed, 0xfffffee,
    0xfffffef, 0xffffff0, 0xffffff1, 0xffffff2, 0x3ffffffe, 0xffffff3,
    0xffffff4, 0xffffff5, 0xffffff6, 0xffffff7, 0xffffff8, 0xffffff9,
    0xffffffa, 0xffffffb, 0x14, 0x3f8, 0x3f9, 0xffa, 0x1ff9, 0x15, 0xf8,
    0x7fa, 0x3fa, 0x3fb, 0xf9, 0x7fb, 0xfa, 0x16, 0x17, 0x18, 0x0, 0x1,
    0x2, 0x19, 0x1a, 0x1b, 0x1c, 0x1d, 0x1e, 0x1f, 0x5c, 0xfb, 0x7ffc,
    0x20, 0xffb, 0x3fc, 0x1ffa, 0x21, 0x5d, 0x5e, 0x5f, 0x60, 0x61, 0x62,
    0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69, 0x6a, 0x6b, 0x6c, 0x6d,
    0x6e, 0x6f, 0x70, 0x71, 0x72, 0xfc, 0x73, 0xfd, 0x1ffb, 0x7fff0,
    0x1ffc, 0x3ffc, 0x22, 0x7ffd, 0x3, 0x23, 0x4, 0x24, 0x5, 0x25, 0x26,
    0x27, 0x6, 0x74, 0x75, 0x28, 0x29, 0x2a, 0x7, 0x2b, 0x76, 0x2c, 0x8,
    0x9, 0x2d, 0x77, 0x78, 0x79, 0x7a, 0x7b, 0x7ffe, 0x7fc, 0x3ffd,
    0x1ffd, 0xffffffc, 0xfffe6, 0x3fffd2, 0xfffe7, 0xfffe8, 0x3fffd3,
    0x3fffd4, 0x3fffd5, 0x7fffd9, 0x3fffd6, 0x7fffda, 0x7fffdb, 0x7fffdc,
    0x7fffdd, 0x7fffde, 0xffffeb, 0x7fffdf, 0xffffec, 0xffffed, 0x3fffd7,
    0x7fffe0, 0xffffee, 0x7fffe1, 0x7fffe2, 0x7fffe3, 0x7fffe4, 0x1fffdc,
    0x3fffd8, 0x7fffe5, 0x3fffd9, 0x7fffe6, 0x7fffe7, 0xffffef, 0x3fffda,
    0x1fffdd, 0xfffe9, 0x3fffdb, 0x3fffdc, 0x7fffe8, 0x7fffe9, 0x1fffde,
    0x7fffea, 0x3fffdd, 0x3fffde, 0xfffff0, 0x1fffdf, 0x3fffdf, 0x7fffeb,
    0x7fffec, 0x1fffe0, 0x1fffe1, 0x3fffe0, 0x1fffe2, 0x7fffed, 0x3fffe1,
    0x7fffee, 0x7fffef, 0xfffea, 0x3fffe2, 0x3fffe3, 0x3fffe4, 0x7ffff0,
    0x3fffe5, 0x3fffe6, 0x7ffff1, 0x3ffffe0, 0x3ffffe1, 0xfffeb, 0x7fff1,
    0x3fffe7, 0x7ffff2, 0x3fffe8, 0x1ffffec, 0x3ffffe2, 0x3ffffe3,
    0x3ffffe4, 0x7ffffde, 0x7ffffdf, 0x3ffffe5, 0xfffff1, 0x1ffffed,
    0x7fff2, 0x1fffe3, 0x3ffffe6, 0x7ffffe0, 0x7ffffe1, 0x3ffffe7,
    0x7ffffe2, 0xfffff2, 0x1fffe4, 0x1fffe5, 0x3ffffe8, 0x3ffffe9,
    0xffffffd, 0x7ffffe3, 0x7ffffe4, 0x7ffffe5, 0xfffec, 0xfffff3,
    0xfffed, 0x1fffe6, 0x3fffe9, 0x1fffe7, 0x1fffe8, 0x7ffff3, 0x3fffea,
    0x3fffeb, 0x1ffffee, 0x1ffffef, 0xfffff4, 0xfffff5, 0x3ffffea,
    0x7ffff4, 0x3ffffeb, 0x7ffffe6, 0x3ffffec, 0x3ffffed, 0x7ffffe7,
    0x7ffffe8, 0x7ffffe9, 0x7ffffea, 0x7ffffeb, 0xffffffe, 0x7ffffec,
    0x7ffffed, 0x7ffffee, 0x7ffffef, 0x7fffff0, 0x3ffffee, 0x3fffffff,
)
_HUFF_LENS = bytes((
    13, 23, 28, 28, 28, 28, 28, 28, 28, 24, 30, 28, 28, 30, 28, 28, 28,
    28, 28, 28, 28, 28, 30, 28, 28, 28, 28, 28, 28, 28, 28, 28, 6, 10,
    10, 12, 13, 6, 8, 11, 10, 10, 8, 11, 8, 6, 6, 6, 5, 5, 5, 6, 6, 6,
    6, 6, 6, 6, 7, 8, 15, 6, 12, 10, 13, 6, 7, 7, 7, 7, 7, 7, 7, 7, 7,
    7, 7, 7, 7, 7, 7, 7, 7, 7, 7, 7, 7, 7, 8, 7, 8, 13, 19, 13, 14, 6,
    15, 5, 6, 5, 6, 5, 6, 6, 6, 5, 7, 7, 6, 6, 6, 5, 6, 7, 6, 5, 5, 6,
    7, 7, 7, 7, 7, 15, 11, 14, 13, 28, 20, 22, 20, 20, 22, 22, 22, 23,
    22, 23, 23, 23, 23, 23, 24, 23, 24, 24, 22, 23, 24, 23, 23, 23, 23,
    21, 22, 23, 22, 23, 23, 24, 22, 21, 20, 22, 22, 23, 23, 21, 23, 22,
    22, 24, 21, 22, 23, 23, 21, 21, 22, 21, 23, 22, 23, 23, 20, 22, 22,
    22, 23, 22, 22, 23, 26, 26, 20, 19, 22, 23, 22, 25, 26, 26, 26, 27,
    27, 26, 24, 25, 19, 21, 26, 27, 27, 26, 27, 24, 21, 21, 26, 26, 28,
    27, 27, 27, 20, 24, 20, 21, 22, 21, 21, 23, 22, 22, 25, 25, 24, 24,
    26, 23, 26, 27, 26, 26, 27, 27, 27, 27, 27, 28, 27, 27, 27, 27, 27,
    26, 30,
))
_HUFF_DECODE = {(_HUFF_CODES[i], _HUFF_LENS[i]): i for i in range(257)}


def huffman_decode(data: bytes) -> bytes:
    out = bytearray()
    cur = nbits = 0
    for byte in data:
        for shift in range(7, -1, -1):
            cur = (cur << 1) | ((byte >> shift) & 1)
            nbits += 1
            sym = _HUFF_DECODE.get((cur, nbits))
            if sym is not None:
                if sym == 256:
                    raise ValueError("EOS symbol inside huffman string")
                out.append(sym)
                cur = nbits = 0
            elif nbits > 30:
                raise ValueError("invalid huffman code")
    # per RFC 7541 §5.2 padding must be the EOS prefix (all ones), <8 bits
    if nbits >= 8 or cur != (1 << nbits) - 1:
        raise ValueError("invalid huffman padding")
    return bytes(out)


def huffman_encode(data: bytes) -> bytes:
    bits = nbits = 0
    out = bytearray()
    for b in data:
        bits = (bits << _HUFF_LENS[b]) | _HUFF_CODES[b]
        nbits += _HUFF_LENS[b]
        while nbits >= 8:
            nbits -= 8
            out.append((bits >> nbits) & 0xFF)
    if nbits:
        out.append(((bits << (8 - nbits)) | ((1 << (8 - nbits)) - 1)) & 0xFF)
    return bytes(out)


_HPACK_STATIC = [
    (":authority", ""), (":method", "GET"), (":method", "POST"),
    (":path", "/"), (":path", "/index.html"), (":scheme", "http"),
    (":scheme", "https"), (":status", "200"), (":status", "204"),
    (":status", "206"), (":status", "304"), (":status", "400"),
    (":status", "404"), (":status", "500"), ("accept-charset", ""),
    ("accept-encoding", "gzip, deflate"), ("accept-language", ""),
    ("accept-ranges", ""), ("accept", ""),
    ("access-control-allow-origin", ""), ("age", ""), ("allow", ""),
    ("authorization", ""), ("cache-control", ""),
    ("content-disposition", ""), ("content-encoding", ""),
    ("content-language", ""), ("content-length", ""),
    ("content-location", ""), ("content-range", ""), ("content-type", ""),
    ("cookie", ""), ("date", ""), ("etag", ""), ("expect", ""),
    ("expires", ""), ("from", ""), ("host", ""), ("if-match", ""),
    ("if-modified-since", ""), ("if-none-match", ""), ("if-range", ""),
    ("if-unmodified-since", ""), ("last-modified", ""), ("link", ""),
    ("location", ""), ("max-forwards", ""), ("proxy-authenticate", ""),
    ("proxy-authorization", ""), ("range", ""), ("referer", ""),
    ("refresh", ""), ("retry-after", ""), ("server", ""),
    ("set-cookie", ""), ("strict-transport-security", ""),
    ("transfer-encoding", ""), ("user-agent", ""), ("vary", ""),
    ("via", ""), ("www-authenticate", ""),
]


def _hpack_int(value: int, prefix_bits: int, first_byte: int = 0) -> bytes:
    limit = (1 << prefix_bits) - 1
    if value < limit:
        return bytes([first_byte | value])
    out = bytearray([first_byte | limit])
    value -= limit
    while value >= 128:
        out.append((value & 0x7F) | 0x80)
        value >>= 7
    out.append(value)
    return bytes(out)


def _hpack_read_int(buf: bytes, off: int, prefix_bits: int) -> tuple[int, int]:
    limit = (1 << prefix_bits) - 1
    v = buf[off] & limit
    off += 1
    if v < limit:
        return v, off
    shift = 0
    while True:
        b = buf[off]
        off += 1
        v += (b & 0x7F) << shift
        if not b & 0x80:
            return v, off
        shift += 7


def _hpack_str(s: str) -> bytes:
    raw = s.encode("utf-8")
    return _hpack_int(len(raw), 7) + raw  # no huffman on the encode side


def hpack_encode(headers: list[tuple[str, str]]) -> bytes:
    """Encode every header as 'literal without indexing — new name'
    (RFC 7541 §6.2.2, 0b0000 prefix): stateless, legal for any peer,
    and the decoder needs no assumptions about our dynamic table."""
    out = bytearray()
    for name, value in headers:
        out.append(0x00)
        out += _hpack_str(name)
        out += _hpack_str(value)
    return bytes(out)


class HpackDecoder:
    """Stateful HPACK decoder: static + dynamic table, huffman strings,
    all four literal forms and table-size updates (RFC 7541 §6)."""

    def __init__(self, max_table_size: int = 4096):
        self.dynamic: list[tuple[str, str]] = []
        self.max_size = max_table_size
        self.size = 0

    def _entry(self, index: int) -> tuple[str, str]:
        if index <= 0:
            raise ValueError("HPACK index 0")
        if index <= len(_HPACK_STATIC):
            return _HPACK_STATIC[index - 1]
        d = index - len(_HPACK_STATIC) - 1
        if d >= len(self.dynamic):
            raise ValueError(f"HPACK index {index} out of range")
        return self.dynamic[d]

    def _insert(self, name: str, value: str) -> None:
        self.dynamic.insert(0, (name, value))
        self.size += len(name.encode()) + len(value.encode()) + 32
        while self.size > self.max_size and self.dynamic:
            n, v = self.dynamic.pop()
            self.size -= len(n.encode()) + len(v.encode()) + 32

    def _read_str(self, buf: bytes, off: int) -> tuple[str, int]:
        huff = bool(buf[off] & 0x80)
        ln, off = _hpack_read_int(buf, off, 7)
        raw = buf[off:off + ln]
        off += ln
        if huff:
            raw = huffman_decode(raw)
        return raw.decode("utf-8", "surrogateescape"), off

    def decode(self, buf: bytes) -> list[tuple[str, str]]:
        out: list[tuple[str, str]] = []
        off = 0
        while off < len(buf):
            b = buf[off]
            if b & 0x80:  # indexed
                idx, off = _hpack_read_int(buf, off, 7)
                out.append(self._entry(idx))
            elif b & 0x40:  # literal with incremental indexing
                idx, off = _hpack_read_int(buf, off, 6)
                name, off = (self._entry(idx)[0], off) if idx \
                    else self._read_str(buf, off)
                value, off = self._read_str(buf, off)
                self._insert(name, value)
                out.append((name, value))
            elif b & 0x20:  # dynamic table size update
                self.max_size, off = _hpack_read_int(buf, off, 5)
                while self.size > self.max_size and self.dynamic:
                    n, v = self.dynamic.pop()
                    self.size -= len(n.encode()) + len(v.encode()) + 32
            else:  # literal without indexing (0000) / never indexed (0001)
                idx, off = _hpack_read_int(buf, off, 4)
                name, off = (self._entry(idx)[0], off) if idx \
                    else self._read_str(buf, off)
                value, off = self._read_str(buf, off)
                out.append((name, value))
        return out


# ----------------------------------------------------------------- HTTP/2

_PREFACE = b"PRI * HTTP/2.0\r\n\r\nSM\r\n\r\n"
_FT_DATA, _FT_HEADERS, _FT_RST, _FT_SETTINGS = 0x0, 0x1, 0x3, 0x4
_FT_PING, _FT_GOAWAY, _FT_WINDOW_UPDATE, _FT_CONTINUATION = 0x6, 0x7, 0x8, 0x9
_FLAG_END_STREAM, _FLAG_END_HEADERS, _FLAG_ACK = 0x1, 0x4, 0x1
_MAX_FRAME = 16384  # RFC 7540 default SETTINGS_MAX_FRAME_SIZE


def _frame(ftype: int, flags: int, stream_id: int, payload: bytes) -> bytes:
    return struct.pack(">I", len(payload))[1:] + bytes([ftype, flags]) + \
        struct.pack(">I", stream_id & 0x7FFFFFFF) + payload


def _read_exact(sock: socket.socket, n: int) -> bytes:
    buf = bytearray()
    while len(buf) < n:
        chunk = sock.recv(n - len(buf))
        if not chunk:
            raise ConnectionError("peer closed mid-frame")
        buf += chunk
    return bytes(buf)


def _read_frame(sock: socket.socket) -> tuple[int, int, int, bytes]:
    hdr = _read_exact(sock, 9)
    length = int.from_bytes(hdr[:3], "big")
    ftype, flags = hdr[3], hdr[4]
    sid = int.from_bytes(hdr[5:9], "big") & 0x7FFFFFFF
    return ftype, flags, sid, _read_exact(sock, length) if length else b""


def grpc_frame(msg: bytes) -> bytes:
    return b"\x00" + struct.pack(">I", len(msg)) + msg


def _grpc_unframe(buf: bytearray):
    """Pop complete gRPC messages off the front of ``buf``."""
    while len(buf) >= 5:
        if buf[0] != 0:
            raise ValueError("compressed gRPC frames not supported "
                             "(grpc-accept-encoding was 'identity')")
        ln = int.from_bytes(buf[1:5], "big")
        if len(buf) < 5 + ln:
            return
        yield bytes(buf[5:5 + ln])
        del buf[:5 + ln]


def grpc_call(host: str, port: int, path: str, request: bytes,
              tls_context: ssl.SSLContext | None = None,
              authority: str | None = None, server_hostname: str | None = None,
              timeout: float = 30.0):
    """One gRPC call (unary request -> server stream). Yields response
    message bytes; raises on non-zero ``grpc-status``. Client-side HTTP/2
    subset: single stream (id 1), literal-encoded request headers,
    full response HPACK (static+dynamic+huffman), flow-control window
    replenishment, PING acks."""
    raw = socket.create_connection((host, port), timeout=timeout)
    sock: socket.socket = raw
    try:
        if tls_context is not None:
            sock = tls_context.wrap_socket(
                raw, server_hostname=server_hostname or host)
            if sock.selected_alpn_protocol() not in (None, "h2"):
                raise ConnectionError(
                    f"server refused h2 via ALPN: "
                    f"{sock.selected_alpn_protocol()!r}")
        sock.settimeout(timeout)
        sock.sendall(_PREFACE + _frame(_FT_SETTINGS, 0, 0, b""))
        headers = [
            (":method", "POST"),
            (":scheme", "https" if tls_context is not None else "http"),
            (":path", path),
            (":authority", authority or f"{host}:{port}"),
            ("te", "trailers"),
            ("content-type", "application/grpc"),
            ("grpc-accept-encoding", "identity"),
            ("user-agent", "tenzir-spark-grpc/0.1"),
        ]
        sock.sendall(_frame(_FT_HEADERS, _FLAG_END_HEADERS, 1,
                            hpack_encode(headers)))
        body = grpc_frame(request)
        for i in range(0, len(body), _MAX_FRAME):
            chunk = body[i:i + _MAX_FRAME]
            last = i + _MAX_FRAME >= len(body)
            sock.sendall(_frame(_FT_DATA, _FLAG_END_STREAM if last else 0,
                                1, chunk))
        decoder = HpackDecoder()
        msgbuf = bytearray()
        resp_headers: dict[str, str] = {}
        trailers: dict[str, str] = {}
        hdr_accum: bytearray | None = None
        hdr_end_stream = False
        deadline = _time.monotonic() + timeout
        while True:
            if _time.monotonic() > deadline:
                raise TimeoutError("gRPC response timed out")
            ftype, flags, sid, payload = _read_frame(sock)
            if ftype == _FT_SETTINGS:
                if not flags & _FLAG_ACK:
                    sock.sendall(_frame(_FT_SETTINGS, _FLAG_ACK, 0, b""))
            elif ftype == _FT_PING:
                if not flags & _FLAG_ACK:
                    sock.sendall(_frame(_FT_PING, _FLAG_ACK, 0, payload))
            elif ftype == _FT_GOAWAY:
                err = int.from_bytes(payload[4:8], "big") if len(payload) >= 8 else 0
                if err:
                    raise ConnectionError(f"GOAWAY error {err}")
            elif ftype in (_FT_HEADERS, _FT_CONTINUATION) and sid == 1:
                if ftype == _FT_HEADERS:
                    hdr_accum = bytearray()
                    hdr_end_stream = bool(flags & _FLAG_END_STREAM)
                    if flags & 0x8:  # PADDED
                        pad = payload[0]
                        payload = payload[1:len(payload) - pad]
                    if flags & 0x20:  # PRIORITY
                        payload = payload[5:]
                elif hdr_accum is None:
                    raise ConnectionError("CONTINUATION without HEADERS")
                hdr_accum += payload
                if flags & _FLAG_END_HEADERS:
                    block = dict(decoder.decode(bytes(hdr_accum)))
                    hdr_accum = None
                    if resp_headers and ":status" not in block:
                        trailers = block
                    elif "grpc-status" in block and ":status" not in block:
                        trailers = block
                    else:
                        resp_headers = block
                        # trailers-only response: grpc-status rides the
                        # initial HEADERS with END_STREAM
                        if "grpc-status" in block:
                            trailers = block
                    if hdr_end_stream:
                        break
            elif ftype == _FT_DATA and sid == 1:
                if flags & 0x8:  # PADDED
                    pad = payload[0]
                    payload = payload[1:len(payload) - pad]
                if payload:
                    # replenish both flow-control windows so a response
                    # stream larger than 64 KiB keeps flowing; a send
                    # failure is not fatal — the peer may already have
                    # finished the stream and half-closed, and its
                    # remaining frames are still in our receive buffer
                    inc = struct.pack(">I", len(payload))
                    try:
                        sock.sendall(_frame(_FT_WINDOW_UPDATE, 0, 0, inc) +
                                     _frame(_FT_WINDOW_UPDATE, 0, 1, inc))
                    except OSError:
                        pass
                    msgbuf += payload
                    yield from _grpc_unframe(msgbuf)
                if flags & _FLAG_END_STREAM:
                    break
            elif ftype == _FT_RST and sid == 1:
                raise ConnectionError(
                    f"stream reset, error "
                    f"{int.from_bytes(payload[:4], 'big')}")
        status = int(trailers.get("grpc-status", "0") or "0")
        if status != 0:
            raise RuntimeError(
                f"gRPC status {status}: {trailers.get('grpc-message', '')}")
    finally:
        try:
            sock.close()
        finally:
            if sock is not raw:
                raw.close()


# ----------------------------------------------------------- velociraptor

#: Artifact-subscription VQL, byte-for-byte the reference's template
#: (plugin.cpp:70-110, credited there to Christoph Lobmeyer): watch
#: System.Flow.Completion and re-source every completed flow whose
#: artifacts match the subscription.
SUBSCRIBE_ARTIFACT_VQL = """\
LET subscribe_artifact = {artifact}

LET completions = SELECT *
                  FROM watch_monitoring(artifact="System.Flow.Completion")
                  WHERE Flow.artifacts_with_results =~ subscribe_artifact

SELECT *
FROM foreach(
  row=completions,
  query={{
     SELECT *
     FROM foreach(
       row=Flow.artifacts_with_results,
       query={{
         SELECT *
         FROM if(
          condition=(_value =~ subscribe_artifact),
          then={{
             SELECT
               {{
                 SELECT *
                 FROM source(
                   client_id=ClientId,
                   flow_id=Flow.session_id,
                   artifact=_value)
               }} AS HuntResult,
               _value AS Artifact,
               client_info(client_id=ClientId).os_info.hostname AS Hostname,
               timestamp(epoch=now()) AS timestamp,
               ClientId,
               Flow.session_id AS FlowId
             FROM source(
               client_id=ClientId,
               flow_id=Flow.session_id,
               artifact=_value)
             GROUP BY
               artifact
          }})
        }})
  }})"""


def make_subscribe_query(artifact: str) -> str:
    return SUBSCRIBE_ARTIFACT_VQL.format(artifact=artifact)


def _load_api_config(config) -> dict:
    """Velociraptor api_client config: either a dict or a path to the
    YAML `velociraptor config api_client` emits (the reference reads it
    from /etc/tenzir/plugin/velociraptor.yaml). Requires
    ca_certificate, client_private_key, client_cert,
    api_connection_string — same four keys plugin.cpp:128-168 demands."""
    if isinstance(config, dict):
        cfg = config
    else:
        try:
            import yaml
        except ImportError as exc:  # pragma: no cover
            raise NotImplementedError(
                "reading a velociraptor.yaml config needs PyYAML; pass "
                "the config as a dict instead") from exc
        with open(config) as fh:
            cfg = yaml.safe_load(fh)
    for key in ("ca_certificate", "client_private_key", "client_cert",
                "api_connection_string"):
        if key not in cfg:
            raise ValueError(
                f"no {key!r} found in config file — generate a valid "
                f"config with `velociraptor config api_client`")
    return cfg


def _tls_context(cfg: dict) -> ssl.SSLContext:
    ctx = ssl.SSLContext(ssl.PROTOCOL_TLS_CLIENT)
    ctx.minimum_version = ssl.TLSVersion.TLSv1_2
    ctx.load_verify_locations(cadata=cfg["ca_certificate"])
    # load_cert_chain only takes paths — spool the PEM blocks
    with tempfile.NamedTemporaryFile("w", suffix=".pem", delete=False) as cf, \
            tempfile.NamedTemporaryFile("w", suffix=".pem", delete=False) as kf:
        cf.write(cfg["client_cert"])
        kf.write(cfg["client_private_key"])
        cert_path, key_path = cf.name, kf.name
    try:
        ctx.load_cert_chain(cert_path, key_path)
    finally:
        os.unlink(cert_path)
        os.unlink(key_path)
    ctx.set_alpn_protocols(["h2"])
    # Velociraptor uses self-signed certs with a fixed server name; the
    # reference overrides the TLS target name the same way
    # (plugin.cpp:171-173 SetSslTargetNameOverride)
    return ctx


def query_velociraptor(query: str | None = None,
                       subscribe: str | None = None,
                       request_name: str | None = None,
                       org_id: str = "root", max_rows: int = 1000,
                       max_wait: int = 1, config=None,
                       endpoint: str | None = None,
                       timeout: float = 30.0) -> list[dict]:
    """Submit VQL and return the response rows (reference row shape).
    ``config`` drives mutual-TLS gRPC like the reference; ``endpoint``
    ("host:port") speaks cleartext h2c instead — the loopback/test path
    and proxied deployments."""
    requests: list[tuple[str, str]] = []
    name = request_name or str(uuid.uuid4())
    if query:
        requests.append((name, query))
    if subscribe:
        requests.append((name, make_subscribe_query(subscribe)))
    if not requests:
        raise ValueError("no artifact subscription or VQL expression "
                         "provided — pass query= or subscribe=")
    if config is not None:
        cfg = _load_api_config(config)
        host, _, port = cfg["api_connection_string"].rpartition(":")
        ctx: ssl.SSLContext | None = _tls_context(cfg)
        server_hostname = "VelociraptorServer"
    elif endpoint is not None:
        host, _, port = endpoint.rpartition(":")
        ctx, server_hostname = None, None
    else:
        raise ValueError("pass config= (mutual-TLS, like the reference) "
                         "or endpoint= (cleartext h2c)")
    args = encode_collector_args(requests, max_rows, max_wait, org_id)
    rows: list[dict] = []
    for msg in grpc_call(host, int(port), "/proto.API/Query", args,
                         tls_context=ctx, server_hostname=server_hostname,
                         timeout=timeout):
        resp = decode_vql_response(msg)
        ts = resp["timestamp"] / 1e6  # microseconds -> seconds
        if resp["response"]:
            objects = json.loads(resp["response"])
            if not isinstance(objects, list):
                continue  # reference warns + skips non-list payloads
            for obj in objects:
                if not isinstance(obj, dict):
                    continue
                rows.append({
                    "timestamp": ts,
                    "query_id": resp["query_id"],
                    "query": dict(resp["query"]),
                    "part": resp["part"],
                    "response": obj,
                })
        elif resp["log"]:
            rows.append({"timestamp": ts, "query_id": resp["query_id"],
                         "log": resp["log"]})
    return rows


def load_velociraptor(**kwargs) -> str:
    """query_velociraptor -> NDJSON spool path for the distributed JSON
    reader (same seam as load_zmq / load_forward)."""
    rows = query_velociraptor(**kwargs)
    fd, spool = tempfile.mkstemp(prefix="tenzir_vr_", suffix=".ndjson")
    with os.fdopen(fd, "w") as fh:
        for r in rows:
            fh.write(json.dumps(r) + "\n")
    return spool


def read_velociraptor(spark, **kwargs):
    """DataFrame of response events, schema inferred by the JSON reader
    (the reference's series_builder does the same inference)."""
    spool = load_velociraptor(**kwargs)
    return spark.read.json(spool)


# ----------------------------------------------------------- fake server


class FakeVelociraptorServer:
    """Loopback h2c gRPC server speaking exactly the API.Query subset —
    the test double for environments without a Velociraptor daemon
    (pattern: test_zmq's ZMTP loopback, test_fluentbit's forward agent).
    ``handler(vql) -> list[dict]`` supplies rows; they are streamed back
    in ``max_rows``-sized VQLResponse parts plus one log control
    message, mirroring the server's control/data message mix."""

    def __init__(self, handler, host: str = "127.0.0.1", port: int = 0,
                 tls: ssl.SSLContext | None = None):
        self.handler = handler
        self.tls = tls  # server-side context (mutual-TLS deployments)
        self.srv = socket.socket()
        self.srv.setsockopt(socket.SOL_SOCKET, socket.SO_REUSEADDR, 1)
        self.srv.bind((host, port))
        self.srv.listen(4)
        self.port = self.srv.getsockname()[1]
        self.requests: list[dict] = []
        self._thread = threading.Thread(target=self._serve, daemon=True)

    def __enter__(self):
        self._thread.start()
        return self

    def __exit__(self, *exc):
        try:
            self.srv.close()
        except OSError:
            pass
        self._thread.join(timeout=5)

    def _serve(self):
        try:
            conn, _ = self.srv.accept()
        except OSError:
            return
        with conn:
            conn.settimeout(10)
            try:
                if self.tls is not None:
                    conn = self.tls.wrap_socket(conn, server_side=True)
                self._handle(conn)
            except (ConnectionError, OSError, TimeoutError, ssl.SSLError):
                pass

    def _handle(self, conn: socket.socket):
        preface = _read_exact(conn, len(_PREFACE))
        if preface != _PREFACE:
            raise ConnectionError("bad HTTP/2 preface")
        conn.sendall(_frame(_FT_SETTINGS, 0, 0, b""))
        decoder = HpackDecoder()
        body = bytearray()
        sid = 1
        while True:
            ftype, flags, fsid, payload = _read_frame(conn)
            if ftype == _FT_SETTINGS and not flags & _FLAG_ACK:
                conn.sendall(_frame(_FT_SETTINGS, _FLAG_ACK, 0, b""))
            elif ftype == _FT_HEADERS:
                sid = fsid
                decoder.decode(payload)  # keep dynamic table in sync
            elif ftype == _FT_DATA:
                body += payload
                if flags & _FLAG_END_STREAM:
                    break
        msgs = list(_grpc_unframe(body))
        args = decode_collector_args(msgs[0]) if msgs else {}
        self.requests.append(args)
        conn.sendall(_frame(_FT_HEADERS, _FLAG_END_HEADERS, sid, hpack_encode(
            [(":status", "200"), ("content-type", "application/grpc")])))
        now_us = int(_time.time() * 1e6)
        qid = 1
        for req in args.get("requests", [{"name": "", "vql": ""}]):
            rows = self.handler(req["vql"])
            cols = sorted({k for r in rows for k in r}) if rows else []
            step = int(args.get("max_rows") or 1000) or 1000
            part = 0
            for i in range(0, len(rows), step):
                chunk = rows[i:i + step]
                msg = encode_vql_response(
                    response=json.dumps(chunk), columns=cols,
                    query=(req["name"], req["vql"]), timestamp=now_us,
                    query_id=qid, part=part, total_rows=len(chunk))
                conn.sendall(_frame(_FT_DATA, 0, sid, grpc_frame(msg)))
                part += 1
            log = encode_vql_response(
                query=(req["name"], req["vql"]), timestamp=now_us,
                query_id=qid,
                log=f"query {req['name']}: {len(rows)} rows")
            conn.sendall(_frame(_FT_DATA, 0, sid, grpc_frame(log)))
            qid += 1
        conn.sendall(_frame(_FT_HEADERS,
                            _FLAG_END_HEADERS | _FLAG_END_STREAM, sid,
                            hpack_encode([("grpc-status", "0"),
                                          ("grpc-message", "")])))
        # drain the client's in-flight WINDOW_UPDATEs until it closes —
        # closing first would RST its last writes mid-stream
        conn.settimeout(2)
        try:
            while conn.recv(4096):
                pass
        except (TimeoutError, OSError):
            pass
