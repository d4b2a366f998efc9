"""Minimal gRPC-over-HTTP/2 client, written from the public specs with
no third-party dependencies (same approach as the ZMTP and fluent-bit
forward connectors: the sandbox has no grpcio/h2, so the wire protocols
are implemented from their RFCs).

Specs implemented (subset a unary/server-streaming gRPC call needs):
- HTTP/2 framing and connection lifecycle: RFC 9113 (ex 7540) —
  connection preface, SETTINGS exchange/ack, HEADERS(+CONTINUATION),
  DATA, PING ack, WINDOW_UPDATE flow control, RST_STREAM, GOAWAY.
- HPACK header compression: RFC 7541 — full static table, dynamic
  table (decode side), Huffman decode (Appendix B code table), and a
  conservative encoder (indexed static entries for exact matches,
  literal-without-indexing otherwise, no Huffman on emit — legal per
  spec and keeps the encoder stateless).
- gRPC wire protocol: the gRPC-over-HTTP/2 PROTOCOL-HTTP2 spec —
  5-byte message prefix (compressed flag + u32 length), content-type
  application/grpc, te: trailers, grpc-status/grpc-message trailers.

Reference parity: plugins/velociraptor/src/plugin.cpp uses grpc::Channel
with SslCredentials; here TLS is Python's ssl module with ALPN h2 and
optional mutual-TLS client certs (the Velociraptor API requires them;
`server_name_override` mirrors grpc's SetSslTargetNameOverride for the
self-signed server certificate).
"""

from __future__ import annotations

import socket
import ssl
import struct
import tempfile

# ------------------------------------------------------------------ HPACK

# RFC 7541 Appendix A — the 61-entry static table
HPACK_STATIC = [
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

# RFC 7541 Appendix B — Huffman code for each symbol 0..256 (256 = EOS).
_HUFF = [
    (0x1ff8, 13), (0x7fffd8, 23), (0xfffffe2, 28), (0xfffffe3, 28),
    (0xfffffe4, 28), (0xfffffe5, 28), (0xfffffe6, 28), (0xfffffe7, 28),
    (0xfffffe8, 28), (0xffffea, 24), (0x3ffffffc, 30), (0xfffffe9, 28),
    (0xfffffea, 28), (0x3ffffffd, 30), (0xfffffeb, 28), (0xfffffec, 28),
    (0xfffffed, 28), (0xfffffee, 28), (0xfffffef, 28), (0xffffff0, 28),
    (0xffffff1, 28), (0xffffff2, 28), (0x3ffffffe, 30), (0xffffff3, 28),
    (0xffffff4, 28), (0xffffff5, 28), (0xffffff6, 28), (0xffffff7, 28),
    (0xffffff8, 28), (0xffffff9, 28), (0xffffffa, 28), (0xffffffb, 28),
    (0x14, 6), (0x3f8, 10), (0x3f9, 10), (0xffa, 12),
    (0x1ff9, 13), (0x15, 6), (0xf8, 8), (0x7fa, 11),
    (0x3fa, 10), (0x3fb, 10), (0xf9, 8), (0x7fb, 11),
    (0xfa, 8), (0x16, 6), (0x17, 6), (0x18, 6),
    (0x0, 5), (0x1, 5), (0x2, 5), (0x19, 6),
    (0x1a, 6), (0x1b, 6), (0x1c, 6), (0x1d, 6),
    (0x1e, 6), (0x1f, 6), (0x5c, 7), (0xfb, 8),
    (0x7ffc, 15), (0x20, 6), (0xffb, 12), (0x3fc, 10),
    (0x1ffa, 13), (0x21, 6), (0x5d, 7), (0x5e, 7),
    (0x5f, 7), (0x60, 7), (0x61, 7), (0x62, 7),
    (0x63, 7), (0x64, 7), (0x65, 7), (0x66, 7),
    (0x67, 7), (0x68, 7), (0x69, 7), (0x6a, 7),
    (0x6b, 7), (0x6c, 7), (0x6d, 7), (0x6e, 7),
    (0x6f, 7), (0x70, 7), (0x71, 7), (0x72, 7),
    (0xfc, 8), (0x73, 7), (0xfd, 8), (0x1ffb, 13),
    (0x7fff0, 19), (0x1ffc, 13), (0x3ffc, 14), (0x22, 6),
    (0x7ffd, 15), (0x3, 5), (0x23, 6), (0x4, 5),
    (0x24, 6), (0x5, 5), (0x25, 6), (0x26, 6),
    (0x27, 6), (0x6, 5), (0x74, 7), (0x75, 7),
    (0x28, 6), (0x29, 6), (0x2a, 6), (0x7, 5),
    (0x2b, 6), (0x76, 7), (0x2c, 6), (0x8, 5),
    (0x9, 5), (0x2d, 6), (0x77, 7), (0x78, 7),
    (0x79, 7), (0x7a, 7), (0x7b, 7), (0x7ffe, 15),
    (0x7fc, 11), (0x3ffd, 14), (0x1ffd, 13), (0xffffffc, 28),
    (0xfffe6, 20), (0x3fffd2, 22), (0xfffe7, 20), (0xfffe8, 20),
    (0x3fffd3, 22), (0x3fffd4, 22), (0x3fffd5, 22), (0x7fffd9, 23),
    (0x3fffd6, 22), (0x7fffda, 23), (0x7fffdb, 23), (0x7fffdc, 23),
    (0x7fffdd, 23), (0x7fffde, 23), (0xffffeb, 24), (0x7fffdf, 23),
    (0xffffec, 24), (0xffffed, 24), (0x3fffd7, 22), (0x7fffe0, 23),
    (0xffffee, 24), (0x7fffe1, 23), (0x7fffe2, 23), (0x7fffe3, 23),
    (0x7fffe4, 23), (0x1fffdc, 21), (0x3fffd8, 22), (0x7fffe5, 23),
    (0x3fffd9, 22), (0x7fffe6, 23), (0x7fffe7, 23), (0xffffef, 24),
    (0x3fffda, 22), (0x1fffdd, 21), (0xfffe9, 20), (0x3fffdb, 22),
    (0x3fffdc, 22), (0x7fffe8, 23), (0x7fffe9, 23), (0x1fffde, 21),
    (0x7fffea, 23), (0x3fffdd, 22), (0x3fffde, 22), (0xfffff0, 24),
    (0x1fffdf, 21), (0x3fffdf, 22), (0x7fffeb, 23), (0x7fffec, 23),
    (0x1fffe0, 21), (0x1fffe1, 21), (0x3fffe0, 22), (0x1fffe2, 21),
    (0x7fffed, 23), (0x3fffe1, 22), (0x7fffee, 23), (0x7fffef, 23),
    (0xfffea, 20), (0x3fffe2, 22), (0x3fffe3, 22), (0x3fffe4, 22),
    (0x7ffff0, 23), (0x3fffe5, 22), (0x3fffe6, 22), (0x7ffff1, 23),
    (0x3ffffe0, 26), (0x3ffffe1, 26), (0xfffeb, 20), (0x7fff1, 19),
    (0x3fffe7, 22), (0x7ffff2, 23), (0x3fffe8, 22), (0x1ffffec, 25),
    (0x3ffffe2, 26), (0x3ffffe3, 26), (0x3ffffe4, 26), (0x7ffffde, 27),
    (0x7ffffdf, 27), (0x3ffffe5, 26), (0xfffff1, 24), (0x1ffffed, 25),
    (0x7fff2, 19), (0x1fffe3, 21), (0x3ffffe6, 26), (0x7ffffe0, 27),
    (0x7ffffe1, 27), (0x3ffffe7, 26), (0x7ffffe2, 27), (0xfffff2, 24),
    (0x1fffe4, 21), (0x1fffe5, 21), (0x3ffffe8, 26), (0x3ffffe9, 26),
    (0xffffffd, 28), (0x7ffffe3, 27), (0x7ffffe4, 27), (0x7ffffe5, 27),
    (0xfffec, 20), (0xfffff3, 24), (0xfffed, 20), (0x1fffe6, 21),
    (0x3fffe9, 22), (0x1fffe7, 21), (0x1fffe8, 21), (0x7ffff3, 23),
    (0x3fffea, 22), (0x3fffeb, 22), (0x1ffffee, 25), (0x1ffffef, 25),
    (0xfffff4, 24), (0xfffff5, 24), (0x3ffffea, 26), (0x7ffff4, 23),
    (0x3ffffeb, 26), (0x7ffffe6, 27), (0x3ffffec, 26), (0x3ffffed, 26),
    (0x7ffffe7, 27), (0x7ffffe8, 27), (0x7ffffe9, 27), (0x7ffffea, 27),
    (0x7ffffeb, 27), (0xffffffe, 28), (0x7ffffec, 27), (0x7ffffed, 27),
    (0x7ffffee, 27), (0x7ffffef, 27), (0x7fffff0, 27), (0x3ffffee, 26),
    (0x3fffffff, 30),
]


def _build_huff_tree():
    # binary trie: node = [left, right] or int symbol
    root: list = [None, None]
    for sym, (code, nbits) in enumerate(_HUFF):
        node = root
        for i in range(nbits - 1, -1, -1):
            bit = (code >> i) & 1
            if i == 0:
                node[bit] = sym
            else:
                if node[bit] is None:
                    node[bit] = [None, None]
                node = node[bit]
    return root


_HUFF_TREE = _build_huff_tree()


def huffman_decode(data: bytes) -> bytes:
    """RFC 7541 §5.2: decode, treating a trailing partial code of all-1
    bits as padding (an EOS symbol mid-string is a decode error)."""
    out = bytearray()
    node = _HUFF_TREE
    pad_ones = 0
    depth = 0  # bits consumed since the last completed symbol
    for byte in data:
        for i in range(7, -1, -1):
            bit = (byte >> i) & 1
            pad_ones = pad_ones + 1 if bit else 0
            depth += 1
            node = node[bit]
            if node is None:
                raise ValueError("invalid Huffman code")
            if isinstance(node, int):
                if node == 256:
                    raise ValueError("EOS symbol inside Huffman string")
                out.append(node)
                node = _HUFF_TREE
                pad_ones = 0
                depth = 0
    # §5.2: a trailing incomplete code is ONLY legal as padding — at
    # most 7 bits, every bit a 1 (the EOS prefix). Zero-bit or >7-bit
    # tails must be rejected, or a corrupted header block decodes to
    # silently wrong bytes (RFC 7541 Appendix C vectors pin this).
    if depth and (depth != pad_ones or depth > 7):
        raise ValueError("invalid Huffman padding (must be <=7 EOS-prefix "
                         "bits)")
    return bytes(out)


def _int_encode(value: int, prefix_bits: int, first_byte: int = 0) -> bytes:
    """RFC 7541 §5.1 prefixed integer encoding."""
    limit = (1 << prefix_bits) - 1
    if value < limit:
        return bytes([first_byte | value])
    out = bytearray([first_byte | limit])
    value -= limit
    while value >= 128:
        out.append((value % 128) | 0x80)
        value //= 128
    out.append(value)
    return bytes(out)


def _int_decode(data: bytes, off: int, prefix_bits: int) -> tuple[int, int]:
    limit = (1 << prefix_bits) - 1
    value = data[off] & limit
    off += 1
    if value < limit:
        return value, off
    shift = 0
    while True:
        b = data[off]
        off += 1
        value += (b & 0x7F) << shift
        shift += 7
        if not b & 0x80:
            return value, off


def _str_decode(data: bytes, off: int) -> tuple[str, int]:
    huff = bool(data[off] & 0x80)
    n, off = _int_decode(data, off, 7)
    raw = data[off:off + n]
    if len(raw) != n:
        raise ValueError("truncated HPACK string")
    off += n
    if huff:
        raw = huffman_decode(raw)
    return raw.decode("utf-8", "surrogateescape"), off


class HpackEncoder:
    """Stateless conservative encoder: exact static matches emit the
    indexed representation; everything else emits literal-without-
    indexing with plain (non-Huffman) strings. Legal per RFC 7541 (a
    compliant decoder must accept any mix) and avoids dynamic-table
    synchronization entirely."""

    _static_exact = {pair: i + 1 for i, pair in enumerate(HPACK_STATIC)}
    _static_name = {}
    for _i, (_n, _) in enumerate(HPACK_STATIC):
        _static_name.setdefault(_n, _i + 1)

    def encode(self, headers: list[tuple[str, str]]) -> bytes:
        out = bytearray()
        for name, value in headers:
            idx = self._static_exact.get((name, value))
            if idx is not None:
                out += _int_encode(idx, 7, 0x80)
                continue
            nidx = self._static_name.get(name)
            if nidx is not None:
                out += _int_encode(nidx, 4, 0x00)
            else:
                out.append(0x00)
                nb = name.encode()
                out += _int_encode(len(nb), 7)
                out += nb
            vb = value.encode()
            out += _int_encode(len(vb), 7)
            out += vb
        return bytes(out)


class HpackDecoder:
    """Full decoder: static + dynamic table, all literal forms, table
    size updates, Huffman strings."""

    def __init__(self, max_table_size: int = 4096):
        self.dynamic: list[tuple[str, str]] = []
        self.max_size = max_table_size
        self.cur_size = 0

    def _entry(self, idx: int) -> tuple[str, str]:
        if idx <= 0:
            raise ValueError("HPACK index 0")
        if idx <= len(HPACK_STATIC):
            return HPACK_STATIC[idx - 1]
        didx = idx - len(HPACK_STATIC) - 1
        if didx >= len(self.dynamic):
            raise ValueError(f"HPACK index {idx} out of range")
        return self.dynamic[didx]

    def _insert(self, name: str, value: str) -> None:
        size = len(name.encode()) + len(value.encode()) + 32
        self.dynamic.insert(0, (name, value))
        self.cur_size += size
        while self.cur_size > self.max_size and self.dynamic:
            n, v = self.dynamic.pop()
            self.cur_size -= len(n.encode()) + len(v.encode()) + 32

    def decode(self, data: bytes) -> list[tuple[str, str]]:
        out: list[tuple[str, str]] = []
        off = 0
        while off < len(data):
            b = data[off]
            if b & 0x80:  # indexed
                idx, off = _int_decode(data, off, 7)
                out.append(self._entry(idx))
            elif b & 0x40:  # literal with incremental indexing
                idx, off = _int_decode(data, off, 6)
                name = self._entry(idx)[0] if idx else None
                if name is None:
                    name, off = _str_decode(data, off)
                value, off = _str_decode(data, off)
                self._insert(name, value)
                out.append((name, value))
            elif b & 0x20:  # dynamic table size update
                size, off = _int_decode(data, off, 5)
                self.max_size = size
                while self.cur_size > self.max_size and self.dynamic:
                    n, v = self.dynamic.pop()
                    self.cur_size -= len(n.encode()) + len(v.encode()) + 32
            else:  # literal without indexing (0x00) / never indexed (0x10)
                idx, off = _int_decode(data, off, 4)
                name = self._entry(idx)[0] if idx else None
                if name is None:
                    name, off = _str_decode(data, off)
                value, off = _str_decode(data, off)
                out.append((name, value))
        return out


# ----------------------------------------------------------------- HTTP/2

PREFACE = b"PRI * HTTP/2.0\r\n\r\nSM\r\n\r\n"

# frame types (RFC 9113 §6)
DATA, HEADERS, PRIORITY, RST_STREAM, SETTINGS = 0, 1, 2, 3, 4
PUSH_PROMISE, PING, GOAWAY, WINDOW_UPDATE, CONTINUATION = 5, 6, 7, 8, 9

FLAG_END_STREAM = 0x1
FLAG_END_HEADERS = 0x4
FLAG_ACK = 0x1
FLAG_PADDED = 0x8
FLAG_PRIORITY = 0x20


def pack_frame(ftype: int, flags: int, stream_id: int, payload: bytes) -> bytes:
    return struct.pack(">I", len(payload))[1:] + \
        bytes([ftype, flags]) + struct.pack(">I", stream_id & 0x7FFFFFFF) + \
        payload


def read_frame(sock) -> tuple[int, int, int, bytes]:
    hdr = _recv_exact(sock, 9)
    length = int.from_bytes(hdr[:3], "big")
    ftype, flags = hdr[3], hdr[4]
    stream_id = struct.unpack(">I", hdr[5:9])[0] & 0x7FFFFFFF
    payload = _recv_exact(sock, length) if length else b""
    return ftype, flags, stream_id, payload


def _recv_exact(sock, n: int) -> bytes:
    buf = bytearray()
    while len(buf) < n:
        chunk = sock.recv(n - len(buf))
        if not chunk:
            raise ConnectionError("connection closed mid-frame")
        buf += chunk
    return bytes(buf)


def _strip_padding(flags: int, payload: bytes) -> bytes:
    if flags & FLAG_PADDED:
        pad = payload[0]
        payload = payload[1:len(payload) - pad]
    return payload


class GrpcError(RuntimeError):
    def __init__(self, status: int, message: str):
        super().__init__(f"grpc-status {status}: {message}")
        self.status = status
        self.message = message


class TlsConfig:
    """Mutual-TLS material as PEM strings (Velociraptor's api_client
    config carries them inline). ``server_name_override`` mirrors
    grpc::ChannelArguments::SetSslTargetNameOverride — required because
    Velociraptor servers use a self-signed cert for 'VelociraptorServer'
    while clients dial an IP address (plugin.cpp:170-172)."""

    def __init__(self, ca_pem: str, cert_pem: str, key_pem: str,
                 server_name_override: str = "VelociraptorServer"):
        self.ca_pem = ca_pem
        self.cert_pem = cert_pem
        self.key_pem = key_pem
        self.server_name_override = server_name_override

    def wrap(self, sock: socket.socket) -> ssl.SSLSocket:
        ctx = ssl.SSLContext(ssl.PROTOCOL_TLS_CLIENT)
        ctx.set_alpn_protocols(["h2"])
        ctx.load_verify_locations(cadata=self.ca_pem)
        # load_cert_chain requires files; spool the PEMs
        with tempfile.NamedTemporaryFile("w", suffix=".pem") as cf, \
                tempfile.NamedTemporaryFile("w", suffix=".pem") as kf:
            cf.write(self.cert_pem)
            cf.flush()
            kf.write(self.key_pem)
            kf.flush()
            ctx.load_cert_chain(cf.name, kf.name)
        ctx.check_hostname = True
        return ctx.wrap_socket(
            sock, server_hostname=self.server_name_override)


def grpc_call(host: str, port: int, method_path: str, request: bytes,
              tls: TlsConfig | None = None, timeout: float = 10.0,
              authority: str | None = None):
    """One gRPC call (unary or server-streaming): yields each response
    message's bytes; raises GrpcError on a non-zero grpc-status trailer.

    The whole exchange runs on one HTTP/2 stream (id 1) over a fresh
    connection — the shape plugin.cpp's stub->Query(...) produces.
    """
    raw = socket.create_connection((host, port), timeout=timeout)
    sock = tls.wrap(raw) if tls else raw
    try:
        sock.sendall(PREFACE)
        # SETTINGS: defaults are fine; raise our receive window so a
        # server streaming many VQLResponses never stalls on flow control
        settings = struct.pack(">HI", 0x4, 1 << 24)  # INITIAL_WINDOW_SIZE
        sock.sendall(pack_frame(SETTINGS, 0, 0, settings))
        sock.sendall(pack_frame(
            WINDOW_UPDATE, 0, 0, struct.pack(">I", (1 << 24))))

        headers = [
            (":method", "POST"),
            (":scheme", "https" if tls else "http"),
            (":path", method_path),
            (":authority", authority or f"{host}:{port}"),
            ("content-type", "application/grpc"),
            ("te", "trailers"),
            ("user-agent", "tenzir-spark-grpc/0.1"),
        ]
        enc = HpackEncoder().encode(headers)
        sock.sendall(pack_frame(HEADERS, FLAG_END_HEADERS, 1, enc))
        # gRPC message framing: flag byte (0 = uncompressed) + u32 length
        msg = b"\x00" + struct.pack(">I", len(request)) + request
        # split into DATA frames within the default 16384 max frame size
        off = 0
        while off < len(msg):
            chunk = msg[off:off + 16384]
            off += len(chunk)
            last = off >= len(msg)
            sock.sendall(pack_frame(
                DATA, FLAG_END_STREAM if last else 0, 1, chunk))

        dec = HpackDecoder()
        buf = bytearray()          # reassembled gRPC payload bytes
        header_block = bytearray()  # HEADERS + CONTINUATION accumulation
        in_headers = False
        headers_flags = 0
        resp_headers: list[tuple[str, str]] = []
        trailers: list[tuple[str, str]] = []
        got_headers = False
        ended = False
        recv_since_update = 0
        while not ended:
            ftype, flags, stream_id, payload = read_frame(sock)
            if in_headers and ftype != CONTINUATION:
                raise ValueError("expected CONTINUATION frame")
            if ftype == SETTINGS:
                if not flags & FLAG_ACK:
                    sock.sendall(pack_frame(SETTINGS, FLAG_ACK, 0, b""))
            elif ftype == PING:
                if not flags & FLAG_ACK:
                    sock.sendall(pack_frame(PING, FLAG_ACK, 0, payload))
            elif ftype == WINDOW_UPDATE:
                pass  # we never send enough to exhaust the window
            elif ftype == GOAWAY:
                err = struct.unpack(">I", payload[4:8])[0]
                if err != 0:
                    raise ConnectionError(f"HTTP/2 GOAWAY error {err}")
                ended = True
            elif ftype == RST_STREAM and stream_id == 1:
                err = struct.unpack(">I", payload[:4])[0]
                raise ConnectionError(f"HTTP/2 RST_STREAM error {err}")
            elif ftype in (HEADERS, CONTINUATION) and stream_id == 1:
                if ftype == HEADERS:
                    headers_flags = flags
                    payload = _strip_padding(flags, payload)
                    if flags & FLAG_PRIORITY:
                        payload = payload[5:]
                else:
                    headers_flags |= flags & FLAG_END_STREAM
                header_block += payload
                in_headers = not flags & FLAG_END_HEADERS
                if not in_headers:
                    decoded = dec.decode(bytes(header_block))
                    header_block.clear()
                    if not got_headers:
                        resp_headers = decoded
                        got_headers = True
                        # trailers-only response: END_STREAM on the
                        # initial HEADERS carries grpc-status directly
                        if headers_flags & FLAG_END_STREAM:
                            trailers = decoded
                            ended = True
                    else:
                        trailers = decoded
                        if headers_flags & FLAG_END_STREAM:
                            ended = True
            elif ftype == DATA and stream_id == 1:
                payload = _strip_padding(flags, payload)
                buf += payload
                recv_since_update += len(payload)
                if recv_since_update > (1 << 20):
                    upd = struct.pack(">I", recv_since_update)
                    sock.sendall(pack_frame(WINDOW_UPDATE, 0, 0, upd))
                    sock.sendall(pack_frame(WINDOW_UPDATE, 0, 1, upd))
                    recv_since_update = 0
                while len(buf) >= 5:
                    compressed, mlen = buf[0], struct.unpack(">I", buf[1:5])[0]
                    if len(buf) < 5 + mlen:
                        break
                    body = bytes(buf[5:5 + mlen])
                    del buf[:5 + mlen]
                    if compressed:
                        import gzip
                        body = gzip.decompress(body)
                    yield body
                if flags & FLAG_END_STREAM:
                    ended = True
        hmap = dict(resp_headers)
        tmap = dict(trailers)
        status = tmap.get("grpc-status", hmap.get("grpc-status"))
        if status is not None and status != "0":
            raise GrpcError(int(status),
                            tmap.get("grpc-message",
                                     hmap.get("grpc-message", "")))
        if hmap.get(":status", "200") != "200":
            raise ConnectionError(f"HTTP status {hmap.get(':status')}")
    finally:
        try:
            sock.close()
        finally:
            if sock is not raw:
                raw.close()
