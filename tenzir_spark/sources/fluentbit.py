"""fluent-bit connector, spec-level: the Fluent Bit / Fluentd *forward*
protocol (MessagePack event streams over TCP) implemented from the
public protocol specification with no external dependencies.

Reference surface: ``plugins/fluent-bit/src/plugin.cpp`` — the reference
embeds libfluent-bit in-process and yields rows with fields
``timestamp`` / ``metadata`` / ``message`` (plugin.cpp:342-420, the
"[[TIMESTAMP, METADATA], MESSAGE]" event format). This sandbox has no
fluent-bit binary or library, so — like the zmq connector speaking ZMTP
3.0 from the spec without libzmq — this module speaks the *forward*
wire protocol (the way fluent-bit/fluentd agents ship events between
hosts; Forward Protocol Specification v1):

- ``load_forward``: a forward SERVER (what ``fluent-bit -o forward``
  sends to). Accepts Message, Forward, PackedForward and
  CompressedPackedForward modes, EventTime ext timestamps, and replies
  ``{"ack": chunk}`` when the client requests at-least-once delivery.
  Events spool as NDJSON rows ``{tag, timestamp, metadata, message}``
  (the reference's field names, plus the wire tag the embedded engine
  never sees) for the distributed JSON reader.
- ``save_forward``: a forward CLIENT (what ``fluent-bit -i forward``
  receives): one Forward-mode message with a chunk id, waiting for ack.

The MessagePack codec below is a from-spec subset (all types the
forward protocol uses); nothing is linked from fluent-bit or msgpack-c.
"""

from __future__ import annotations

import gzip
import io
import socket
import struct
import time as _time

DEFAULT_ENDPOINT = "tcp://127.0.0.1:24224"
MAX_SPOOL_BYTES = 256 << 20  # same ceiling as the other driver spools


class _Incomplete(Exception):
    """Buffer ends mid-object — caller should read more bytes."""


class EventTime:
    """Forward-protocol EventTime: ext type 0, 8 bytes (sec + nsec)."""

    __slots__ = ("sec", "nsec")

    def __init__(self, sec: int, nsec: int = 0):
        self.sec, self.nsec = sec, nsec

    def seconds(self) -> float:
        return self.sec + self.nsec / 1e9


# --------------------------------------------------------------- msgpack

def msgpack_encode(obj, out: bytearray | None = None) -> bytes:
    """Minimal MessagePack encoder (spec subset the forward protocol
    needs: nil/bool/int/float/str/bin/array/map/EventTime)."""
    b = out if out is not None else bytearray()
    if obj is None:
        b.append(0xC0)
    elif obj is True:
        b.append(0xC3)
    elif obj is False:
        b.append(0xC2)
    elif isinstance(obj, EventTime):
        b += struct.pack(">BbII", 0xD7, 0, obj.sec, obj.nsec)  # fixext8
    elif isinstance(obj, int):
        if 0 <= obj <= 0x7F:
            b.append(obj)
        elif -32 <= obj < 0:
            b.append(obj & 0xFF)
        elif 0 <= obj <= 0xFFFFFFFFFFFFFFFF:
            b += struct.pack(">BQ", 0xCF, obj)
        else:
            b += struct.pack(">Bq", 0xD3, obj)
    elif isinstance(obj, float):
        b += struct.pack(">Bd", 0xCB, obj)
    elif isinstance(obj, str):
        # surrogateescape mirrors the decoder: a str that came off the
        # wire carrying non-UTF-8 bytes round-trips to the same bytes
        s = obj.encode("utf-8", "surrogateescape")
        if len(s) <= 31:
            b.append(0xA0 | len(s))
        else:
            b += struct.pack(">BI", 0xDB, len(s))
        b += s
    elif isinstance(obj, (bytes, bytearray)):
        b += struct.pack(">BI", 0xC6, len(obj))
        b += obj
    elif isinstance(obj, (list, tuple)):
        if len(obj) <= 15:
            b.append(0x90 | len(obj))
        else:
            b += struct.pack(">BI", 0xDD, len(obj))
        for x in obj:
            msgpack_encode(x, b)
    elif isinstance(obj, dict):
        if len(obj) <= 15:
            b.append(0x80 | len(obj))
        else:
            b += struct.pack(">BI", 0xDF, len(obj))
        for k, v in obj.items():
            msgpack_encode(k, b)
            msgpack_encode(v, b)
    else:
        raise TypeError(f"cannot msgpack-encode {type(obj).__name__}")
    return bytes(b) if out is None else b


def _need(buf: bytes, off: int, n: int) -> None:
    if off + n > len(buf):
        raise _Incomplete


def msgpack_decode(buf: bytes, off: int = 0):
    """Decode one object; returns (obj, next_offset). Raises
    ``_Incomplete`` when the buffer ends mid-object (stream decoding)."""
    _need(buf, off, 1)
    c = buf[off]
    off += 1
    if c <= 0x7F:
        return c, off
    if c >= 0xE0:
        return c - 0x100, off
    if 0x80 <= c <= 0x8F:
        return _dec_map(buf, off, c & 0x0F)
    if 0x90 <= c <= 0x9F:
        return _dec_array(buf, off, c & 0x0F)
    if 0xA0 <= c <= 0xBF:
        n = c & 0x1F
        _need(buf, off, n)
        # surrogateescape, not replace: total (never raises) AND
        # byte-lossless, so a PackedForward payload mis-typed as str by
        # the client re-encodes to the exact wire bytes; lossy U+FFFD
        # rendering happens only at the row/spool boundary (_clean_str)
        return buf[off:off + n].decode("utf-8", "surrogateescape"), off + n
    if c == 0xC0:
        return None, off
    if c == 0xC2:
        return False, off
    if c == 0xC3:
        return True, off
    if c in (0xC4, 0xC5, 0xC6):  # bin 8/16/32
        w = {0xC4: 1, 0xC5: 2, 0xC6: 4}[c]
        _need(buf, off, w)
        n = int.from_bytes(buf[off:off + w], "big")
        off += w
        _need(buf, off, n)
        return bytes(buf[off:off + n]), off + n
    if c == 0xCA:
        _need(buf, off, 4)
        return struct.unpack_from(">f", buf, off)[0], off + 4
    if c == 0xCB:
        _need(buf, off, 8)
        return struct.unpack_from(">d", buf, off)[0], off + 8
    if c in (0xCC, 0xCD, 0xCE, 0xCF):  # uint 8/16/32/64
        w = 1 << (c - 0xCC)
        _need(buf, off, w)
        return int.from_bytes(buf[off:off + w], "big"), off + w
    if c in (0xD0, 0xD1, 0xD2, 0xD3):  # int 8/16/32/64
        w = 1 << (c - 0xD0)
        _need(buf, off, w)
        return int.from_bytes(buf[off:off + w], "big", signed=True), off + w
    if c in (0xD9, 0xDA, 0xDB):  # str 8/16/32
        w = {0xD9: 1, 0xDA: 2, 0xDB: 4}[c]
        _need(buf, off, w)
        n = int.from_bytes(buf[off:off + w], "big")
        off += w
        _need(buf, off, n)
        return buf[off:off + n].decode("utf-8", "surrogateescape"), off + n
    if c == 0xDC:
        _need(buf, off, 2)
        return _dec_array(buf, off + 2, struct.unpack_from(">H", buf, off)[0])
    if c == 0xDD:
        _need(buf, off, 4)
        return _dec_array(buf, off + 4, struct.unpack_from(">I", buf, off)[0])
    if c == 0xDE:
        _need(buf, off, 2)
        return _dec_map(buf, off + 2, struct.unpack_from(">H", buf, off)[0])
    if c == 0xDF:
        _need(buf, off, 4)
        return _dec_map(buf, off + 4, struct.unpack_from(">I", buf, off)[0])
    if c == 0xD7:  # fixext8 — EventTime when type is 0
        _need(buf, off, 9)
        etype = struct.unpack_from(">b", buf, off)[0]
        if etype == 0:
            sec, nsec = struct.unpack_from(">II", buf, off + 1)
            return EventTime(sec, nsec), off + 9
        return bytes(buf[off + 1:off + 9]), off + 9
    if c == 0xC7:  # ext8 (EventTime is sometimes sent as ext8 len=8)
        _need(buf, off, 2)
        n = buf[off]
        etype = struct.unpack_from(">b", buf, off + 1)[0]
        off += 2
        _need(buf, off, n)
        if etype == 0 and n == 8:
            sec, nsec = struct.unpack_from(">II", buf, off)
            return EventTime(sec, nsec), off + n
        return bytes(buf[off:off + n]), off + n
    raise ValueError(f"unsupported msgpack byte 0x{c:02x}")


def _dec_array(buf, off, n):
    out = []
    for _ in range(n):
        v, off = msgpack_decode(buf, off)
        out.append(v)
    return out, off


def _dec_map(buf, off, n):
    out = {}
    for _ in range(n):
        k, off = msgpack_decode(buf, off)
        v, off = msgpack_decode(buf, off)
        if isinstance(k, (list, dict)):
            # msgpack permits container keys but fluent-bit never emits
            # them and Python cannot hash them — reject as malformed
            # rather than crash (decoder totality property)
            raise ValueError("unhashable msgpack map key")
        out[k] = v
    return out, off


# --------------------------------------------------------------- events

def _ts_seconds(t) -> float:
    if isinstance(t, EventTime):
        return t.seconds()
    return float(t)


def _entry_to_row(tag: str, t, record) -> dict:
    """One forward entry -> the reference's row shape (plugin.cpp:363-368:
    timestamp/metadata/message) plus the wire tag."""
    if not isinstance(record, dict):
        record = {"message": record}
    return {"tag": tag, "timestamp": _ts_seconds(t),
            "metadata": {}, "message": record}


def _unpack_entries(payload: bytes):
    """PackedForward: concatenated msgpack [time, record] entries."""
    off = 0
    while off < len(payload):
        entry, off = msgpack_decode(payload, off)
        yield entry


def _clean(v):
    """Row-boundary sanitizer: decoded strings may carry surrogate
    escapes (lossless non-UTF-8 bytes); the JSON spool must be strict
    UTF-8 for Spark's Jackson parser, so render them as U+FFFD here —
    the same lossy view the old decoder produced everywhere."""
    if isinstance(v, str):
        return v.encode("utf-8", "surrogateescape").decode("utf-8", "replace")
    if isinstance(v, dict):
        return {_clean(k): _clean(x) for k, x in v.items()}
    if isinstance(v, list):
        return [_clean(x) for x in v]
    if isinstance(v, (bytes, bytearray)):
        return bytes(v).decode("utf-8", "replace")
    return v


def decode_forward_message(msg) -> tuple[list[dict], dict | None]:
    """One decoded forward-mode message -> (rows, option). Handles
    Message, Forward, PackedForward and CompressedPackedForward modes
    per the forward protocol spec."""
    if not isinstance(msg, list) or len(msg) < 2:
        raise ValueError(f"malformed forward message: {msg!r}")
    tag = msg[0]
    if not isinstance(tag, str):
        raise ValueError(f"forward tag must be a string, got {tag!r}")
    second = msg[1]
    option = None
    rows: list[dict] = []
    if isinstance(second, list):  # Forward mode: [[time, record], ...]
        if len(msg) >= 3 and isinstance(msg[2], dict):
            option = msg[2]
        for entry in second:
            rows.append(_entry_to_row(tag, entry[0], entry[1]))
    elif isinstance(second, (bytes, bytearray)) or isinstance(second, str):
        # a str second element is always PackedForward: Message mode's
        # second element is a timestamp (int/float/EventTime), never str
        # PackedForward / CompressedPackedForward (payload may be bin
        # or str per spec). surrogateescape inverts the decoder exactly,
        # recovering the original wire bytes even when the payload is
        # not valid UTF-8 (the old latin-1 re-encode raised
        # UnicodeEncodeError on any multibyte char or escaped byte)
        payload = second.encode("utf-8", "surrogateescape") \
            if isinstance(second, str) else bytes(second)
        if len(msg) >= 3 and isinstance(msg[2], dict):
            option = msg[2]
        if option and option.get("compressed") == "gzip":
            payload = gzip.GzipFile(fileobj=io.BytesIO(payload)).read()
        for entry in _unpack_entries(payload):
            rows.append(_entry_to_row(tag, entry[0], entry[1]))
    else:  # Message mode: [tag, time, record, option?]
        if len(msg) >= 4 and isinstance(msg[3], dict):
            option = msg[3]
        rows.append(_entry_to_row(tag, msg[1], msg[2]))
    return rows, option


# --------------------------------------------------------------- loader

def _parse_endpoint(endpoint: str) -> tuple[str, int]:
    ep = endpoint
    if "://" in ep:
        scheme, ep = ep.split("://", 1)
        if scheme not in ("tcp", "forward"):
            raise ValueError(f"unsupported forward endpoint scheme {scheme!r}")
    host, _, port = ep.rpartition(":")
    return host or "127.0.0.1", int(port)


def load_forward(endpoint: str = DEFAULT_ENDPOINT,
                 n_events: int | None = None, timeout: float = 10.0) -> str:
    """Forward-protocol SERVER: bind, accept agent connections, decode
    events, ack chunks, spool NDJSON for the distributed JSON reader;
    stops after ``n_events`` or on timeout. Driver-side by nature (a
    network listener, same class as load_zmq) with the same spool
    ceiling — bulk data belongs on s3a/gs paths."""
    import json
    import os
    import tempfile

    host, port = _parse_endpoint(endpoint)
    srv = socket.socket()
    srv.setsockopt(socket.SOL_SOCKET, socket.SO_REUSEADDR, 1)
    srv.bind((host, port))
    srv.listen(8)
    deadline = _time.monotonic() + timeout
    rows: list[dict] = []
    spooled = 0
    try:
        while (n_events is None or len(rows) < n_events) \
                and _time.monotonic() < deadline:
            srv.settimeout(max(deadline - _time.monotonic(), 0.05))
            try:
                conn, _addr = srv.accept()
            except (TimeoutError, socket.timeout):
                break
            with conn:
                conn.settimeout(max(deadline - _time.monotonic(), 0.05))
                buf = bytearray()
                off = 0
                while (n_events is None or len(rows) < n_events) \
                        and _time.monotonic() < deadline:
                    try:
                        msg, off = msgpack_decode(buf, off)
                    except _Incomplete:
                        try:
                            chunk = conn.recv(1 << 16)
                        except (TimeoutError, socket.timeout, OSError):
                            break
                        if not chunk:
                            break
                        buf += chunk
                        spooled += len(chunk)
                        if spooled > MAX_SPOOL_BYTES:
                            raise RuntimeError(
                                f"forward spool exceeds {MAX_SPOOL_BYTES} "
                                f"bytes; route bulk data via s3a/gs")
                        continue
                    new, option = decode_forward_message(msg)
                    rows.extend(new)
                    if option and "chunk" in option:
                        # at-least-once: ack with the chunk id
                        conn.sendall(msgpack_encode(
                            {"ack": option["chunk"]}))
        fd, spool = tempfile.mkstemp(prefix="tenzir_fwd_")
        with os.fdopen(fd, "w") as fh:
            for r in rows:
                fh.write(json.dumps(_clean(r)) + "\n")
        return spool
    finally:
        srv.close()


def save_forward(rows, endpoint: str = DEFAULT_ENDPOINT,
                 tag: str = "tenzir", timeout: float = 10.0,
                 require_ack: bool = True) -> int:
    """Forward-protocol CLIENT: ship ``rows`` (dicts, or (time, dict)
    pairs) as one Forward-mode message; with ``require_ack`` a chunk id
    is attached and the call blocks until the server acks (at-least-once
    delivery per the spec). Returns entries sent."""
    import uuid

    host, port = _parse_endpoint(endpoint)
    entries = []
    now = int(_time.time())
    for r in rows:
        if isinstance(r, tuple):
            t, rec = r
            entries.append([EventTime(int(t), int((t % 1) * 1e9)), rec])
        else:
            entries.append([now, r])
    if not entries:
        return 0
    chunk = uuid.uuid4().hex if require_ack else None
    msg = [tag, entries] + ([{"chunk": chunk}] if chunk else [])
    deadline = _time.monotonic() + timeout
    while True:
        try:
            sock = socket.create_connection((host, port), timeout=timeout)
            break
        except (ConnectionRefusedError, OSError):
            # forward agents retry until the collector is up
            if _time.monotonic() >= deadline:
                raise
            _time.sleep(0.05)
    with sock:
        sock.settimeout(timeout)
        sock.sendall(msgpack_encode(msg))
        if chunk:
            buf = bytearray()
            while True:
                try:
                    resp, _ = msgpack_decode(buf, 0)
                except _Incomplete:
                    data = sock.recv(4096)
                    if not data:
                        raise ConnectionError(
                            "forward peer closed before ack")
                    buf += data
                    continue
                if resp.get("ack") != chunk:
                    raise ConnectionError(
                        f"forward ack mismatch: {resp!r}")
                break
    return len(entries)


# ---------------------------------------------------------------------------
# Native in-process plugins. The reference embeds libfluent-bit and exposes
# every Fluent Bit input/output by name (plugins/fluent-bit/src/plugin.cpp:548);
# that library is absent here, so the handful its own integration suite
# drives (random, stdin sources; stdout, null, counter sinks) are
# implemented natively. Event shape matches plugin.cpp:340-451: rows of
# (timestamp, message[, metadata]) under schema name `tenzir.fluentbit`.

TABLE_SLICE_NAME = "tenzir.fluentbit"


def random_records(n: int = 16, seed: int = 0) -> list[dict]:
    """Fluent Bit's `random` input: one {"rand_value": uint64} record per
    tick (its in_random plugin). Deterministic here (seeded) — the
    reference suite only pins the SCHEMA of the stream, not the values."""
    import random as _random
    rng = _random.Random(seed)
    return [{"rand_value": rng.getrandbits(63)} for _ in range(n)]


def ruby_hash(v) -> str:
    """Render a value the way Fluent Bit's msgpack object printer does
    (the `stdout` output format): {"key"=>value, ...}, lowercase
    booleans, nil for null, strings double-quoted."""
    if v is None:
        return "nil"
    if v is True:
        return "true"
    if v is False:
        return "false"
    if isinstance(v, str):
        return '"' + v.replace("\\", "\\\\").replace('"', '\\"') + '"'
    if isinstance(v, float):
        return repr(v)
    if isinstance(v, int):
        return str(v)
    if isinstance(v, dict):
        return "{" + ", ".join(f"{ruby_hash(k)}=>{ruby_hash(x)}"
                               for k, x in v.items()) + "}"
    if isinstance(v, (list, tuple)):
        return "[" + ", ".join(ruby_hash(x) for x in v) + "]"
    return ruby_hash(str(v))


def stdout_lines(rows, tag: str = "tenzir", epoch: float = 0.0):
    """Fluent Bit `stdout` output: `[i] tag: [[ts, {}], record]` per
    event (v2.1+ event format with empty metadata). Yields strings."""
    for i, rec in enumerate(rows):
        yield f"[{i}] {tag}: [[{epoch:.9f}, {{}}], {ruby_hash(rec)}]"


def counter_lines(n: int, epoch: float = 0.0):
    """Fluent Bit `counter` output: one `ts,count (total = total)` line
    per flush — a single flush here (the engine hands the result over
    in one push)."""
    return [f"{epoch:.9f},{n} (total = {n})"]
