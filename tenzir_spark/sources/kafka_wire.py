"""Kafka wire protocol (minimal, from the public spec) — client side.

The reference's kafka connector (plugins/kafka/src/plugin.cpp,
consumer.cpp, producer.cpp) wraps librdkafka; this sandbox has neither
librdkafka nor the spark-sql-kafka jars, so — same approach as the zmq
(ZMTP 3.0) and fluent-bit (forward) connectors — the byte protocol is
implemented directly from the published specification
(https://kafka.apache.org/protocol): framed requests over TCP, big-endian
primitives, and the v2 RecordBatch format with CRC32C integrity.

Scope: the non-flexible (pre-KIP-482) API versions a plain consumer and
producer need, chosen so no tagged-field/compact encodings are required:

- ApiVersions v0   (18) — handshake sanity
- Metadata    v1    (3) — topic -> partitions/leaders
- ListOffsets v1    (2) — earliest/latest offset resolution (and tail -N)
- Fetch       v4    (1) — consume RecordBatch v2 sets
- Produce     v3    (0) — publish RecordBatch v2 sets

This is the single-broker path (bootstrap == leader), which covers the
sandbox loopback e2e; against a real multi-broker cluster the Metadata
response carries per-partition leaders and a production deployment uses
Spark's native kafka source (sources/kafka.py builds those options) —
this module is the fallback/batch path and the protocol oracle for tests.
"""

from __future__ import annotations

import io
import socket
import struct
import time


# --------------------------------------------------------------- CRC32C
# Castagnoli CRC (poly 0x1EDC6F41, reflected 0x82F63B78) — the checksum
# RecordBatch v2 mandates (it is NOT zlib's crc32). Table-driven; the
# standard check value crc32c(b"123456789") == 0xE3069283 is pinned in
# tests so the implementation can't drift.

def _crc32c_table() -> list[int]:
    tbl = []
    for n in range(256):
        c = n
        for _ in range(8):
            c = (c >> 1) ^ 0x82F63B78 if c & 1 else c >> 1
        tbl.append(c)
    return tbl


_CRC_TBL = _crc32c_table()


def crc32c(data: bytes, crc: int = 0) -> int:
    crc ^= 0xFFFFFFFF
    for b in data:
        crc = _CRC_TBL[(crc ^ b) & 0xFF] ^ (crc >> 8)
    return crc ^ 0xFFFFFFFF


# --------------------------------------------------------------- varints

def zigzag_encode(n: int) -> int:
    return (n << 1) ^ (n >> 63) if n < 0 else n << 1


def zigzag_decode(n: int) -> int:
    return (n >> 1) ^ -(n & 1)


def write_varint(buf: io.BytesIO, n: int) -> None:
    """Signed varint: zigzag then base-128 little-endian groups."""
    v = zigzag_encode(n)
    while True:
        b = v & 0x7F
        v >>= 7
        if v:
            buf.write(bytes([b | 0x80]))
        else:
            buf.write(bytes([b]))
            return


def read_varint(buf: memoryview, pos: int) -> tuple[int, int]:
    shift = 0
    out = 0
    while True:
        b = buf[pos]
        pos += 1
        out |= (b & 0x7F) << shift
        if not b & 0x80:
            return zigzag_decode(out), pos
        shift += 7
        if shift > 63:
            raise ValueError("varint too long")


# ------------------------------------------------------ primitive codec

def w_i8(b, v): b.write(struct.pack(">b", v))
def w_i16(b, v): b.write(struct.pack(">h", v))
def w_i32(b, v): b.write(struct.pack(">i", v))
def w_i64(b, v): b.write(struct.pack(">q", v))


def w_string(b, s: str | None) -> None:
    if s is None:
        w_i16(b, -1)
    else:
        raw = s.encode("utf-8")
        w_i16(b, len(raw))
        b.write(raw)


def w_bytes(b, v: bytes | None) -> None:
    if v is None:
        w_i32(b, -1)
    else:
        w_i32(b, len(v))
        b.write(v)


class Reader:
    """Cursor over a response body."""

    def __init__(self, data: bytes):
        self.v = memoryview(data)
        self.pos = 0

    def _unpack(self, fmt: str, size: int):
        out = struct.unpack_from(fmt, self.v, self.pos)[0]
        self.pos += size
        return out

    def i8(self): return self._unpack(">b", 1)
    def i16(self): return self._unpack(">h", 2)
    def i32(self): return self._unpack(">i", 4)
    def i64(self): return self._unpack(">q", 8)
    def boolean(self): return bool(self._unpack(">b", 1))

    def string(self) -> str | None:
        n = self.i16()
        if n < 0:
            return None
        out = bytes(self.v[self.pos:self.pos + n]).decode("utf-8")
        self.pos += n
        return out

    def raw_bytes(self) -> bytes | None:
        n = self.i32()
        if n < 0:
            return None
        out = bytes(self.v[self.pos:self.pos + n])
        self.pos += n
        return out

    def array(self, fn) -> list | None:
        n = self.i32()
        if n < 0:
            return None
        return [fn() for _ in range(n)]


# ------------------------------------------------------- RecordBatch v2

class Record:
    __slots__ = ("offset", "timestamp", "key", "value", "headers")

    def __init__(self, offset: int, timestamp: int, key: bytes | None,
                 value: bytes | None, headers: list[tuple[str, bytes]]):
        self.offset = offset
        self.timestamp = timestamp
        self.key = key
        self.value = value
        self.headers = headers


def encode_record_batch(base_offset: int,
                        records: list[tuple[bytes | None, bytes | None]],
                        base_timestamp: int,
                        headers: list[tuple[str, bytes]] | None = None) -> bytes:
    """Build one uncompressed RecordBatch (magic 2). ``records`` is a
    list of (key, value); all records share ``base_timestamp`` (delta 0),
    which is what a single produce call from one process observes."""
    body = io.BytesIO()
    recs = io.BytesIO()
    for i, (key, value) in enumerate(records):
        r = io.BytesIO()
        w_i8(r, 0)                       # record attributes
        write_varint(r, 0)               # timestampDelta
        write_varint(r, i)               # offsetDelta
        if key is None:
            write_varint(r, -1)
        else:
            write_varint(r, len(key))
            r.write(key)
        if value is None:
            write_varint(r, -1)
        else:
            write_varint(r, len(value))
            r.write(value)
        hs = headers or []
        write_varint(r, len(hs))
        for hk, hv in hs:
            hkr = hk.encode("utf-8")
            write_varint(r, len(hkr))
            r.write(hkr)
            write_varint(r, len(hv))
            r.write(hv)
        raw = r.getvalue()
        write_varint(recs, len(raw))
        recs.write(raw)

    # everything the CRC covers: attributes .. records
    crc_part = io.BytesIO()
    w_i16(crc_part, 0)                   # batch attributes: no compression
    w_i32(crc_part, len(records) - 1)    # lastOffsetDelta
    w_i64(crc_part, base_timestamp)      # firstTimestamp
    w_i64(crc_part, base_timestamp)      # maxTimestamp
    w_i64(crc_part, -1)                  # producerId
    w_i16(crc_part, -1)                  # producerEpoch
    w_i32(crc_part, -1)                  # baseSequence
    w_i32(crc_part, len(records))
    crc_part.write(recs.getvalue())
    crc_bytes = crc_part.getvalue()

    w_i64(body, base_offset)
    # batchLength counts bytes after itself: partitionLeaderEpoch(4) +
    # magic(1) + crc(4) + crc-covered section
    w_i32(body, 4 + 1 + 4 + len(crc_bytes))
    w_i32(body, -1)                      # partitionLeaderEpoch
    w_i8(body, 2)                        # magic
    body.write(struct.pack(">I", crc32c(crc_bytes)))
    body.write(crc_bytes)
    return body.getvalue()


def decode_record_batches(data: bytes, verify_crc: bool = True) -> list[Record]:
    """Parse a Fetch record_set: zero or more concatenated RecordBatches.
    A trailing partial batch (the broker may truncate at max_bytes) is
    dropped, per spec."""
    out: list[Record] = []
    v = memoryview(data)
    pos = 0
    while pos + 12 <= len(v):
        base_offset = struct.unpack_from(">q", v, pos)[0]
        batch_len = struct.unpack_from(">i", v, pos + 8)[0]
        end = pos + 12 + batch_len
        if batch_len <= 0 or end > len(v):
            break  # partial trailing batch
        magic = v[pos + 16]
        if magic != 2:
            raise ValueError(f"unsupported record batch magic {magic} "
                             "(only v2 is implemented)")
        crc_stored = struct.unpack_from(">I", v, pos + 17)[0]
        crc_section = bytes(v[pos + 21:end])
        if verify_crc and crc32c(crc_section) != crc_stored:
            raise ValueError("record batch CRC32C mismatch")
        attributes = struct.unpack_from(">h", v, pos + 21)[0]
        if attributes & 0x07:
            raise NotImplementedError(
                "compressed record batches not supported (set "
                "compression.type=none on the producer)")
        first_ts = struct.unpack_from(">q", v, pos + 27)[0]
        # layout after crc (pos+21): attributes(2) lastOffsetDelta(4)
        # firstTimestamp(8) maxTimestamp(8) producerId(8)
        # producerEpoch(2) baseSequence(4) -> records count at pos+57
        n_records = struct.unpack_from(">i", v, pos + 57)[0]
        rpos = pos + 61
        for _ in range(n_records):
            rlen, rpos = read_varint(v, rpos)
            rend = rpos + rlen
            rpos += 1  # record attributes (unused)
            ts_delta, rpos = read_varint(v, rpos)
            off_delta, rpos = read_varint(v, rpos)
            klen, rpos = read_varint(v, rpos)
            key = None
            if klen >= 0:
                key = bytes(v[rpos:rpos + klen])
                rpos += klen
            vlen, rpos = read_varint(v, rpos)
            val = None
            if vlen >= 0:
                val = bytes(v[rpos:rpos + vlen])
                rpos += vlen
            nh, rpos = read_varint(v, rpos)
            hdrs = []
            for _ in range(nh):
                hklen, rpos = read_varint(v, rpos)
                hk = bytes(v[rpos:rpos + hklen]).decode("utf-8")
                rpos += hklen
                hvlen, rpos = read_varint(v, rpos)
                hv = b""
                if hvlen >= 0:
                    hv = bytes(v[rpos:rpos + hvlen])
                    rpos += hvlen
                hdrs.append((hk, hv))
            if rpos != rend:
                raise ValueError("record length mismatch")
            out.append(Record(base_offset + off_delta, first_ts + ts_delta,
                              key, val, hdrs))
        pos = end
    return out


# -------------------------------------------------------------- client

API_PRODUCE = 0
API_FETCH = 1
API_LIST_OFFSETS = 2
API_METADATA = 3
API_VERSIONS = 18

EARLIEST = -2
LATEST = -1

_ERRORS = {
    0: "NONE", 1: "OFFSET_OUT_OF_RANGE", 3: "UNKNOWN_TOPIC_OR_PARTITION",
    5: "LEADER_NOT_AVAILABLE", 6: "NOT_LEADER_FOR_PARTITION",
    35: "UNSUPPORTED_VERSION",
}


class KafkaError(RuntimeError):
    def __init__(self, code: int, where: str):
        super().__init__(
            f"kafka error {code} ({_ERRORS.get(code, 'UNKNOWN')}) in {where}")
        self.code = code


class KafkaWireClient:
    """One TCP connection to one broker, correlation-id matched."""

    def __init__(self, host: str = "127.0.0.1", port: int = 9092,
                 client_id: str = "tenzir", timeout: float = 10.0):
        self.client_id = client_id
        self._corr = 0
        self.sock = socket.create_connection((host, port), timeout=timeout)
        self.sock.settimeout(timeout)

    def close(self) -> None:
        try:
            self.sock.close()
        except OSError:
            pass

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()

    # framing ----------------------------------------------------------
    def _send(self, api_key: int, api_version: int, body: bytes) -> int:
        self._corr += 1
        hdr = io.BytesIO()
        w_i16(hdr, api_key)
        w_i16(hdr, api_version)
        w_i32(hdr, self._corr)
        w_string(hdr, self.client_id)
        payload = hdr.getvalue() + body
        self.sock.sendall(struct.pack(">i", len(payload)) + payload)
        return self._corr

    def _recv_exact(self, n: int) -> bytes:
        chunks = []
        while n:
            c = self.sock.recv(n)
            if not c:
                raise ConnectionError("kafka broker closed connection")
            chunks.append(c)
            n -= len(c)
        return b"".join(chunks)

    def _roundtrip(self, api_key: int, api_version: int, body: bytes) -> Reader:
        corr = self._send(api_key, api_version, body)
        (size,) = struct.unpack(">i", self._recv_exact(4))
        resp = Reader(self._recv_exact(size))
        got = resp.i32()
        if got != corr:
            raise ValueError(f"correlation id mismatch: {got} != {corr}")
        return resp

    # APIs -------------------------------------------------------------
    def api_versions(self) -> dict[int, tuple[int, int]]:
        r = self._roundtrip(API_VERSIONS, 0, b"")
        err = r.i16()
        if err:
            raise KafkaError(err, "ApiVersions")
        out = {}
        for _ in range(r.i32()):
            k, lo, hi = r.i16(), r.i16(), r.i16()
            out[k] = (lo, hi)
        return out

    def metadata(self, topics: list[str] | None = None) -> dict:
        body = io.BytesIO()
        if topics is None:
            w_i32(body, -1)  # null array: all topics
        else:
            w_i32(body, len(topics))
            for t in topics:
                w_string(body, t)
        r = self._roundtrip(API_METADATA, 1, body.getvalue())
        brokers = r.array(lambda: {
            "node_id": r.i32(), "host": r.string(), "port": r.i32(),
            "rack": r.string()})
        controller = r.i32()
        topics_out = {}
        for _ in range(r.i32()):
            err = r.i16()
            name = r.string()
            r.boolean()  # is_internal
            parts = {}
            for _ in range(r.i32()):
                perr = r.i16()
                pid = r.i32()
                leader = r.i32()
                r.array(r.i32)  # replicas
                r.array(r.i32)  # isr
                parts[pid] = {"error": perr, "leader": leader}
            topics_out[name] = {"error": err, "partitions": parts}
        return {"brokers": brokers, "controller": controller,
                "topics": topics_out}

    def list_offsets(self, topic: str, partition: int = 0,
                     timestamp: int = LATEST) -> int:
        body = io.BytesIO()
        w_i32(body, -1)  # replica_id
        w_i32(body, 1)
        w_string(body, topic)
        w_i32(body, 1)
        w_i32(body, partition)
        w_i64(body, timestamp)
        r = self._roundtrip(API_LIST_OFFSETS, 1, body.getvalue())
        for _ in range(r.i32()):
            r.string()
            for _ in range(r.i32()):
                r.i32()  # partition
                err = r.i16()
                r.i64()  # timestamp
                off = r.i64()
                if err:
                    raise KafkaError(err, "ListOffsets")
                return off
        raise ValueError("empty ListOffsets response")

    def fetch(self, topic: str, partition: int, offset: int,
              max_wait_ms: int = 500, min_bytes: int = 1,
              max_bytes: int = 8 * 1024 * 1024) -> tuple[list[Record], int]:
        """One Fetch round trip; returns (records, high_watermark)."""
        body = io.BytesIO()
        w_i32(body, -1)            # replica_id
        w_i32(body, max_wait_ms)
        w_i32(body, min_bytes)
        w_i32(body, max_bytes)
        w_i8(body, 0)              # isolation_level: read_uncommitted
        w_i32(body, 1)
        w_string(body, topic)
        w_i32(body, 1)
        w_i32(body, partition)
        w_i64(body, offset)
        w_i32(body, max_bytes)     # partition_max_bytes
        r = self._roundtrip(API_FETCH, 4, body.getvalue())
        r.i32()  # throttle_time_ms
        records: list[Record] = []
        hwm = 0
        for _ in range(r.i32()):
            r.string()
            for _ in range(r.i32()):
                r.i32()  # partition
                err = r.i16()
                hwm = r.i64()
                r.i64()  # last_stable_offset
                r.array(lambda: (r.i64(), r.i64()))  # aborted txns
                record_set = r.raw_bytes() or b""
                if err:
                    raise KafkaError(err, "Fetch")
                records.extend(decode_record_batches(record_set))
        # fetch may return batches starting before the requested offset
        # (compaction / batch alignment); trim client-side, per spec
        return [x for x in records if x.offset >= offset], hwm

    def produce(self, topic: str, partition: int,
                records: list[tuple[bytes | None, bytes | None]],
                timestamp_ms: int | None = None, acks: int = -1,
                headers: list[tuple[str, bytes]] | None = None) -> int:
        """Publish one batch; returns the assigned base offset."""
        ts = int(time.time() * 1000) if timestamp_ms is None else timestamp_ms
        batch = encode_record_batch(0, records, ts, headers=headers)
        body = io.BytesIO()
        w_string(body, None)       # transactional_id
        w_i16(body, acks)
        w_i32(body, 30_000)        # timeout
        w_i32(body, 1)
        w_string(body, topic)
        w_i32(body, 1)
        w_i32(body, partition)
        w_bytes(body, batch)
        r = self._roundtrip(API_PRODUCE, 3, body.getvalue())
        base = -1
        for _ in range(r.i32()):
            r.string()
            for _ in range(r.i32()):
                r.i32()  # partition
                err = r.i16()
                base = r.i64()
                r.i64()  # log_append_time
                if err:
                    raise KafkaError(err, "Produce")
        r.i32()  # throttle
        return base


# ------------------------------------------------- loader/saver surface

def _parse_brokers(brokers: str) -> tuple[str, int]:
    first = brokers.split(",")[0].strip()
    if ":" in first:
        host, port = first.rsplit(":", 1)
        return host, int(port)
    return first, 9092


def load_kafka(topic: str = "tenzir", brokers: str = "127.0.0.1:9092",
               offset: str | int = "beginning", count: int | None = None,
               exit_at_end: bool = False, timeout: float = 10.0,
               partition: int = 0, raw: bool = False) -> str:
    """Batch loader mirroring the reference `kafka` loader semantics
    (plugin.cpp loader_args): consume from ``offset``, stop after
    ``count`` messages and/or at the end of the log with ``exit_at_end``,
    else until ``timeout``. Spools values newline-framed to a temp file
    for the distributed format readers — identical contract to load_zmq.
    """
    from .kafka import parse_offset_spec

    import os
    import tempfile

    host, port = _parse_brokers(brokers)
    spec = parse_offset_spec(offset)
    out: list[bytes] = []
    with KafkaWireClient(host, port, timeout=timeout) as cli:
        md = cli.metadata([topic])
        tmd = md["topics"].get(topic)
        if tmd is None or tmd["error"] not in (0,):
            raise KafkaError(tmd["error"] if tmd else 3, f"metadata({topic})")
        if spec["kind"] == "named" and spec["startingOffsets"] == "earliest":
            pos = cli.list_offsets(topic, partition, EARLIEST)
        elif spec["kind"] in ("named", "stored"):
            # stored: no group management in the wire client — start at
            # the log end, the same visible behavior as a fresh group id
            pos = cli.list_offsets(topic, partition, LATEST)
        elif spec["kind"] == "absolute":
            pos = spec["offset"]
        else:  # tail -N: resolve against the live end offset
            end = cli.list_offsets(topic, partition, LATEST)
            pos = max(0, end - spec["offset"])
        deadline = time.monotonic() + timeout
        while time.monotonic() < deadline:
            if count is not None and len(out) >= count:
                break
            recs, hwm = cli.fetch(topic, partition, pos)
            for rec in recs:
                if count is not None and len(out) >= count:
                    break
                val = rec.value if rec.value is not None else b""
                if not raw and b"\n" in val:
                    raise ValueError(
                        "kafka message contains a newline and would corrupt "
                        "the line-framed spool; pass raw=True for "
                        "self-framing payloads")
                out.append(val)
                pos = rec.offset + 1
            if not recs:
                if exit_at_end and pos >= hwm:
                    break
                if count is None and exit_at_end:
                    break
    fd, spool = tempfile.mkstemp(prefix="tenzir_kafka_")
    with os.fdopen(fd, "wb") as fh:
        if raw:
            fh.write(b"".join(out))
        else:
            fh.write(b"\n".join(out) + (b"\n" if out else b""))
    return spool


def save_kafka(chunks, topic: str = "tenzir", brokers: str = "127.0.0.1:9092",
               key: str | None = None, timestamp_ms: int | None = None,
               partition: int = 0, timeout: float = 10.0) -> int:
    """Saver mirroring the reference `kafka` saver (saver_args: fixed
    --key/--timestamp applied to every message). ``chunks`` is an
    iterable of bytes/str payloads; one record each, one batch per call.
    Returns the number of records published."""
    kb = key.encode("utf-8") if key is not None else None
    records: list[tuple[bytes | None, bytes | None]] = []
    for c in chunks:
        if isinstance(c, str):
            c = c.encode("utf-8")
        records.append((kb, c))
    if not records:
        return 0
    host, port = _parse_brokers(brokers)
    with KafkaWireClient(host, port, timeout=timeout) as cli:
        cli.produce(topic, partition, records, timestamp_ms=timestamp_ms)
    return len(records)
