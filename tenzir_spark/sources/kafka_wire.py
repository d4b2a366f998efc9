"""From-spec Kafka wire-protocol client (and codec) for the `kafka`
connector's loader/saver surface.

The reference connector is a librdkafka CLIENT
(/root/reference/plugins/kafka/src/plugin.cpp; consumer at
src/consumer.cpp, producer at src/producer.cpp): load bytes from a
topic, save bytes to a topic, with the `-o` offset grammar translated
by sources/kafka.parse_offset_spec. Neither librdkafka nor the
spark-sql-kafka jars ship in this sandbox (and there is no network to
resolve `spark.jars.packages`), so — the same way sources/zmq.py speaks
ZMTP and sources/velociraptor.py speaks gRPC — this module implements
the handful of public Kafka protocol APIs the loader/saver need, from
the spec at kafka.apache.org/protocol:

- ApiVersions v0, Metadata v1, ListOffsets v1, Fetch v4, Produce v3
- RecordBatch v2 (magic 2): CRC32C (Castagnoli), zigzag varints, the
  modern on-disk format every broker since 0.11 serves

The driver-side loader spools messages for the distributed readers
(bounded control-plane volume, like the zmq/fluent-bit listeners);
unbounded cluster-scale streams belong to the native Spark source built
by sources/kafka.read_kafka_stream when the connector jars are present.
Compressed record batches (attribute bits 0-2) are refused loudly —
the producer side never writes them and `compression.type=none` is the
loader's documented contract here.
"""
from __future__ import annotations

import io
import os
import socket
import struct
import tempfile
import time
from typing import NamedTuple

from tenzir_spark.sources.kafka import parse_offset_spec

API_PRODUCE = 0
API_FETCH = 1
API_LIST_OFFSETS = 2
API_METADATA = 3
API_VERSIONS = 18

EARLIEST = -2
LATEST = -1

_ERROR_NAMES = {
    1: "OFFSET_OUT_OF_RANGE",
    2: "CORRUPT_MESSAGE",
    3: "UNKNOWN_TOPIC_OR_PARTITION",
    5: "LEADER_NOT_AVAILABLE",
    6: "NOT_LEADER_FOR_PARTITION",
    7: "REQUEST_TIMED_OUT",
}


class KafkaError(RuntimeError):
    def __init__(self, code: int, context: str = ""):
        self.code = code
        name = _ERROR_NAMES.get(code, f"ERROR_{code}")
        super().__init__(f"kafka error {code} {name}"
                         + (f" ({context})" if context else ""))


# ----------------------------------------------------------- primitives


def w_i8(b: io.BytesIO, v: int) -> None:
    b.write(struct.pack(">b", v))


def w_i16(b: io.BytesIO, v: int) -> None:
    b.write(struct.pack(">h", v))


def w_i32(b: io.BytesIO, v: int) -> None:
    b.write(struct.pack(">i", v))


def w_i64(b: io.BytesIO, v: int) -> None:
    b.write(struct.pack(">q", v))


def w_string(b: io.BytesIO, s: str | None) -> None:
    if s is None:
        w_i16(b, -1)
    else:
        raw = s.encode("utf-8")
        w_i16(b, len(raw))
        b.write(raw)


def w_bytes(b: io.BytesIO, v: bytes | None) -> None:
    if v is None:
        w_i32(b, -1)
    else:
        w_i32(b, len(v))
        b.write(v)


class Reader:
    """Big-endian cursor over one response/request body."""

    def __init__(self, buf: bytes):
        self.buf = memoryview(buf)
        self.pos = 0

    def take(self, n: int) -> bytes:
        v = bytes(self.buf[self.pos:self.pos + n])
        if len(v) < n:
            raise ValueError("kafka frame truncated")
        self.pos += n
        return v

    def i8(self) -> int:
        return struct.unpack(">b", self.take(1))[0]

    def i16(self) -> int:
        return struct.unpack(">h", self.take(2))[0]

    def i32(self) -> int:
        return struct.unpack(">i", self.take(4))[0]

    def i64(self) -> int:
        return struct.unpack(">q", self.take(8))[0]

    def string(self) -> str | None:
        n = self.i16()
        return None if n < 0 else self.take(n).decode("utf-8")

    def raw_bytes(self) -> bytes | None:
        n = self.i32()
        return None if n < 0 else self.take(n)

    def array(self, fn):
        n = self.i32()
        return None if n < 0 else [fn() for _ in range(n)]


# -------------------------------------------------------------- varints


def zigzag_encode(n: int) -> int:
    return (n << 1) ^ (n >> 63) if n < 0 else n << 1


def zigzag_decode(z: int) -> int:
    return (z >> 1) ^ -(z & 1)


def write_varint(b: io.BytesIO, n: int) -> None:
    """Signed (zigzag) varint — the encoding RecordBatch v2 records use
    for every integer field."""
    z = zigzag_encode(n)
    while True:
        byte = z & 0x7F
        z >>= 7
        if z:
            b.write(bytes([byte | 0x80]))
        else:
            b.write(bytes([byte]))
            return


def read_varint(buf: memoryview, pos: int) -> tuple[int, int]:
    shift = z = 0
    while True:
        byte = buf[pos]
        pos += 1
        z |= (byte & 0x7F) << shift
        if not byte & 0x80:
            return zigzag_decode(z), pos
        shift += 7
        if shift > 63:
            raise ValueError("kafka varint too long")


# ---------------------------------------------------------------- crc32c

_CRC32C_POLY = 0x82F63B78  # Castagnoli, reflected


def _crc32c_table() -> list[int]:
    table = []
    for i in range(256):
        crc = i
        for _ in range(8):
            crc = (crc >> 1) ^ _CRC32C_POLY if crc & 1 else crc >> 1
        table.append(crc)
    return table


_CRC32C = _crc32c_table()


def crc32c(data: bytes) -> int:
    crc = 0xFFFFFFFF
    for b in data:
        crc = (crc >> 8) ^ _CRC32C[(crc ^ b) & 0xFF]
    return crc ^ 0xFFFFFFFF


# --------------------------------------------------------- record batch


class Record(NamedTuple):
    offset: int
    timestamp: int
    key: bytes | None
    value: bytes | None


def encode_record_batch(base_offset: int,
                        records: list[tuple[bytes | None, bytes | None]],
                        first_timestamp: int) -> bytes:
    """RecordBatch v2 (magic 2), uncompressed, all records stamped
    ``first_timestamp`` (the producer path sets one wall-clock per
    Produce call, like the reference's fixed `-T` saver timestamp)."""
    recs = io.BytesIO()
    for i, (key, value) in enumerate(records):
        body = io.BytesIO()
        body.write(b"\x00")  # record attributes (unused)
        write_varint(body, 0)  # timestampDelta
        write_varint(body, i)  # offsetDelta
        if key is None:
            write_varint(body, -1)
        else:
            write_varint(body, len(key))
            body.write(key)
        if value is None:
            write_varint(body, -1)
        else:
            write_varint(body, len(value))
            body.write(value)
        write_varint(body, 0)  # headers
        payload = body.getvalue()
        write_varint(recs, len(payload))
        recs.write(payload)
    section = io.BytesIO()
    w_i16(section, 0)  # attributes: no compression, create-time stamps
    w_i32(section, len(records) - 1)  # lastOffsetDelta
    w_i64(section, first_timestamp)
    w_i64(section, first_timestamp)  # maxTimestamp (deltas are all 0)
    w_i64(section, -1)  # producerId (idempotence not used)
    w_i16(section, -1)  # producerEpoch
    w_i32(section, -1)  # baseSequence
    w_i32(section, len(records))
    section.write(recs.getvalue())
    sec = section.getvalue()
    out = io.BytesIO()
    w_i64(out, base_offset)
    w_i32(out, 4 + 1 + 4 + len(sec))  # partitionLeaderEpoch+magic+crc+sec
    w_i32(out, -1)  # partitionLeaderEpoch
    w_i8(out, 2)  # magic
    out.write(struct.pack(">I", crc32c(sec)))
    out.write(sec)
    return out.getvalue()


def decode_record_batches(buf: bytes) -> list[Record]:
    """Decode a Fetch record set: any number of concatenated v2 batches;
    a partial trailing batch (broker truncation at max_bytes) is
    dropped, matching consumer semantics."""
    out: list[Record] = []
    mv = memoryview(buf)
    pos = 0
    while len(buf) - pos >= 12:
        base_offset = struct.unpack_from(">q", mv, pos)[0]
        batch_len = struct.unpack_from(">i", mv, pos + 8)[0]
        if len(buf) - pos - 12 < batch_len - 4 - 1 - 4 + 9:
            break  # partial trailing batch
        end = pos + 12 + batch_len
        if end > len(buf):
            break
        magic = struct.unpack_from(">b", mv, pos + 16)[0]
        if magic != 2:
            raise ValueError(f"unsupported record batch magic {magic} "
                             f"(only v2 is spoken here)")
        crc = struct.unpack_from(">I", mv, pos + 17)[0]
        sec = bytes(mv[pos + 21:end])
        if crc32c(sec) != crc:
            raise ValueError(
                f"record batch CRC32C mismatch at offset {base_offset}")
        r = Reader(sec)
        attributes = r.i16()
        if attributes & 0x07:
            raise ValueError(
                "compressed record batches not supported — produce with "
                "compression.type=none for this loader")
        r.i32()  # lastOffsetDelta
        first_ts = r.i64()
        r.i64()  # maxTimestamp
        r.i64()  # producerId
        r.i16()  # producerEpoch
        r.i32()  # baseSequence
        count = r.i32()
        rpos = r.pos
        for _ in range(count):
            _length, rpos = read_varint(r.buf, rpos)
            rpos += 1  # record attributes
            ts_delta, rpos = read_varint(r.buf, rpos)
            off_delta, rpos = read_varint(r.buf, rpos)
            klen, rpos = read_varint(r.buf, rpos)
            key = None
            if klen >= 0:
                key = bytes(r.buf[rpos:rpos + klen])
                rpos += klen
            vlen, rpos = read_varint(r.buf, rpos)
            value = None
            if vlen >= 0:
                value = bytes(r.buf[rpos:rpos + vlen])
                rpos += vlen
            n_headers, rpos = read_varint(r.buf, rpos)
            for _ in range(n_headers):
                hk, rpos = read_varint(r.buf, rpos)
                rpos += max(hk, 0)
                hv, rpos = read_varint(r.buf, rpos)
                rpos += max(hv, 0)
            out.append(Record(base_offset + off_delta,
                              first_ts + ts_delta, key, value))
        pos = end
    return out


# ------------------------------------------------------------- client


class KafkaWireClient:
    """One broker connection (loopback/test deployments have exactly
    one; multi-broker leader routing is the native Spark source's job)."""

    def __init__(self, host: str, port: int, client_id: str = "tenzir",
                 timeout: float = 10.0):
        self.sock = socket.create_connection((host, port), timeout=timeout)
        self.sock.settimeout(timeout)
        self.client_id = client_id
        self._corr = 0

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()

    def close(self):
        try:
            self.sock.close()
        except OSError:
            pass

    def _recv_exact(self, n: int) -> bytes:
        buf = bytearray()
        while len(buf) < n:
            chunk = self.sock.recv(n - len(buf))
            if not chunk:
                raise ConnectionError("kafka broker closed mid-frame")
            buf += chunk
        return bytes(buf)

    def _rpc(self, api_key: int, version: int, body: bytes) -> Reader:
        self._corr += 1
        hdr = io.BytesIO()
        w_i16(hdr, api_key)
        w_i16(hdr, version)
        w_i32(hdr, self._corr)
        w_string(hdr, self.client_id)
        req = hdr.getvalue() + body
        self.sock.sendall(struct.pack(">i", len(req)) + req)
        (size,) = struct.unpack(">i", self._recv_exact(4))
        r = Reader(self._recv_exact(size))
        corr = r.i32()
        if corr != self._corr:
            raise ValueError(
                f"kafka correlation mismatch: {corr} != {self._corr}")
        return r

    def api_versions(self) -> dict[int, tuple[int, int]]:
        r = self._rpc(API_VERSIONS, 0, b"")
        err = r.i16()
        if err:
            raise KafkaError(err, "ApiVersions")
        return {k: (lo, hi) for k, lo, hi in
                [(r.i16(), r.i16(), r.i16()) for _ in range(r.i32())]}

    def metadata(self, topics: list[str] | None = None) -> dict:
        body = io.BytesIO()
        if topics is None:
            w_i32(body, -1)  # all topics
        else:
            w_i32(body, len(topics))
            for t in topics:
                w_string(body, t)
        r = self._rpc(API_METADATA, 1, body.getvalue())
        brokers = []
        for _ in range(r.i32()):
            brokers.append({"node_id": r.i32(), "host": r.string(),
                            "port": r.i32(), "rack": r.string()})
        r.i32()  # controller id
        out_topics: dict[str, dict] = {}
        for _ in range(r.i32()):
            err = r.i16()
            name = r.string()
            r.i8()  # is_internal
            parts = []
            for _ in range(r.i32()):
                perr, pid = r.i16(), r.i32()
                r.i32()  # leader
                for _ in range(r.i32()):
                    r.i32()
                for _ in range(r.i32()):
                    r.i32()
                if not perr:
                    parts.append(pid)
            out_topics[name] = {"error": err, "partitions": sorted(parts)}
        return {"brokers": brokers, "topics": out_topics}

    def list_offsets(self, topic: str, partition: int,
                     timestamp: int) -> int:
        body = io.BytesIO()
        w_i32(body, -1)  # replica_id
        w_i32(body, 1)
        w_string(body, topic)
        w_i32(body, 1)
        w_i32(body, partition)
        w_i64(body, timestamp)
        r = self._rpc(API_LIST_OFFSETS, 1, body.getvalue())
        for _ in range(r.i32()):
            r.string()
            for _ in range(r.i32()):
                pid, err = r.i32(), r.i16()
                r.i64()  # timestamp
                off = r.i64()
                if pid == partition:
                    if err:
                        raise KafkaError(err, f"ListOffsets {topic}/{pid}")
                    return off
        raise KafkaError(3, f"ListOffsets {topic}/{partition} missing")

    def produce(self, topic: str, partition: int,
                records: list[tuple[bytes | None, bytes | None]],
                timestamp_ms: int | None = None, acks: int = 1,
                timeout_ms: int = 10000) -> int:
        batch = encode_record_batch(
            0, records,
            timestamp_ms if timestamp_ms is not None
            else int(time.time() * 1000))
        body = io.BytesIO()
        w_string(body, None)  # transactional_id
        w_i16(body, acks)
        w_i32(body, timeout_ms)
        w_i32(body, 1)
        w_string(body, topic)
        w_i32(body, 1)
        w_i32(body, partition)
        w_bytes(body, batch)
        r = self._rpc(API_PRODUCE, 3, body.getvalue())
        base = -1
        for _ in range(r.i32()):
            r.string()
            for _ in range(r.i32()):
                pid, err = r.i32(), r.i16()
                boff = r.i64()
                r.i64()  # log_append_time
                if err:
                    raise KafkaError(err, f"Produce {topic}/{pid}")
                if pid == partition:
                    base = boff
        return base

    def fetch(self, topic: str, partition: int, offset: int,
              max_wait_ms: int = 100, min_bytes: int = 1,
              max_bytes: int = 1 << 20) -> tuple[list[Record], int]:
        body = io.BytesIO()
        w_i32(body, -1)  # replica_id
        w_i32(body, max_wait_ms)
        w_i32(body, min_bytes)
        w_i32(body, max_bytes)
        w_i8(body, 0)  # isolation_level: read_uncommitted
        w_i32(body, 1)
        w_string(body, topic)
        w_i32(body, 1)
        w_i32(body, partition)
        w_i64(body, offset)
        w_i32(body, max_bytes)
        r = self._rpc(API_FETCH, 4, body.getvalue())
        r.i32()  # throttle
        records: list[Record] = []
        hwm = -1
        for _ in range(r.i32()):
            r.string()
            for _ in range(r.i32()):
                pid, err = r.i32(), r.i16()
                phwm = r.i64()
                r.i64()  # last_stable_offset
                for _ in range(r.i32()):  # aborted transactions
                    r.i64(), r.i64()
                rs = r.raw_bytes() or b""
                if err:
                    raise KafkaError(err, f"Fetch {topic}/{pid}@{offset}")
                if pid == partition:
                    hwm = phwm
                    # brokers may return batches starting below the
                    # requested offset (batch granularity) — trim
                    records.extend(rec for rec in decode_record_batches(rs)
                                   if rec.offset >= offset)
        return records, hwm


# ------------------------------------------------------- loader / saver


def load_kafka(topic: str = "tenzir", brokers: str = "127.0.0.1:9092",
               count: int | None = None, exit_at_end: bool = False,
               offset: str | int = "stored", timeout: float = 10.0,
               raw: bool = False) -> str:
    """Consumer loader (kafka.md: ``kafka [-t] [-c] [-e] [-o] [-X]``):
    fetch from every partition starting at the reference offset spec,
    spool values newline-framed (the connector's default downstream
    format is json/NDJSON) for the distributed reader. Stops after
    ``count`` messages, at the log end with ``exit_at_end``, else polls
    until ``timeout``. 'stored' starts at the end like a fresh consumer
    group — group-coordination offsets are the native Spark source's
    checkpoint job (sources/kafka.parse_offset_spec docstring)."""
    host, _, port = brokers.partition(":")
    deadline = time.monotonic() + timeout
    values: list[bytes] = []
    with KafkaWireClient(host, int(port or 9092), timeout=timeout) as cli:
        md = cli.metadata([topic])
        info = md["topics"].get(topic, {})
        if info.get("error"):
            raise KafkaError(info["error"], f"Metadata {topic}")
        parts = info.get("partitions") or []
        if not parts:
            raise KafkaError(3, f"topic {topic!r} has no partitions")
        spec = parse_offset_spec(offset)
        pos: dict[int, int] = {}
        for p in parts:
            if spec["kind"] == "absolute":
                pos[p] = spec["offset"]
            elif spec["kind"] == "tail":
                pos[p] = max(cli.list_offsets(topic, p, LATEST)
                             - spec["offset"], 0)
            elif spec.get("startingOffsets") == "earliest":
                pos[p] = cli.list_offsets(topic, p, EARLIEST)
            else:  # end, or stored without group coordination
                pos[p] = cli.list_offsets(topic, p, LATEST)
        while time.monotonic() < deadline:
            if count is not None and len(values) >= count:
                break
            at_end = True
            for p in parts:
                if count is not None and len(values) >= count:
                    break
                recs, hwm = cli.fetch(topic, p, pos[p])
                for rec in recs:
                    pos[p] = rec.offset + 1
                    if rec.value is not None:
                        values.append(rec.value)
                        if count is not None and len(values) >= count:
                            break
                if pos[p] < hwm:
                    at_end = False
            if at_end:
                if exit_at_end:
                    break
                time.sleep(0.05)
    if count is not None:
        values = values[:count]
    fd, spool = tempfile.mkstemp(prefix="tenzir_kafka_")
    with os.fdopen(fd, "wb") as fh:
        for v in values:
            if not raw and b"\n" in v.rstrip(b"\n"):
                raise ValueError(
                    "kafka message contains embedded newlines — pass "
                    "raw=True (TQL: --raw) for byte-concatenated spools")
            fh.write(v if raw else v.rstrip(b"\n") + b"\n")
    return spool


def save_kafka(messages, topic: str = "tenzir",
               brokers: str = "127.0.0.1:9092", key: str | None = None,
               timestamp_ms: int | None = None, timeout: float = 10.0,
               batch_size: int = 1000) -> int:
    """Producer saver (kafka.md: ``kafka [-t] [-k] [-T] [-X]``): one
    message per event, fixed key/timestamp per the reference saver_args;
    single pass over ``messages`` (an iterator is fine — driver memory
    stays bounded to ``batch_size``)."""
    host, _, port = brokers.partition(":")
    kb = key.encode("utf-8") if isinstance(key, str) else key
    sent = 0
    with KafkaWireClient(host, int(port or 9092), timeout=timeout) as cli:
        batch: list[tuple[bytes | None, bytes]] = []

        def flush():
            nonlocal sent
            if batch:
                cli.produce(topic, 0, batch, timestamp_ms=timestamp_ms)
                sent += len(batch)
                batch.clear()

        for m in messages:
            batch.append((kb, m.encode("utf-8") if isinstance(m, str)
                          else bytes(m)))
            if len(batch) >= batch_size:
                flush()
        flush()
    return sent
