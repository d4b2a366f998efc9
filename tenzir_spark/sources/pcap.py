"""PCAP packet-capture format: read and write classic libpcap files.

Reference: ``libtenzir/builtins/formats/pcap.cpp`` (parser emitting
``pcap.packet`` events, ``-e/--emit-file-headers``, printer reproducing
byte-identical traces) and ``libtenzir/include/tenzir/pcap.hpp`` (the
24-byte file header / 16-byte packet header structs, usec magic
0xa1b2c3d4 and nsec magic 0xa1b23c4d).

Spark design: ``spark.read.format("binaryFile")`` lists the capture
files; a ``mapInPandas`` stage parses each file's bytes into packet rows.
A pcap stream is NOT splittable (packet records are variable-length with
no sync markers), so — exactly like the reference, which streams one
loader chunk sequence per file — the unit of parallelism is the FILE.
At 100 TB that is the right shape: captures arrive as many rotated
files (or many objects in a bucket) and each parses independently on its
own executor core; a single monolithic pcap is inherently sequential in
any engine. Packet order is preserved within a file.
"""

from __future__ import annotations

import struct

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

MAGIC_USEC = 0xA1B2C3D4
MAGIC_NSEC = 0xA1B23C4D

#: pcap.packet — field order and names per pcap.cpp packet_record_type()
#: (src/pcap.cpp:134-146). `data` is BinaryType here: the reference models
#: raw packet bytes as a string with a `skip` attribute; binary is the
#: honest Spark type and round-trips losslessly.
PACKET_SCHEMA = (
    "linktype long, timestamp timestamp, captured_packet_length long, "
    "original_packet_length long, data binary"
)

#: pcap.file_header — pcap.cpp file_header_type / make_file_header_table_slice
FILE_HEADER_FIELDS = (
    "magic_number long, major_version long, minor_version long, "
    "reserved1 long, reserved2 long, snaplen long"
)

# union schema used with emit_file_headers=True: one static schema with a
# `_schema` discriminator ("pcap.file_header" rows carry the header
# fields, "pcap.packet" rows the packet fields) — the engine's standard
# multi-schema encoding (see operators/cast.py unify_streams), since a
# DataFrame cannot interleave two Arrow schemas the way the reference's
# heterogeneous table-slice stream can.
UNION_SCHEMA = f"_schema string, {FILE_HEADER_FIELDS}, {PACKET_SCHEMA}"


def _parse_file(blob: bytes, emit_file_headers: bool):
    """Parse one pcap file (plain or gzip) into row tuples.

    Yields ("pcap.file_header", fields...) and ("pcap.packet", fields...)
    tuples in stream order. Transparent gunzip mirrors the reference's
    loader-side decompression of `.pcap.gz` inputs.
    """
    if blob[:2] == b"\x1f\x8b":
        import gzip

        blob = gzip.decompress(blob)
    n = len(blob)
    off = 0
    rows = []
    # A concatenated stream may contain several file headers
    # (`shell "cat a.pcap b.pcap" | read pcap -e` in the reference's
    # integration suite) — resync on each magic.
    while off + 24 <= n:
        magic_raw = struct.unpack_from("<I", blob, off)[0]
        if magic_raw in (MAGIC_USEC, MAGIC_NSEC):
            endian, magic = "<", magic_raw
        else:
            magic = struct.unpack_from(">I", blob, off)[0]
            if magic not in (MAGIC_USEC, MAGIC_NSEC):
                raise ValueError(f"not a pcap stream at offset {off}: "
                                 f"magic {magic_raw:#x}")
            endian = ">"
        nanos = magic == MAGIC_NSEC
        vmaj, vmin, r1, r2, snaplen, linktype = struct.unpack_from(
            endian + "HHIIII", blob, off + 4)
        off += 24
        if emit_file_headers:
            rows.append(("pcap.file_header",
                         magic, vmaj, vmin, r1, r2, snaplen, linktype,
                         None, None, None, None))
        pkt = struct.Struct(endian + "IIII")

        def _is_file_header(pos: int) -> bool:
            # a packet's ts_sec can coincide with the magic bytes (e.g.
            # a capture taken at epoch 0xa1b2c3d4) — require the 2.4
            # version fields AND zeroed reserved words (mandated by the
            # pcap spec). Under the packet-header overlay those map to
            # ts_frac == 0x00040002 AND incl == orig == 0, i.e. only a
            # zero-length packet with a forged timestamp can still mimic
            # a header — the narrowest ambiguity the stateless format
            # permits.
            if pos + 24 > n:
                return False
            for e in ("<", ">"):
                m = struct.unpack_from(e + "I", blob, pos)[0]
                if m in (MAGIC_USEC, MAGIC_NSEC):
                    maj, mi, r1, r2 = struct.unpack_from(
                        e + "HHII", blob, pos + 4)
                    if maj == 2 and mi == 4 and r1 == 0 and r2 == 0:
                        return True
            return False

        while off + 16 <= n:
            # a following concatenated file header?
            if _is_file_header(off):
                break
            ts_sec, ts_frac, incl, orig = pkt.unpack_from(blob, off)
            off += 16
            if off + incl > n:
                # truncated trailer (capture killed mid-write): keep the
                # complete packets and consume the remainder, so the
                # outer resync loop doesn't mistake the partial payload
                # for a corrupt file header
                off = n
                break
            data = blob[off:off + incl]
            off += incl
            # classic-pcap timestamps are sec + usec (or nsec with the
            # 0xa1b23c4d magic); Spark timestamps are microsecond —
            # nanosecond captures truncate to usec (documented; the
            # writer re-expands by the output magic's unit)
            micros = ts_sec * 1_000_000 + (
                ts_frac // 1000 if nanos else ts_frac)
            rows.append(("pcap.packet", None, None, None, None, None, None,
                         linktype & 0xFFFF, micros, incl, orig, data))
    return rows


def read_pcap(spark: SparkSession, path: str,
              emit_file_headers: bool = False) -> DataFrame:
    """Read classic pcap files into ``pcap.packet`` rows (pcap.cpp parser).

    ``emit_file_headers=True`` (the reference's ``-e`` flag,
    pcap.cpp:121-123) interleaves ``pcap.file_header`` rows under the
    union schema with a ``_schema`` discriminator; the default returns
    the pure packet schema. Files (including ``.pcap.gz``) parse in
    parallel — one sequential scan per file, files distributed across
    executors.
    """
    import datetime

    import pandas as pd

    files = spark.read.format("binaryFile").load(path)
    emit = emit_file_headers

    def parse(batches):
        for pdf in batches:
            out = {k: [] for k in ("_schema", "magic_number", "major_version",
                                   "minor_version", "reserved1", "reserved2",
                                   "snaplen", "linktype", "timestamp",
                                   "captured_packet_length",
                                   "original_packet_length", "data")}
            for blob in pdf["content"]:
                for row in _parse_file(bytes(blob), emit):
                    (schema, magic, vmaj, vmin, r1, r2, snap,
                     linktype, micros, incl, orig, data) = row
                    out["_schema"].append(schema)
                    out["magic_number"].append(magic)
                    out["major_version"].append(vmaj)
                    out["minor_version"].append(vmin)
                    out["reserved1"].append(r1)
                    out["reserved2"].append(r2)
                    out["snaplen"].append(snap)
                    out["linktype"].append(linktype)
                    # tz-AWARE UTC: a naive datetime would be localized
                    # to spark.sql.session.timeZone by the Arrow
                    # serializer, shifting the stored instant whenever
                    # the session is not UTC
                    out["timestamp"].append(
                        None if micros is None else
                        datetime.datetime(1970, 1, 1,
                                          tzinfo=datetime.timezone.utc)
                        + datetime.timedelta(microseconds=micros))
                    out["captured_packet_length"].append(incl)
                    out["original_packet_length"].append(orig)
                    out["data"].append(data)
            yield pd.DataFrame(out)

    df = files.select("content").mapInPandas(parse, UNION_SCHEMA)
    if emit_file_headers:
        return df
    return df.select("linktype", "timestamp", "captured_packet_length",
                     "original_packet_length", "data")


def write_pcap(df: DataFrame, path: str, linktype: int = 1,
               snaplen: int = 262144, magic: int = MAGIC_USEC) -> None:
    """Write packets back to one classic pcap file (pcap.cpp printer,
    make_file_header at pcap.cpp:410-421).

    If ``df`` carries file-header rows (``read_pcap(...,
    emit_file_headers=True)``) the FIRST header is the output blueprint —
    magic/version/snaplen/linktype are reproduced verbatim, which makes
    ``write_pcap(read_pcap(f, emit_file_headers=True))`` byte-identical
    to the input for little-endian captures (the reference pins md5
    2696858410a08f5edb405b8630a9858c for its example trace;
    tests/test_pcap.py replays that). Headers always serialize
    little-endian: a BIG-endian source trace round-trips value-identical
    but byte-swapped — the same behavior as the reference's writer,
    which emits host byte order (pcap.cpp make_file_header).

    Packet records render distributed (one base64 blob per Arrow batch
    via mapInPandas); the single-file assembly streams SHARED-storage
    part files through the FileIO seam in partition order — inherent to
    a one-stream binary format, same as the zeek-tsv printer, and safe
    on a multi-machine cluster (parts land next to the destination, not
    in a driver-local tempdir).
    """
    import base64

    import pandas as pd

    cols = df.columns
    if "_schema" in cols:
        # deterministic blueprint: with several input captures unioned,
        # 'first' has no defined order — pick the smallest header tuple
        hdr = (df.filter(F.col("_schema") == "pcap.file_header")
               .select("magic_number", "major_version", "minor_version",
                       "reserved1", "reserved2", "snaplen", "linktype")
               .orderBy("magic_number", "snaplen", "linktype")
               .limit(1).collect())
        if hdr:
            magic = int(hdr[0]["magic_number"])
            snaplen = int(hdr[0]["snaplen"])
            linktype = int(hdr[0]["linktype"])
            vmaj, vmin, r1, r2 = (int(hdr[0]["major_version"]),
                                  int(hdr[0]["minor_version"]),
                                  int(hdr[0]["reserved1"]),
                                  int(hdr[0]["reserved2"]))
        else:
            vmaj, vmin, r1, r2 = 2, 4, 0, 0
        pkts = df.filter(F.col("_schema") == "pcap.packet")
    else:
        vmaj, vmin, r1, r2 = 2, 4, 0, 0
        pkts = df
    nanos = magic == MAGIC_NSEC
    # Arrow hands the UDF NAIVE datetimes rendered in the session tz;
    # localize through it so the written epoch is the true UTC instant
    # (symmetric with read_pcap's tz-aware emit)
    session_tz = df.sparkSession.conf.get("spark.sql.session.timeZone")

    def render(batches):
        import pandas as pd

        for pdf in batches:
            parts = []
            ts = pd.to_datetime(pdf["timestamp"])
            if ts.isna().any():
                # NaT would silently become the int64-min sentinel and
                # write a garbage packet header — refuse loudly instead
                raise ValueError(
                    "write_pcap: null packet timestamp(s) in input; "
                    "drop or fill them before writing")
            # nonexistent='shift_forward' keeps a timestamp that falls in
            # a DST gap of a non-UTC session tz writable instead of
            # raising NonExistentTimeError for the whole file
            usec = (ts.dt.tz_localize(session_tz,
                                      nonexistent="shift_forward",
                                      ambiguous=False)
                    .astype("int64").to_numpy() // 1000)
            for ts_us, incl, orig, data in zip(
                    usec, pdf["captured_packet_length"],
                    pdf["original_packet_length"], pdf["data"]):
                sec, frac = divmod(int(ts_us), 1_000_000)
                if nanos:
                    frac *= 1000
                parts.append(struct.pack("<IIII", sec, frac, int(incl),
                                         int(orig)))
                parts.append(bytes(data))
            yield pd.DataFrame(
                {"b64": [base64.b64encode(b"".join(parts)).decode()]})

    from tenzir_spark.sources.formats import _assemble_parts
    _assemble_parts(
        pkts.select("timestamp", "captured_packet_length",
                    "original_packet_length", "data")
        .mapInPandas(render, "b64 string"),
        path,
        head=struct.pack("<IHHIIII", magic, vmaj, vmin, r1, r2,
                         snaplen, linktype),
        transform=base64.b64decode)
