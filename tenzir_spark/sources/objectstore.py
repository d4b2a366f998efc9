"""s3 / gcs object-store connectors.

The reference implements these as thin wrappers over Arrow's own
filesystem layer — ``arrow::fs::S3FileSystem`` for s3
(libtenzir/builtins/connectors/s3.cpp:36-46 builds S3Options::Anonymous
for ``--anonymous``, else S3Options::FromUri with a Defaults fallback)
and ``arrow::fs::GcsFileSystem`` for gcs (plugins/gcs/src/plugin.cpp).
pyarrow ships the SAME filesystems, so this connector is the
reference's mechanism verbatim: parse the URI (query parameters carry
``region``/``scheme``/``endpoint_override``/``access_key``/
``secret_key``/``allow_bucket_creation``/``allow_bucket_deletion`` for
s3 and ``scheme``/``endpoint_override``/``retry_limit_seconds`` for
gcs, per Arrow's FromUri contract quoted in web/docs/connectors/s3.md
and gcs.md), open an input stream for the loader and an output stream
for the saver, and move bytes in 1 MiB chunks (the reference's
``max_chunk_size = 1 << 20``, s3.cpp:50).

Placement contract: like the curl connector (net.py), loads spool to a
DRIVER-side file and the parse stays distributed — the connector is
for metadata-class objects (rule feeds, lookup tables, single logs).
Bulk data belongs on Spark-native ``s3a://`` paths, which this module
deliberately leaves to Spark's own readers.
"""

from __future__ import annotations

import os
import tempfile
from urllib.parse import parse_qsl, urlsplit

_CHUNK = 1 << 20  # s3.cpp:50 max_chunk_size
_DEFAULT_MAX = 256 * 1024 * 1024  # driver-spool ceiling, same as net.py

_S3_SCHEMES = ("s3",)
_GCS_SCHEMES = ("gs", "gcs")


def _bool(v: str) -> bool:
    return str(v).strip().lower() in ("1", "true", "yes", "on")


def split_uri(uri: str) -> tuple[str, str, dict]:
    """``s3://bucket/key?opt=v`` -> (scheme, "bucket/key", {opt: v})."""
    parts = urlsplit(uri)
    if not parts.scheme or not parts.netloc:
        raise ValueError(f"malformed object-store URI: {uri!r}")
    path = parts.netloc + parts.path
    return parts.scheme, path.rstrip("/"), dict(parse_qsl(parts.query))


def filesystem_for(uri: str, anonymous: bool = False):
    """Build the Arrow filesystem + inner path for an s3/gs URI.

    Mirrors s3.cpp:36-46 ``get_options``: ``--anonymous`` forces
    anonymous credentials (query params other than credentials still
    apply — endpoint_override is how the tests point at a loopback
    store); otherwise Arrow's FromUri handles everything, with a
    default-credentials fallback when FromUri rejects the URI.
    """
    import pyarrow.fs as pafs

    scheme, path, q = split_uri(uri)
    if scheme in _S3_SCHEMES:
        if anonymous:
            kw: dict = {"anonymous": True}
            if "region" in q:
                kw["region"] = q["region"]
            if "scheme" in q:
                kw["scheme"] = q["scheme"]
            if "endpoint_override" in q:
                kw["endpoint_override"] = q["endpoint_override"]
            if "allow_bucket_creation" in q:
                kw["allow_bucket_creation"] = _bool(q["allow_bucket_creation"])
            if "allow_bucket_deletion" in q:
                kw["allow_bucket_deletion"] = _bool(q["allow_bucket_deletion"])
            return pafs.S3FileSystem(**kw), path
        try:
            fs, inner = pafs.FileSystem.from_uri(uri)
            return fs, inner
        except (OSError, ValueError):
            # S3Options::Defaults fallback (s3.cpp:40)
            return pafs.S3FileSystem(), path
    if scheme in _GCS_SCHEMES:
        kw = {"anonymous": True} if anonymous else {}
        if "endpoint_override" in q:
            kw["endpoint_override"] = q["endpoint_override"]
        if "scheme" in q:
            kw["scheme"] = q["scheme"]
        if "retry_limit_seconds" in q:
            from datetime import timedelta
            kw["retry_time_limit"] = timedelta(
                seconds=float(q["retry_limit_seconds"]))
        if anonymous or kw:
            return pafs.GcsFileSystem(**kw), path
        fs, inner = pafs.FileSystem.from_uri(uri)
        return fs, inner
    raise ValueError(f"not an object-store URI (s3:// or gs://): {uri!r}")


def objectstore_fetch(uri: str, anonymous: bool = False,
                      dest: str | None = None,
                      max_bytes: int = _DEFAULT_MAX) -> str:
    """Loader: stream an object to a local spool file; returns the path.

    The reference loader yields 1 MiB chunks off the Arrow input stream
    (s3.cpp:95-118); here they land in a spool the distributed readers
    then parse, the same split the curl connector uses.
    """
    fs, path = filesystem_for(uri, anonymous=anonymous)
    if dest is None:
        base = path.split("?", 1)[0]
        suffix = os.path.splitext(base)[1] or ".bin"
        fd, dest = tempfile.mkstemp(prefix="tenzir_objstore_", suffix=suffix)
        os.close(fd)
    total = 0
    with fs.open_input_stream(path) as src, open(dest, "wb") as out:
        while True:
            chunk = src.read(_CHUNK)
            if not chunk:
                break
            total += len(chunk)
            if total > max_bytes:
                out.close()
                os.unlink(dest)
                raise ValueError(
                    f"{uri}: exceeds driver-spool limit ({max_bytes} bytes); "
                    "stage bulk data on s3a:// and read it Spark-native")
            out.write(chunk)
    return dest


def objectstore_save(local_path: str, uri: str,
                     anonymous: bool = False) -> None:
    """Saver: stream a local file to the object (s3.cpp saver
    ``OpenOutputStream`` + chunked writes)."""
    fs, path = filesystem_for(uri, anonymous=anonymous)
    with open(local_path, "rb") as src, fs.open_output_stream(path) as out:
        while True:
            chunk = src.read(_CHUNK)
            if not chunk:
                break
            out.write(chunk)


def is_objectstore_uri(s: str) -> bool:
    return "://" in s and s.split("://", 1)[0] in _S3_SCHEMES + _GCS_SCHEMES
