"""http/https/ftp loader — the reference's curl connector
(libtenzir/builtins/connectors/curl.cpp): fetch bytes from a URL, then
parse with any format.

The fetch is a DRIVER-side download to a local spool file (rule feeds,
enrichment tables, schema registries — small, metadata-class payloads);
the parse stays distributed. Bulk data should land on an object store
and use s3a/gs URIs directly (Spark-native, fully distributed) — this
loader deliberately refuses files above ``max_bytes`` to keep multi-TB
inputs off the driver.

Tested with file:// URLs (no external network in the sandbox); the
urllib path is identical for http(s)/ftp.
"""

from __future__ import annotations

import os
import tempfile
import urllib.request

from pyspark.sql import DataFrame, SparkSession

_DEFAULT_MAX = 256 * 1024 * 1024  # 256 MiB: driver-spool ceiling


def http_fetch(url: str, dest: str | None = None, max_bytes: int = _DEFAULT_MAX,
               timeout: float = 60.0) -> str:
    """Download a URL to a local spool file; returns the path."""
    if dest is None:
        suffix = os.path.splitext(url.split("?")[0])[1] or ".bin"
        fd, dest = tempfile.mkstemp(prefix="tenzir_http_", suffix=suffix)
        os.close(fd)
    total = 0
    with urllib.request.urlopen(url, timeout=timeout) as resp, open(dest, "wb") as out:
        while True:
            chunk = resp.read(1 << 20)
            if not chunk:
                break
            total += len(chunk)
            if total > max_bytes:
                raise ValueError(
                    f"{url}: exceeds driver-spool limit ({max_bytes} bytes); "
                    "stage bulk data on an object store and read s3a:// directly")
            out.write(chunk)
    return dest


def http_load(spark: SparkSession, url: str, fmt: str | None = None,
              max_bytes: int = _DEFAULT_MAX, **reader_kw) -> DataFrame:
    """``from http://...`` — fetch then parse (load f | read g rewrite,
    from_load_read.cpp:19)."""
    from tenzir_spark.plans.tql import _READERS, _infer_format

    path = http_fetch(url, max_bytes=max_bytes)
    f = fmt or _infer_format(url)
    return _READERS[f](spark, path, **reader_kw)
