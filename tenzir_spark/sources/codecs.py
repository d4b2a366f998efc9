"""Byte-stream compress/decompress — the reference's codec operators
(libtenzir/builtins/operators/compress_decompress.cpp:145,257: brotli,
bz2, gzip, lz4, zstd over byte streams via Arrow codecs).

Spark-first mapping:
- **Text-based formats read compressed files natively**: spark.read
  .json/.csv/.text transparently decompress ``.gz``/``.bz2`` by
  extension (Hadoop codecs), fully distributed (bz2 is even splittable).
  So ``load file x.json.gz | read json`` needs NO code — the TQL layer
  just passes the path through (covered by tests).
- **Explicit byte-stream decompression** (codec not inferable, format
  readers that sniff headers themselves, e.g. zeek-tsv): this module
  decompresses through Python's stdlib on the driver into a spool file.
  That is the right altitude for the reference's usage (feeds, logs fed
  to header-sniffing parsers); bulk columnar data uses parquet+zstd
  internally everywhere.
"""

from __future__ import annotations

import bz2
import gzip
import lzma
import os
import shutil
import tempfile

_OPENERS = {
    "gzip": gzip.open,
    "gz": gzip.open,
    "bz2": bz2.open,
    "bzip2": bz2.open,
    "lzma": lzma.open,
    "xz": lzma.open,
}

try:  # zstd: stdlib in 3.14+, else the zstandard wheel; gate gracefully
    from compression import zstd as _zstd  # type: ignore
    _OPENERS["zstd"] = _zstd.open
except ImportError:  # pragma: no cover
    try:
        import zstandard as _zstandard

        def _zstd_open(path, mode="rb"):
            return _zstandard.open(path, mode)

        _OPENERS["zstd"] = _zstd_open
    except ImportError:
        pass


def codec_of(path: str) -> str | None:
    """Infer codec from extension (the reference's auto mode)."""
    ext = os.path.splitext(path)[1].lstrip(".").lower()
    return ext if ext in _OPENERS else None


def supported_codecs() -> list[str]:
    return sorted(set(_OPENERS))


def decompress_file(path: str, codec: str | None = None, dest: str | None = None) -> str:
    """Decompress ``path`` into a spool file; returns the new path.

    ``codec`` defaults to extension inference. Reference semantics:
    decompress is bytes -> bytes (compress_decompress.cpp:257); the
    result feeds any parser.
    """
    codec = codec or codec_of(path)
    if codec is None:
        raise ValueError(f"cannot infer codec from {path!r}; pass codec=")
    opener = _OPENERS.get(codec)
    if opener is None:
        raise NotImplementedError(
            f"codec {codec!r} unavailable (have: {supported_codecs()})")
    if dest is None:
        base = os.path.basename(path)
        stem = base.rsplit(".", 1)[0] if "." in base else base
        fd, dest = tempfile.mkstemp(prefix="tenzir_dec_", suffix="_" + stem)
        os.close(fd)
    with opener(path, "rb") as src, open(dest, "wb") as out:
        shutil.copyfileobj(src, out)
    return dest


def compress_file(path: str, codec: str = "gzip", dest: str | None = None) -> str:
    """Compress ``path``; returns the new path (compress_decompress.cpp:145)."""
    opener = _OPENERS.get(codec)
    if opener is None:
        raise NotImplementedError(
            f"codec {codec!r} unavailable (have: {supported_codecs()})")
    suffix = {"gzip": ".gz", "gz": ".gz", "bz2": ".bz2", "bzip2": ".bz2",
              "lzma": ".xz", "xz": ".xz", "zstd": ".zst"}[codec]
    if dest is None:
        dest = path + suffix
    with open(path, "rb") as src, opener(dest, "wb") as out:
        shutil.copyfileobj(src, out)
    return dest
