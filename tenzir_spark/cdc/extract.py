"""HTML -> text extraction: one pure function, two hosts.

``extract_text`` is the single source of truth (north rule: byte-identical
extracted text per url). It runs vectorized inside a pandas/Arrow UDF on
executors, and the very same function drives the pure-Python reference
replay in tests — so equality is by construction, divergence means a
plumbing bug, which is exactly what the invariant is for.
"""

from __future__ import annotations

import html as _html
import re

import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql import types as T

_SCRIPT_RE = re.compile(rb"<(script|style)\b[^>]*>.*?</\1>", re.S | re.I)
_TAG_RE = re.compile(rb"<[^>]+>")
_WS_RE = re.compile(r"\s+")


def extract_text(html_bytes: bytes | None) -> str | None:
    """Deterministic text extraction from raw page bytes.

    Not a full HTML5 parser (none is in this container); the contract is
    determinism + shared implementation, mirroring the reference's
    parser-then-golden-file strategy (tenzir/integration/reference/)."""
    if html_bytes is None:
        return None
    stripped = _SCRIPT_RE.sub(b" ", html_bytes)
    stripped = _TAG_RE.sub(b" ", stripped)
    text = stripped.decode("utf-8", errors="replace")
    text = _html.unescape(text)
    return _WS_RE.sub(" ", text).strip()


@F.pandas_udf(T.StringType())
def extract_text_udf(html: pd.Series) -> pd.Series:
    """Arrow-vectorized extraction (no per-row Python round trips —
    one pandas batch per Arrow batch, per input_hint)."""
    return html.map(extract_text)
