"""Pure-Python reference replay — the independent oracle for CDC tests.

Replays the change log row by row in lsn order into a dict, applying the
same documented semantics (upsert on insert/update, remove on delete,
schema add/rename/widen) WITHOUT Spark. Tests assert the engine's final
lake state equals this replay byte-for-byte (north rule: "matching the
reference's final table state after replay").
"""

from __future__ import annotations

import json
from typing import Any

from tenzir_spark.cdc.extract import extract_text


def replay(rows: list[dict]) -> tuple[dict[str, dict], list[str]]:
    """rows: collected change log (any order; sorted here by lsn).
    Returns (final_state: url -> row dict, final_columns)."""
    columns = ["url", "warc_ts", "html", "text", "lang"]
    state: dict[str, dict[str, Any]] = {}
    # engine semantics: an epoch's schema directives apply before its data
    # rows (generator places them at the epoch's first lsn) — break the
    # lsn tie deterministically the same way
    for r in sorted(rows, key=lambda r: (r["lsn"], 0 if r["op"] == "schema" else 1)):
        op = r["op"]
        if op == "schema":
            d = json.loads(r["schema_descriptor"])
            if d["type"] == "add":
                if d["name"] not in columns:
                    columns.append(d["name"])
                    for row in state.values():  # existing rows read as null
                        row.setdefault(d["name"], None)
            elif d["type"] == "rename":
                if d["from"] in columns:
                    columns[columns.index(d["from"])] = d["to"]
                    for row in state.values():
                        row[d["to"]] = row.pop(d["from"], None)
            elif d["type"] == "widen":
                pass  # value-preserving
            continue
        url = r["url"]
        if op == "delete":
            state.pop(url, None)
            continue
        row = {c: None for c in columns}
        row["url"] = url
        for c in ("warc_ts", "lang"):
            if c in columns:
                row[c] = r.get(c)
        if "html" in columns:
            row["html"] = r.get("html")
            row["text"] = extract_text(r.get("html"))
        state[url] = row
    return state, columns
