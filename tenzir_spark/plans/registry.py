"""Engine introspection + user-defined operator aliases.

- ``show(aspect)`` mirrors the reference's `show` source
  (libtenzir/builtins/operators/show.cpp:32 + builtins/aspects/*):
  operators, formats, connectors, aggregation functions, tables.
- Aliases mirror config-defined operator macros expanded at parse time
  (libtenzir/src/tql/parser.cpp:100-115; web/docs/operators/user-defined.md):
  here an alias is a named Python callable DataFrame -> DataFrame that
  Pipeline exposes as a method-by-name.
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import DataFrame, SparkSession

OPERATORS = [
    "where", "select", "drop", "put", "extend", "replace", "rename",
    "summarize", "sort", "unique", "deduplicate", "head", "tail", "taste",
    "top", "rare", "flatten", "unflatten", "enumerate", "batch", "repeat",
    "measure", "hash", "pass", "discard", "sigma",
    "import (lake.merge/append)", "export (lake.read)", "compact",
]

FORMATS = ["json", "suricata", "zeek-json", "csv", "tsv", "ssv", "zeek-tsv",
           "cef", "lines", "yaml", "parquet", "feather"]

CONNECTORS = ["file", "directory", "s3a://", "gs://", "kafka (structured streaming)",
              "stdin/stdout (driver)"]

AGGREGATION_FUNCTIONS_DOC = [
    "sum", "min", "max", "count", "count_distinct", "distinct", "any",
    "all", "sample", "avg", "stddev", "median", "p95", "collect",
]

_ALIASES: dict[str, Callable[..., DataFrame]] = {}


def register_alias(name: str, fn: Callable[..., DataFrame]) -> None:
    """Define a reusable pipeline macro: fn(df, *args) -> df."""
    _ALIASES[name] = fn


def get_alias(name: str) -> Callable[..., DataFrame]:
    return _ALIASES[name]


def aliases() -> list[str]:
    return sorted(_ALIASES)


def show(spark: SparkSession, aspect: str) -> DataFrame:
    """Introspection source: `show operators|formats|connectors|
    aggregation-functions|aliases|tables`."""
    data = {
        "operators": OPERATORS,
        "formats": FORMATS,
        "connectors": CONNECTORS,
        "aggregation-functions": AGGREGATION_FUNCTIONS_DOC,
        "aliases": aliases(),
    }
    if aspect == "tables":
        return spark.sql("SHOW TABLES")
    if aspect not in data:
        raise ValueError(f"unknown aspect {aspect!r}; one of {sorted(data) + ['tables']}")
    return spark.createDataFrame([(x,) for x in data[aspect]], f"{aspect.replace('-', '_')} string")
