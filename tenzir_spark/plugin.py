"""User-defined extension surface (UDx).

The reference's extension mechanism is a C++ plugin API with one class
per extension point — ``operator_plugin``, ``aggregation_function_plugin``,
``parser_plugin``, ``printer_plugin``, ``loader_plugin``, ``saver_plugin``,
``store_plugin`` (libtenzir/include/tenzir/plugin.hpp). Here each kind is
a process-local registry the TQL compiler consults before raising
"unknown …", so a plain Python call extends the language:

- :func:`register_source` — a source operator usable in first position
  (``my_source <args> | …``); ``fn(spark, *args) -> DataFrame``.
  Covers the reference's source-position ``operator_plugin`` AND its
  ``loader_plugin`` (in this architecture a loader that produces bytes
  and the parser that decodes them collapse into one DataFrame-producing
  callable — Spark has no separate byte-stream stage between them).
- :func:`register_operator` — a transformation usable mid-pipeline;
  ``fn(df, *args) -> DataFrame``. Transformation-position
  ``operator_plugin``.
- :func:`register_aggregation` — a function for ``summarize``;
  ``fn(Column) -> Column`` building a native Spark aggregate
  (``aggregation_function_plugin``; the incremental add()/finish()
  contract of aggregation_function.hpp maps to Spark partial aggregates,
  so registered aggregations keep map-side combine for free).
- :func:`register_parser` — a format for ``read <name>`` / ``from
  <path>``; ``fn(spark, path, opts: list[str]) -> DataFrame`` (the raw
  TQL option tokens pass through uninterpreted so the parser owns its
  flag grammar, like ``parser_plugin``'s parse_parser_args). Optional
  ``extensions`` wire file-extension inference.
- :func:`register_printer` — a sink format for ``write <name> | save
  <path>``; ``fn(df, path, opts: list[str]) -> None``. Covers
  ``printer_plugin`` + ``saver_plugin`` (same collapse as loaders).

Registered callables receive DataFrames/Columns: all custom per-row
compute should be vectorized (pandas_udf / mapInPandas over Arrow
batches), never row-at-a-time Python — same rule as the built-ins.

Builtin names are shadow-protected: registering ``where`` or ``json``
raises instead of silently changing engine semantics. Registries are
process-local (driver-side parse-time lookups only — executors never
see them), matching the reference's static plugin registry
(plugin.cpp get()/get_mutable()).
"""

from __future__ import annotations

from typing import Callable, Iterable

from pyspark.sql import Column, DataFrame, SparkSession

_SOURCES: dict[str, Callable[..., DataFrame]] = {}
_OPERATORS: dict[str, Callable[..., DataFrame]] = {}
_PARSERS: dict[str, Callable] = {}
_PRINTERS: dict[str, Callable] = {}


def _check_name(name: str) -> None:
    if not name or not name.replace("-", "_").replace("_", "a").isalnum():
        raise ValueError(f"invalid plugin name {name!r}")


def _no_shadow(name: str, taken: Iterable[str], kind: str) -> None:
    if name in taken:
        raise ValueError(
            f"{kind} {name!r} is a builtin; plugins may not shadow it")


# --------------------------------------------------------------- sources

def register_source(name: str, fn: Callable[..., DataFrame]) -> None:
    """``fn(spark, *args) -> DataFrame``; usable in first position."""
    _check_name(name)
    from tenzir_spark.plans.tql import SINK_OPS
    builtins = {"from", "load", "export", "show", "shell", "version",
                "velociraptor"} | set(SINK_OPS)
    _no_shadow(name, builtins, "source")
    _SOURCES[name] = fn


def get_source(name: str):
    return _SOURCES.get(name)


# ------------------------------------------------------------- operators

def register_operator(name: str, fn: Callable[..., DataFrame]) -> None:
    """``fn(df, *args) -> DataFrame``; usable mid-pipeline."""
    _check_name(name)
    from tenzir_spark.plans.registry import OPERATORS
    builtins = {o.split(" ", 1)[0].split("/")[0] for o in OPERATORS}
    _no_shadow(name, builtins, "operator")
    _OPERATORS[name] = fn


def get_operator(name: str):
    return _OPERATORS.get(name)


# ---------------------------------------------------------- aggregations

def register_aggregation(name: str, fn: Callable[[Column], Column]) -> None:
    """``fn(Column) -> Column`` building a native Spark aggregate; the
    result is usable in ``summarize out=<name>(field) by …`` and keeps
    partial (map-side) aggregation because it IS a Spark aggregate."""
    _check_name(name)
    from tenzir_spark.operators.aggregate import AGGREGATION_FUNCTIONS
    if name in AGGREGATION_FUNCTIONS and name not in _REGISTERED_AGGS:
        raise ValueError(
            f"aggregation {name!r} is a builtin; plugins may not shadow it")
    AGGREGATION_FUNCTIONS[name] = fn
    _REGISTERED_AGGS.add(name)


_REGISTERED_AGGS: set[str] = set()


# --------------------------------------------------------------- parsers

def register_parser(name: str, fn: Callable,
                    extensions: Iterable[str] = ()) -> None:
    """``fn(spark, path, opts: list[str]) -> DataFrame`` for
    ``read <name>``; ``extensions`` (e.g. ``[".kv"]``) additionally wire
    ``from <path>`` format inference."""
    _check_name(name)
    from tenzir_spark.plans.tql import _EXT_FORMAT, _READERS
    _no_shadow(name, _READERS, "parser")
    _PARSERS[name] = fn
    for ext in extensions:
        if not ext.startswith("."):
            raise ValueError(f"extension {ext!r} must start with '.'")
        if ext in _EXT_FORMAT and _EXT_FORMAT[ext] != name:
            raise ValueError(f"extension {ext!r} already maps to "
                             f"{_EXT_FORMAT[ext]!r}")
        _EXT_FORMAT[ext] = name


def get_parser(name: str):
    return _PARSERS.get(name)


# -------------------------------------------------------------- printers

def register_printer(name: str, fn: Callable) -> None:
    """``fn(df, path, opts: list[str]) -> None`` for
    ``write <name> | save <path>`` (and ``to <path>`` via a registered
    parser extension)."""
    _check_name(name)
    builtins = {"parquet", "json", "csv", "tsv", "ssv", "ascii", "yaml",
                "zeek-tsv", "pcap", "stdout", "discard", "import", "serve",
                "zmq", "kafka", "fluent-bit", "feather"}
    _no_shadow(name, builtins, "printer")
    _PRINTERS[name] = fn


def get_printer(name: str):
    return _PRINTERS.get(name)


# ------------------------------------------------------------ inventory

def plugins() -> dict[str, list[str]]:
    """Registered names per kind — the `show plugins` aspect."""
    return {"sources": sorted(_SOURCES), "operators": sorted(_OPERATORS),
            "aggregations": sorted(_REGISTERED_AGGS),
            "parsers": sorted(_PARSERS), "printers": sorted(_PRINTERS)}


def unregister(kind: str, name: str) -> None:
    """Remove a registration (test hygiene; the reference unloads
    plugins only at shutdown)."""
    if kind == "source":
        _SOURCES.pop(name, None)
    elif kind == "operator":
        _OPERATORS.pop(name, None)
    elif kind == "aggregation":
        if name in _REGISTERED_AGGS:
            from tenzir_spark.operators.aggregate import AGGREGATION_FUNCTIONS
            AGGREGATION_FUNCTIONS.pop(name, None)
            _REGISTERED_AGGS.discard(name)
    elif kind == "parser":
        if name in _PARSERS:
            from tenzir_spark.plans.tql import _EXT_FORMAT, _READERS  # noqa: F401
            del _PARSERS[name]
            for ext in [e for e, f in _EXT_FORMAT.items() if f == name]:
                del _EXT_FORMAT[ext]
    elif kind == "printer":
        _PRINTERS.pop(name, None)
    else:
        raise ValueError(f"unknown plugin kind {kind!r}")
