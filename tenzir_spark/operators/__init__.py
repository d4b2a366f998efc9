"""Operator library — Tenzir operator semantics on DataFrames.

Each operator is a pure function DataFrame -> DataFrame (lazily evaluated,
so chains fuse under whole-stage codegen). Reference operator files cited
per function (libtenzir/builtins/operators/*.cpp).
"""

from tenzir_spark.operators.transform import (
    where,
    select,
    drop,
    put,
    extend,
    replace,
    rename,
    flatten,
    unflatten,
    enumerate_rows,
    hash_column,
    pass_,
    batch,
    repeat,
)
from tenzir_spark.operators.limit import head, tail, taste, unique, deduplicate
from tenzir_spark.operators.aggregate import summarize, sort, top, rare
from tenzir_spark.operators.measure import measure
from tenzir_spark.operators.cast import unify_streams, cast_to, unify_struct
from tenzir_spark.operators.packet import decapsulate

__all__ = [
    "where", "select", "drop", "put", "extend", "replace", "rename",
    "flatten", "unflatten", "enumerate_rows", "hash_column", "pass_",
    "batch", "repeat",
    "head", "tail", "taste", "unique", "deduplicate",
    "summarize", "sort", "top", "rare", "measure",
    "unify_streams", "cast_to", "unify_struct", "decapsulate",
]
