"""tenzir_spark — a PySpark-native streaming-dataflow / CDC-ingest engine.

Re-implements the capabilities of the reference engine (rdettaies/tenzir
v4.3.0, a C++ Arrow-batch security-pipeline engine) as an idiomatic
PySpark library:

- typed operator pipeline (where / select / summarize / sort / ... ) over
  DataFrames (reference: libtenzir/builtins/operators/*.cpp),
- a TQL-flavored expression compiler with suffix / type extractor binding
  (reference: libtenzir/include/tenzir/expression.hpp),
- an exactly-once CDC apply pipeline (binlog tail -> dedup -> MERGE into a
  lakehouse table) per the north rule, built on a from-scratch
  snapshot-based parquet table format (``tenzir_spark.lake``),
- large-scale training-data operators: dedup (exact / MinHash-LSH /
  SimHash / n-gram Jaccard), similarity search, text analysis.

Everything is declarative DataFrame/SQL so Catalyst handles pushdown,
pruning, join strategy, and AQE; Python never touches the per-row hot path
except through Arrow-vectorized pandas UDFs.
"""

from tenzir_spark.session import get_spark
from tenzir_spark.plans.pipeline import Pipeline
from tenzir_spark.plans.tql import exec_pipeline, parse_pipeline

__version__ = "0.1.0"
__all__ = ["get_spark", "Pipeline", "parse_pipeline", "exec_pipeline", "__version__"]
