from tenzir_spark.lake.table import LakeTable
from tenzir_spark.lake.format import Snapshot, DataFile, CommitConflict

__all__ = ["LakeTable", "Snapshot", "DataFile", "CommitConflict"]
