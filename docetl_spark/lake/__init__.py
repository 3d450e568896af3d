from docetl_spark.lake.table import LakeTable, CommitConflict

__all__ = ["LakeTable", "CommitConflict"]
