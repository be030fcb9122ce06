from dm_spark.lake.table import LakeTable, MergeStats

__all__ = ["LakeTable", "MergeStats"]
