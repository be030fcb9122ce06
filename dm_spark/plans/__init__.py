from dm_spark.plans.replay import DdlEvent, ReplayRunner

__all__ = ["DdlEvent", "ReplayRunner"]
