from dm_spark.streaming.driver import CdcStreamDriver

__all__ = ["CdcStreamDriver"]
