from dm_spark.streaming.driver import CdcStreamDriver
from dm_spark.streaming.windows import windowed_op_counts

__all__ = ["CdcStreamDriver", "windowed_op_counts"]
