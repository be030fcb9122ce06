"""Last-write-wins dedup — the causality/conflict-detector replacement.

The reference serializes conflicting DMLs with a streaming union-find
over causality keys (syncer/causality.go:25-136) because it applies
jobs concurrently over 16 queues. A Spark micro-batch commits
atomically, so quiescent ordering collapses to: keep only the LATEST
image per key within the batch, ordered by (ts, file_seq, pos) — the
LWW rule with binlog-location tiebreak (SURVEY §2.3, north_star).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def lww_latest(
    df: DataFrame,
    key: list[str],
    order: list[str],
    extra_partition: list[str] | None = None,
) -> DataFrame:
    """One row per key: the max by `order` (desc). `extra_partition`
    lets a caller prepend a coarser co-partitioning column (e.g. the
    storage bucket) so the window reuses an existing shuffle."""
    parts = (extra_partition or []) + key
    w = Window.partitionBy(*parts).orderBy(*[F.col(c).desc() for c in order])
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") == 1)
        .drop("__rn")
    )
