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


def lww_latest_salted(
    df: DataFrame, key: list[str], order: list[str], n_salts: int = 16
) -> DataFrame:
    """Two-phase LWW for pathologically hot keys (a single key with
    millions of change events in one batch — the salted-repartition
    path the north rule calls out; hash-distribute analog
    syncer/dml_worker.go:132 with per-key fan-out).

    Phase 1 reduces per (key, salt) — the hot key's rows split across
    `n_salts` partitions; phase 2 reduces the n_salts partial winners.
    Output == `lww_latest` (asserted by the shared oracle)."""
    cols = df.columns
    salt = F.pmod(F.xxhash64(*[F.col(c) for c in order]), F.lit(n_salts)).alias("__salt")
    winner = F.max_by(F.struct(*cols), F.struct(*[F.col(c) for c in order])).alias("__w")
    p1 = df.select(*cols, salt).groupBy(*key, "__salt").agg(winner).select("__w.*")
    p2 = p1.groupBy(*key).agg(winner).select("__w.*")
    return p2
