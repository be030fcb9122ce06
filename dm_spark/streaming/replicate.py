"""Lake-to-lake replication: tail one LakeTable's change feed into
another, continuously.

This is the downstream half of the CDC-out closure (`LakeTable.
changes_stream`): the upstream lake's `_changes/` dirs are a file
stream, each micro-batch LWW-merges into the destination with the same
exactly-once machinery as the primary ingest path (file-source offsets
+ `merge_into(batch_id, stream_id)` gating + LWW convergence on
redelivery). Chains compose — A -> B -> C each hop runs one of these —
so a 100-TB pipeline materializes derived tables off table deltas
instead of rescanning upstream state at every step.

No reference counterpart: pingcap/dm consumes CDC but never emits it;
this closes the loop on the lake side (the Delta CDF + downstream-job
shape)."""

from __future__ import annotations

import hashlib
import time

from pyspark.sql import SparkSession

from dm_spark.lake import LakeTable


def replicate_lake(
    spark: SparkSession,
    src: LakeTable,
    dst: LakeTable,
    checkpoint_dir: str,
    timeout_sec: int = 600,
    trigger_sec: float | None = None,
    stop_when=None,
    poll_sec: float = 0.25,
) -> list[dict]:
    """Replicate `src`'s change feed into `dst`.

    `trigger_sec=None` drains the current feed and stops
    (Trigger.AvailableNow — catch-up mode); a float tails continuously
    until `timeout_sec` or `stop_when(stats) -> bool`. Resume is free:
    the same checkpoint_dir picks up at the first unread change file,
    and a replayed batch is skipped by the destination's batch-id gate.
    Returns per-batch merge stats."""
    stream_id = hashlib.sha256(checkpoint_dir.encode()).hexdigest()[:16]
    stats: list[dict] = []

    def _apply(batch_df, batch_id: int) -> None:
        st = dst.merge_into(batch_df, batch_id=batch_id, stream_id=stream_id)
        stats.append(
            {
                "batch_id": batch_id,
                "skipped": st.skipped,
                "n_incoming": st.n_incoming,
                "rows_written": st.rows_written,
            }
        )

    w = (
        src.changes_stream()
        .writeStream.foreachBatch(_apply)
        .option("checkpointLocation", checkpoint_dir)
    )
    if trigger_sec is None:
        q = w.trigger(availableNow=True).start()
        q.awaitTermination(timeout_sec)
        if q.isActive:
            q.stop()
        return stats
    q = w.trigger(processingTime=f"{max(trigger_sec, 0.1)} seconds").start()
    t0 = time.time()
    try:
        while q.isActive and time.time() - t0 < timeout_sec:
            if stop_when is not None and stop_when(stats):
                break
            time.sleep(poll_sec)
    finally:
        q.stop()
        q.awaitTermination(60)
    return stats
