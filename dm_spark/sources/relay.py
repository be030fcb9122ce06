"""Relay log: the durable ordered change-event store.

The reference's relay unit tails the upstream binlog and persists it as
local relay-log files with rotation + meta (relay/relay.go:173,
relay/meta.go:486); the syncer then replays from those files
(pkg/streamer/reader.go:218). In the rebuild the relay log IS the
feed directory: ordered parquet chunk files named so lexicographic
order == (file_seq, pos) order. Structured Streaming's file source
provides exactly-once file tracking (the streamer-controller analog,
syncer/streamer_controller.go:94-320); re-seek/redirect collapses to
restart-from-checkpoint.
"""

from __future__ import annotations

import glob
import os
import shutil
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dm_spark.feed import ENVELOPE_DDL


def write_feed_chunks(
    df: DataFrame,
    feed_dir: str,
    n_chunks: int = 8,
    order_col: str = "txn_id",
    start_index: int = 0,
) -> list[str]:
    """Write the envelope DataFrame as `n_chunks` ordered relay files.

    Chunking is by contiguous `order_col` ranges — default `txn_id`, so
    a transaction (XID boundary) never spans two relay files, the
    binlog-file rotation analog. Returns the written file paths. Files are atomically moved
    into `feed_dir` so a concurrently-running stream never sees a
    partial file (relay writer recovery, relay/relay.go:463-560).
    """
    os.makedirs(feed_dir, exist_ok=True)
    bounds = [r[0] for r in df.select(order_col).distinct().orderBy(order_col).collect()]
    if not bounds:
        return []
    step = max(1, (len(bounds) + n_chunks - 1) // n_chunks)
    written = []
    idx = start_index
    for i in range(0, len(bounds), step):
        lo, hi = bounds[i], bounds[min(i + step, len(bounds)) - 1]
        chunk = df.where((F.col(order_col) >= lo) & (F.col(order_col) <= hi))
        tmp = os.path.join(feed_dir, f".stage-{uuid.uuid4().hex}")
        chunk.coalesce(1).write.parquet(tmp)
        part = glob.glob(os.path.join(tmp, "part-*.parquet"))[0]
        dst = os.path.join(feed_dir, f"relay-{idx:06d}.parquet")
        shutil.move(part, dst)
        shutil.rmtree(tmp, ignore_errors=True)
        written.append(dst)
        idx += 1
    return written


def read_feed_stream(
    spark: SparkSession,
    feed_dir: str,
    max_files_per_trigger: int | None = 1,
) -> DataFrame:
    """Streaming DataFrame over the relay directory. `maxFilesPerTrigger`
    is the backpressure knob (the queue-size/flow-control analog,
    docs/RFCS/20190906_flow_control.md)."""
    r = spark.readStream.schema(ENVELOPE_DDL)
    if max_files_per_trigger:
        r = r.option("maxFilesPerTrigger", str(max_files_per_trigger))
    return r.parquet(feed_dir)
