"""Watermark + windowed-agg late-data semantics: a window is emitted
exactly once when the watermark passes its end; an event arriving
within the tolerance still counts; one arriving later is dropped and
the finalized window never changes."""

from __future__ import annotations

import datetime as dt

from dm_spark.feed import ENVELOPE_DDL
from dm_spark.sources.relay import write_feed_chunks
from dm_spark.streaming.windows import windowed_op_counts


def T(h, m=0):
    return dt.datetime(2024, 1, 1, h, m)


def ev_rows(rows):
    """rows: (op, conv, hour, minute, pos)"""
    out = []
    for op, conv, h, m, pos in rows:
        img = (conv, 1, "user", "t", None, T(h, m))
        out.append(
            (op, img if op != "I" else None, img if op != "D" else None,
             "s.t", 0, pos, T(h, m), 0)
        )
    return out


_EMITTED: list = []


def _run(spark, feed_dir, cp_dir):
    """Append-mode sink via foreachBatch (checkpoint-recoverable):
    accumulates finalized windows across restarts."""
    stream = (
        spark.readStream.schema(ENVELOPE_DDL)
        .option("maxFilesPerTrigger", "1")
        .parquet(feed_dir)
    )

    def sink(df, _bid):
        _EMITTED.extend(df.collect())

    q = (
        windowed_op_counts(stream, window="1 hour", watermark="30 minutes")
        .writeStream.foreachBatch(sink)
        .outputMode("append")
        .option("checkpointLocation", cp_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    if q.isActive:
        q.stop()
    return {(r.window_start_us, r.op): r.n for r in _EMITTED}


def test_watermark_finalizes_and_drops_late(spark, tmp_path):
    feed = str(tmp_path / "feed")
    cp = str(tmp_path / "cp")
    us = lambda h: int(dt.datetime(2024, 1, 1, h).timestamp() * 1_000_000)  # noqa: E731

    # chunk 1: three events in [10:00, 11:00); chunk 2 jumps event time
    # to 12:30 -> watermark 12:00 > 11:00, the 10:00 window finalizes
    write_feed_chunks(
        spark.createDataFrame(
            ev_rows([("I", "a", 10, 5, 1), ("I", "b", 10, 20, 2), ("U", "a", 10, 40, 3)]),
            ENVELOPE_DDL,
        ),
        feed, n_chunks=1, order_col="pos",
    )
    write_feed_chunks(
        spark.createDataFrame(ev_rows([("I", "c", 12, 30, 4)]), ENVELOPE_DDL),
        feed, n_chunks=1, order_col="pos", start_index=1,
    )
    got = _run(spark, feed, cp)
    assert got.get((us(10), "I")) == 2 and got.get((us(10), "U")) == 1
    assert (us(12), "I") not in got  # 12:00 window still open (not emitted)

    # chunk 3: a LATE event for the finalized 10:00 window (beyond the
    # 30-min tolerance) must be dropped — the window is never re-emitted
    write_feed_chunks(
        spark.createDataFrame(ev_rows([("I", "zz", 10, 50, 5)]), ENVELOPE_DDL),
        feed, n_chunks=1, order_col="pos", start_index=2,
    )
    got2 = _run(spark, feed, cp)
    assert got2.get((us(10), "I")) == 2  # unchanged: late event dropped
