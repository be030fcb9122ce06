"""applyInPandasWithState: running per-conversation rollups over the
change-event stream, state carried across micro-batches."""

from __future__ import annotations

from pyspark.sql import functions as F

from dm_spark import feed as feedmod
from dm_spark.sources.relay import read_feed_stream, write_feed_chunks
from dm_spark.streaming.stateful import conversation_state_stream


def test_conversation_state_accumulates_across_batches(spark, sf_dir, tmp_path):
    feed = feedmod.change_feed(spark, sf_dir)
    write_feed_chunks(feed, str(tmp_path / "feed"), n_chunks=4)

    stream = read_feed_stream(spark, str(tmp_path / "feed"), max_files_per_trigger=1)
    out = conversation_state_stream(stream)
    q = (
        out.writeStream.outputMode("update")
        .format("memory")
        .queryName("conv_state")
        .option("checkpointLocation", str(tmp_path / "cp"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    if q.isActive:
        q.stop()

    # latest state per conv (multiple updates emitted across batches)
    got = spark.sql(
        """
        SELECT conv_id, max(n_events) AS n_events, max(max_turn) AS max_turn
        FROM conv_state GROUP BY conv_id
        """
    )
    want = (
        feed.select(
            F.coalesce(F.col("after.conv_id"), F.col("before.conv_id")).alias("conv_id"),
            F.coalesce(F.col("after.turn_idx"), F.col("before.turn_idx")).alias("turn_idx"),
        )
        .groupBy("conv_id")
        .agg(F.count(F.lit(1)).alias("n_events"), F.max("turn_idx").alias("max_turn"))
    )
    g = {r.conv_id: (r.n_events, r.max_turn) for r in got.collect()}
    w = {r.conv_id: (r.n_events, r.max_turn) for r in want.collect()}
    assert g == w and len(g) > 0
