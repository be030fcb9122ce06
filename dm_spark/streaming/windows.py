"""Watermarked windowed aggregation over the change stream.

The reference has no event-time windowing at all (it forwards row
images); a training-data ingest pipeline needs it for rollups over the
live feed. This is the built-in Structured Streaming surface:
`withWatermark` bounds how late an event may arrive, tumbling windows
aggregate per event-time bucket, append mode emits a window exactly
once — when the watermark passes its end — and reclaims its state
(the late-data story at 10^10 events: state is O(open windows), not
O(stream)).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def windowed_op_counts(
    envelope_stream: DataFrame,
    window: str = "1 hour",
    watermark: str = "30 minutes",
) -> DataFrame:
    """Tumbling event-time counts per (window, op) with late-data
    tolerance `watermark`: an event later than the watermark is dropped
    (its window already finalized and emitted); within tolerance it
    still lands in its window. Output columns: window_start_us,
    window_end_us, op, n, n_convs."""
    # op='Q' in-band DDL rows are not change events — exclude them from
    # the op histogram (they'd otherwise surface as a phantom 'Q' group)
    ev = envelope_stream.where(~F.col("op").eqNullSafe(F.lit("Q"))).select(
        F.col("ts"),
        F.col("op"),
        F.coalesce(F.col("after.conv_id"), F.col("before.conv_id")).alias("conv_id"),
    )
    agg = (
        ev.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window), "op")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.approx_count_distinct("conv_id").alias("n_convs"),
        )
    )
    return agg.select(
        F.unix_micros(F.col("window.start")).alias("window_start_us"),
        F.unix_micros(F.col("window.end")).alias("window_end_us"),
        "op",
        "n",
        "n_convs",
    )
