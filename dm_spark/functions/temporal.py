"""Temporal join operators Spark's DataFrame API lacks: as-of join and
bounded range join — requested pipeline primitives (feature lookup "as
of" an event; events-within-a-window joins) that naive Spark SQL turns
into BroadcastNestedLoop/cartesian plans.

No reference counterpart (pingcap/dm replicates rows, it never joins
streams); these extend the engine for training-data assembly the same
way the dedup/ANN family does. Both are implemented as compositions of
built-in operators with bounded equi-join keys:

- `asof_join`: the union-and-window trick — tag both sides, sort each
  key's merged timeline once, carry the latest right payload forward
  with `last(ignorenulls)`. ONE shuffle on the key, no join at all,
  and the per-key cost is a linear scan. This is the standard
  scale-out as-of (point-in-time lookup) shape; a join-based as-of is
  quadratic per key under skew.
- `range_count_join`: time-bucketed equi-join — each left row probes
  exactly ceil(window/bucket)+1 buckets of the right side, the
  bucket+key equi-join bounds candidate fan-out, and the exact range
  predicate refines. No cross join at any scale; skew is bounded by
  (key, bucket) granularity.

Determinism: all timestamps are int64 epoch-micros and tiebreaks are
explicit columns, so results are exact across engines (the DuckDB
oracle uses its native ASOF JOIN / range join as an INDEPENDENT
implementation).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    left_ts: str = "ts_us",
    right_ts: str = "ts_us",
    right_payload: list[str] | None = None,
    tiebreak: str | None = None,
    suffix: str = "_r",
) -> DataFrame:
    """For every left row, attach the LATEST right row with
    right_ts <= left_ts within the same `on` key (point-in-time /
    as-of join; left rows with no prior right row get nulls).

    At equal timestamps the right row counts (<=, not <), and among
    right rows sharing a timestamp the one with the greatest NUMERIC
    `tiebreak` column wins (NULL tiebreaks lose) — an explicit total
    order, so the result is deterministic under ties (pinned in
    tests) instead of depending on physical row order. When no
    tiebreak is given, a content hash of the payload breaks ties:
    still deterministic, but arbitrary — pass an explicit column when
    the choice is meaningful.

    Returns all left columns plus each `right_payload` column renamed
    with `suffix` (right_ts included automatically).
    """
    right_payload = list(right_payload or [])
    if right_ts not in right_payload:
        right_payload = [right_ts, *right_payload]

    payload = F.struct(*[F.col(c) for c in right_payload])
    tb = F.col(tiebreak).cast("bigint") if tiebreak else F.xxhash64(payload)
    r = right.select(
        *on,
        F.col(right_ts).alias("__ts"),
        F.lit(0).alias("__side"),
        tb.alias("__tb"),
        payload.alias("__payload"),
    )
    l = left.select(  # noqa: E741
        "*",
        F.col(left_ts).alias("__ts"),
        F.lit(1).alias("__side"),
        F.lit(None).cast("bigint").alias("__tb"),
    ).withColumn("__payload", F.lit(None).cast(r.schema["__payload"].dataType))
    merged = l.unionByName(r, allowMissingColumns=True)

    w = (
        Window.partitionBy(*on)
        # nulls FIRST: a NULL tiebreak must LOSE to any real one (last()
        # takes the frame's final row, so the greatest sorts last)
        .orderBy(F.col("__ts"), F.col("__side"), F.col("__tb").asc_nulls_first())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    carried = merged.withColumn("__match", F.last("__payload", ignorenulls=True).over(w))
    out = carried.where(F.col("__side") == 1)
    for c in right_payload:
        out = out.withColumn(f"{c}{suffix}", F.col("__match").getField(c))
    return out.drop("__ts", "__side", "__tb", "__payload", "__match")


def range_count_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    window_us: int,
    left_ts: str = "ts_us",
    right_ts: str = "ts_us",
    count_col: str = "n_in_window",
) -> DataFrame:
    """For every left row, COUNT right rows with the same `on` key
    whose timestamp falls in (left_ts - window_us, left_ts] — the
    bounded-interval join (e.g. "clicks in the 10 minutes before each
    error"). Left rows with no right rows in range report 0.

    Bucketed equi-join: right rows land in bucket floor(ts/window),
    each left row probes its own and the previous bucket (any right
    row in range is in one of the two), the exact predicate refines.
    Candidate volume per left row is bounded by the key's density in
    2 buckets — never a cross join, and AQE's skew split applies to
    the (key, bucket) shuffle like any equi-join.
    """
    bkt = lambda c: F.floor(F.col(c) / F.lit(window_us))  # noqa: E731
    r = right.select(*on, F.col(right_ts).alias("__r_ts")).withColumn(
        "__bkt", bkt("__r_ts")
    )
    # probe DISTINCT (key, ts) pairs: the count is a function of the
    # pair, and probing per left ROW would pool duplicate rows in the
    # groupBy below and multiply their counts (review r5)
    probe = left.select(*on, left_ts).distinct().withColumn(
        "__bkt", F.explode(F.array(bkt(left_ts), bkt(left_ts) - 1))
    )
    hits = (
        probe.join(r, [*on, "__bkt"])
        .where(
            (F.col("__r_ts") > F.col(left_ts) - window_us)
            & (F.col("__r_ts") <= F.col(left_ts))
        )
        .groupBy(*on, left_ts)
        .agg(F.count(F.lit(1)).alias(count_col))
    )
    return (
        left.join(hits, [*on, left_ts], "left")
        .withColumn(count_col, F.coalesce(count_col, F.lit(0)).cast("bigint"))
    )
