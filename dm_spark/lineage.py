"""Applied-transaction interval tracking — the GTID-set analog.

The reference prefers GTID sets over file:pos because a GTID set
answers two questions file:pos cannot (pkg/gtid/gtid.go; the `gtid`
and `adjust_gtid` integration suites):

(a) resume identity across an upstream re-master, and
(b) COMPLETENESS — "is every transaction at-or-below the high water
    actually applied, or is there a hole?"

This rebuild closes (a) with the checkpoint epoch ordinal
(lake/table.py `_advance_checkpoint`); this module closes (b). The
relay feed's `txn_id` is dense (the XID-ordered transaction counter,
feed.py), so the applied set is an INTERVAL SET over txn_id — exactly
the shape of a GTID set's per-server interval list
(`uuid:1-100:200-300`). Each micro-batch folds its own intervals with
two anti-joins (no global sort), the driver merges them into a bounded
list and persists it beside the checkpoint. Because interval union is
a pure semilattice, redelivered batches are absorbed idempotently and
arrival order never matters; a hole — a relay chunk lost or a batch
skipped past — shows up as a gap below the high water and is reported
by :func:`interval_gaps` / `main.py ctl status`.

The set tracks DELIVERED transactions, matching MySQL GTID semantics
where a deliberately skipped transaction still enters the executed set
(DM injects an empty txn for it, syncer/handle_error.go): the driver
folds the raw micro-batch, so rows later dropped by block/allow
filters, routes, or a `ctl binlog skip` error-op are still counted as
handled. That is the correct completeness question — "did every txn
REACH the applier" — not "did every txn mutate the table", which
filters legitimately make false.

Scale shape: the per-batch fold is `distinct` on txn_id (map-side
combinable) plus two self-equi-joins on (txn±1) — fully parallel, no
single-partition window. Only the interval ENDPOINTS are collected,
hard-capped: a healthy stream folds to ~1 interval, and a pathological
fragmentation (cap exceeded) fails loudly with the remedy instead of
ballooning driver memory.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# a healthy stream carries O(1) intervals; thousands of fragments mean
# the feed is arriving wildly out of order or txn ids are not dense —
# either way the operator must know, not the driver silently OOM
MAX_FRAGMENTS = 10_000


def batch_txn_intervals(
    df: DataFrame, txn_col: str = "txn_id", cap: int = MAX_FRAGMENTS
) -> list[list[int]]:
    """The batch's applied-txn intervals as a sorted list of closed
    [lo, hi] pairs (gaps-and-islands over the distinct txn ids).

    Distributed shape: `t` is an island START iff t-1 is absent from
    the set (anti-join against the set shifted +1) and an island END
    iff t+1 is absent (anti-join against the set shifted -1) — two
    bucketed equi-joins, no global window, so the fold never funnels
    the batch through one partition. Both anti-joins ride ONE Spark
    job (side-tagged union, single collect) over a persisted distinct
    set, so the micro-batch is scanned once, not four times. Only the
    endpoints come back to the driver, capped at `cap` islands."""
    d = (
        df.select(F.col(txn_col).cast("long").alias("t"))
        .where(F.col("t").isNotNull())
        .distinct()
        .persist()
    )
    try:
        starts_df = d.join(
            d.select((F.col("t") + 1).alias("t")), "t", "left_anti"
        ).select(F.lit("s").alias("k"), "t")
        ends_df = d.join(
            d.select((F.col("t") - 1).alias("t")), "t", "left_anti"
        ).select(F.lit("e").alias("k"), "t")
        rows = starts_df.unionAll(ends_df).limit(2 * cap + 2).collect()
    finally:
        d.unpersist()
    starts = sorted(r["t"] for r in rows if r["k"] == "s")
    ends = sorted(r["t"] for r in rows if r["k"] == "e")
    if len(starts) > cap or len(ends) > cap:
        raise RuntimeError(
            f"batch folds to more than {cap} applied-txn intervals — the "
            "feed's txn ids are not arriving dense (wild reordering, or "
            "txn_id is not a dense counter); raise the cap only if driver "
            "memory allows, otherwise fix the feed's txn ordering"
        )
    assert len(starts) == len(ends), "island starts/ends must pair up"
    return [[s, e] for s, e in zip(starts, ends)]


def merge_intervals(
    a: list[list[int]], b: list[list[int]], cap: int = MAX_FRAGMENTS
) -> list[list[int]]:
    """Union two sorted closed-interval lists, coalescing overlapping
    AND adjacent ([1,5] + [6,9] = [1,9]) intervals — the semilattice
    fold: commutative, associative, idempotent, so any batch arrival
    order and any redelivery converge to the same set."""
    merged: list[list[int]] = []
    for lo, hi in sorted([*a, *b]):
        if merged and lo <= merged[-1][1] + 1:
            if hi > merged[-1][1]:
                merged[-1][1] = hi
        else:
            merged.append([lo, hi])
    if len(merged) > cap:
        raise RuntimeError(
            f"applied-txn interval set exceeds {cap} fragments — see "
            "batch_txn_intervals for the diagnosis"
        )
    return merged


def interval_gaps(intervals: list[list[int]]) -> list[list[int]]:
    """The holes strictly inside the covered span: transactions below
    the high water that were never DELIVERED to the applier. A healthy
    exactly-once stream has NONE — any entry here is a lost relay chunk
    or a batch skipped past (deliberately filtered/skip-op'd txns do
    NOT appear here; they were delivered, see module docstring), and
    `ctl status` surfaces it."""
    return [
        [intervals[i][1] + 1, intervals[i + 1][0] - 1]
        for i in range(len(intervals) - 1)
    ]


def covered_count(intervals: list[list[int]]) -> int:
    """Total transactions covered — the scalar a lag/completeness
    gauge plots."""
    return sum(hi - lo + 1 for lo, hi in intervals)
