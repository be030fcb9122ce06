"""Applied-txn interval tracking (the GTID-set analog,
dm_spark/lineage.py): island folding, the semilattice union laws, and
the driver's opt-in per-batch fold with gap detection — the
completeness question a GTID set answers that file:pos cannot
(pkg/gtid/gtid.go; reference `gtid` integration suite)."""

from __future__ import annotations

import json
import os

from pyspark.sql import functions as F

from dm_spark import feed as feedmod
from dm_spark.lineage import (
    batch_txn_intervals,
    covered_count,
    interval_gaps,
    merge_intervals,
)
from dm_spark.sources.relay import write_feed_chunks

from tests.test_streaming_resume import make_driver


def test_batch_txn_intervals_islands(spark):
    df = spark.createDataFrame(
        [(t,) for t in [1, 2, 3, 7, 9, 10, 10, 2]], "txn_id long"
    )
    assert batch_txn_intervals(df) == [[1, 3], [7, 7], [9, 10]]


def test_batch_txn_intervals_empty_and_single(spark):
    assert batch_txn_intervals(spark.createDataFrame([], "txn_id long")) == []
    assert batch_txn_intervals(
        spark.createDataFrame([(5,)], "txn_id long")
    ) == [[5, 5]]


def test_merge_intervals_semilattice_laws():
    a = [[1, 5], [10, 12]]
    b = [[6, 9], [20, 20]]
    # adjacency coalesces: [1,5]+[6,9]+[10,12] = [1,12]
    u = merge_intervals(a, b)
    assert u == [[1, 12], [20, 20]]
    # commutative + idempotent (the redelivery law)
    assert merge_intervals(b, a) == u
    assert merge_intervals(u, a) == u
    assert merge_intervals(u, u) == u
    # associative across a third operand
    c = [[13, 19]]
    assert merge_intervals(merge_intervals(a, b), c) == merge_intervals(
        a, merge_intervals(b, c)
    ) == [[1, 20]]
    assert interval_gaps(u) == [[13, 19]]
    assert covered_count(u) == 13


def test_driver_folds_txn_intervals_contiguous_and_idempotent(
    spark, sf_dir, tmp_path
):
    """A healthy end-to-end drain folds to ONE contiguous interval
    spanning the feed's whole txn range (no gaps = completeness
    proven), persists it beside the checkpoint, and a restarted driver
    with nothing new to read leaves the set bit-identical."""
    drv, lake = make_driver(spark, tmp_path)
    drv.track_txn_intervals = True
    feed = feedmod.change_feed(spark, sf_dir)
    write_feed_chunks(feed, drv.feed_dir, n_chunks=4)
    drv.run_available_now()
    mm = feed.agg(F.min("txn_id"), F.max("txn_id")).collect()[0]
    assert drv.txn_intervals == [[mm[0], mm[1]]]
    assert interval_gaps(drv.txn_intervals) == []
    with open(os.path.join(drv.checkpoint_dir, "txn_intervals.json")) as f:
        assert json.load(f)["intervals"] == [[mm[0], mm[1]]]
    # restart: state restores, and an empty drain changes nothing
    from dm_spark.streaming import CdcStreamDriver

    drv2 = CdcStreamDriver(
        spark, drv.feed_dir, drv.checkpoint_dir, drv.pipeline,
        {"transcripts": lake}, max_files_per_trigger=2,
        track_txn_intervals=True,
    )
    assert drv2.txn_intervals == [[mm[0], mm[1]]]
    drv2.run_available_now()
    assert drv2.txn_intervals == [[mm[0], mm[1]]]


def test_driver_reports_gap_when_a_txn_range_never_arrives(
    spark, sf_dir, tmp_path
):
    """A relay hole (a whole txn range missing from the feed dir) is
    exactly what the GTID-set surface exists to catch: the fold leaves
    a gap below the high water and `ctl status` surfaces it."""
    drv, lake = make_driver(spark, tmp_path, name="gap")
    drv.track_txn_intervals = True
    feed = feedmod.change_feed(spark, sf_dir)
    ids = sorted(
        r[0] for r in feed.select("txn_id").distinct().collect()
    )
    lo_cut, hi_cut = ids[len(ids) // 3], ids[2 * len(ids) // 3]
    holed = feed.where(
        (F.col("txn_id") < lo_cut) | (F.col("txn_id") > hi_cut)
    )
    write_feed_chunks(holed, drv.feed_dir, n_chunks=4)
    drv.run_available_now()
    assert drv.txn_intervals == [[ids[0], lo_cut - 1], [hi_cut + 1, ids[-1]]]
    assert interval_gaps(drv.txn_intervals) == [[lo_cut, hi_cut]]
    # the query-status surface reports the hole
    from main import _task_status

    st = _task_status(drv.checkpoint_dir, {}, [])
    assert st["applied_txns"]["gaps"] == [[lo_cut, hi_cut]]
    assert st["applied_txns"]["n_intervals"] == 2
