"""Task mode `all`: snapshot load then catch-up streaming from the
snapshot watermark (full_mode + incremental_mode + all-mode suites)."""

from __future__ import annotations

from pyspark.sql import functions as F

from dm_spark import feed as feedmod
from dm_spark.config import RouteRule, TaskConfig
from dm_spark.lake import LakeTable
from dm_spark.sources.relay import write_feed_chunks
from dm_spark.task import Task, replication_lag_sec

from tests.test_pipeline_e2e import KEY, SCHEMA, assert_tables_equal, duck_replay, spark_final


def test_mode_all_snapshot_then_catchup(spark, sf_dir, tmp_path):
    feed = feedmod.change_feed(spark, sf_dir)
    mm = feed.agg(F.min("txn_id"), F.max("txn_id")).collect()[0]
    mid = (mm[0] + mm[1]) // 2

    # the "already migrated" snapshot = replay of the feed prefix
    from dm_spark.operators import ApplyPipeline

    cfg = TaskConfig(routes=[RouteRule(pattern="shard_*.transcripts_*", target="transcripts")])
    pre = LakeTable.create(spark, str(tmp_path / "pre"), SCHEMA, KEY, n_buckets=8)
    pre.merge_into(
        ApplyPipeline(cfg).transform(feed.where(F.col("txn_id") <= mid)).drop("target_table")
    )
    snapshot = pre.read()
    snap_loc_row = (
        feed.where(F.col("txn_id") <= mid)
        .agg(F.max(F.struct("file_seq", "pos")).alias("l"))
        .collect()[0]["l"]
    )
    snap_loc = (snap_loc_row["file_seq"], snap_loc_row["pos"])

    # the relay contains the WHOLE feed (prefix would be duplicate
    # delivery); mode `all` must start streaming after the watermark
    lake = LakeTable.create(spark, str(tmp_path / "lake"), SCHEMA, KEY, n_buckets=8)
    task = Task(
        spark, cfg, lake,
        feed_dir=str(tmp_path / "feed"), checkpoint_dir=str(tmp_path / "cp"),
    )
    write_feed_chunks(feed, task.feed_dir, n_chunks=4)
    task.run_all(snapshot, snap_loc)

    assert_tables_equal(spark_final(lake), duck_replay(sf_dir))
    lag = replication_lag_sec(lake)
    assert lag is not None and lag > 0  # feed ts are in the past


def test_ctl_commands_compose(tmp_path):
    """`main.py ctl` (dmctl analog) read-modify-writes control.json so
    patch-while-paused survives a resume; stop composes onto anything."""
    import json
    import sys

    sys.path.insert(0, str(__import__("pathlib").Path(__file__).parent.parent))
    import main as mainmod

    cp = str(tmp_path / "cp")
    assert mainmod.ctl([cp, "pause"]) == 0
    assert mainmod.ctl([cp, "patch", '{"deny_tables": ["db.*"]}']) == 0
    assert mainmod.ctl([cp, "resume"]) == 0
    body = json.load(open(f"{cp}/control.json"))
    assert body == {"config_patch": {"deny_tables": ["db.*"]}}
    assert mainmod.ctl([cp, "stop"]) == 0
    assert json.load(open(f"{cp}/control.json"))["stop"] is True
    # resume clears a previous stop too (a sticky stop would make every
    # task relaunch exit immediately with zero batches)
    assert mainmod.ctl([cp, "resume"]) == 0
    assert "stop" not in json.load(open(f"{cp}/control.json"))
    # malformed patch invocations get usage / a clear error, not a traceback
    assert mainmod.ctl([cp, "patch"]) == 2
