"""Streaming suites: relay-file replay, kill/resume from checkpoint,
duplicate-window redelivery — the FlushCheckpointStage / safe_mode /
duplicate_event integration-suite analogs (reference tests/ dir)."""

from __future__ import annotations

from pyspark.sql import functions as F

from dm_spark import feed as feedmod
from dm_spark.config import RouteRule, TaskConfig
from dm_spark.lake import LakeTable
from dm_spark.operators import ApplyPipeline
from dm_spark.sources.relay import write_feed_chunks
from dm_spark.streaming import CdcStreamDriver

from tests.test_pipeline_e2e import KEY, SCHEMA, assert_tables_equal, duck_replay, spark_final


def make_driver(spark, tmp_path, name="s"):
    cfg = TaskConfig(routes=[RouteRule(pattern="shard_*.transcripts_*", target="transcripts")])
    lake = LakeTable.create(spark, str(tmp_path / f"lake_{name}"), SCHEMA, KEY, n_buckets=8)
    drv = CdcStreamDriver(
        spark,
        feed_dir=str(tmp_path / f"feed_{name}"),
        checkpoint_dir=str(tmp_path / f"cp_{name}"),
        pipeline=ApplyPipeline(cfg),
        lakes={"transcripts": lake},
        max_files_per_trigger=2,
    )
    return drv, lake


def test_stream_full_replay(spark, sf_dir, tmp_path):
    drv, lake = make_driver(spark, tmp_path)
    feed = feedmod.change_feed(spark, sf_dir)
    files = write_feed_chunks(feed, drv.feed_dir, n_chunks=6)
    assert len(files) == 6
    stats = drv.run_available_now()
    assert len([s for s in stats if not s["skipped"]]) >= 3  # several micro-batches
    assert_tables_equal(spark_final(lake), duck_replay(sf_dir))


def test_kill_and_resume_from_checkpoint(spark, sf_dir, tmp_path):
    drv, lake = make_driver(spark, tmp_path)
    feed = feedmod.change_feed(spark, sf_dir)
    # phase 1: only half of the relay files exist; stream drains and "dies"
    bounds = [r[0] for r in feed.select("txn_id").distinct().orderBy("txn_id").collect()]
    mid = bounds[len(bounds) // 2]
    write_feed_chunks(feed.where(F.col("txn_id") <= mid), drv.feed_dir, n_chunks=3)
    drv.run_available_now()
    applied_half = lake.totals()["batches"]
    assert applied_half >= 1

    # phase 2: new driver process, same checkpoint dir; rest of the feed arrives
    write_feed_chunks(
        feed.where(F.col("txn_id") > mid), drv.feed_dir, n_chunks=3, start_index=100
    )
    drv2 = CdcStreamDriver(
        spark, drv.feed_dir, drv.checkpoint_dir, drv.pipeline, {"transcripts": lake},
        max_files_per_trigger=2,
    )
    drv2.run_available_now()
    assert_tables_equal(spark_final(lake), duck_replay(sf_dir))
    # batch ids continued monotonically — no batch applied twice
    seen = [s["batch_id"] for s in drv.batch_stats + drv2.batch_stats if not s["skipped"]]
    assert len(seen) == len(set(seen))


def test_fresh_checkpoint_redelivery_converges(spark, sf_dir, tmp_path):
    """Blow away the Spark checkpoint (relay truncation analog,
    pkg/streamer/reader.go:42-44): the whole feed is redelivered under a
    NEW stream id. LWW idempotence must converge to the same table."""
    drv, lake = make_driver(spark, tmp_path)
    feed = feedmod.change_feed(spark, sf_dir)
    write_feed_chunks(feed, drv.feed_dir, n_chunks=4)
    drv.run_available_now()
    once = spark_final(lake)

    drv2 = CdcStreamDriver(
        spark, drv.feed_dir, str(tmp_path / "cp_fresh"), drv.pipeline,
        {"transcripts": lake}, max_files_per_trigger=2,
    )
    drv2.run_available_now()
    again = spark_final(lake)
    assert_tables_equal(again, once)
    assert_tables_equal(again, duck_replay(sf_dir))


def test_purge_relay_deletes_only_fully_applied(spark, sf_dir, tmp_path):
    """purge-relay analog (relay/purger/purger.go): files whose footer
    stats say every event is at-or-before the applied checkpoint are
    deleted; any file with unapplied events survives, and no event
    above the purge point is lost. A checkpointed stream resume then
    drains the remainder to the full oracle state."""
    from dm_spark.sources.relay import purge_relay

    feed_dir = str(tmp_path / "feed")
    feed = feedmod.change_feed(spark, sf_dir)
    write_feed_chunks(feed, feed_dir, n_chunks=5)

    # mid-stream purge point: keep everything above (0, 499)
    removed = purge_relay(feed_dir, (0, 499))
    assert removed >= 1
    rest = spark.read.parquet(feed_dir)
    above = feed.where("file_seq > 0 OR pos > 499")
    assert rest.where("file_seq > 0 OR pos > 499").count() == above.count()

    # purge at the final location empties the relay dir
    mx = feed.selectExpr("max(struct(file_seq, pos)) AS m").collect()[0][0]
    purge_relay(feed_dir, (mx["file_seq"], mx["pos"]))
    import glob as _glob
    import os as _os

    assert _glob.glob(_os.path.join(feed_dir, "relay-*.parquet")) == []
