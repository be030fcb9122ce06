"""Streaming into a merge-on-read lake with periodic auto-compaction."""

from __future__ import annotations

from dm_spark import feed as feedmod
from dm_spark.config import RouteRule, TaskConfig
from dm_spark.lake import LakeTable
from dm_spark.operators import ApplyPipeline
from dm_spark.sources.relay import write_feed_chunks
from dm_spark.streaming import CdcStreamDriver

from tests.test_pipeline_e2e import KEY, SCHEMA, assert_tables_equal, duck_replay, spark_final


def test_stream_mor_with_auto_compaction(spark, sf_dir, tmp_path):
    cfg = TaskConfig(routes=[RouteRule(pattern="shard_*.transcripts_*", target="transcripts")])
    lake = LakeTable.create(
        spark, str(tmp_path / "lake"), SCHEMA, KEY, n_buckets=8, write_mode="mor"
    )
    drv = CdcStreamDriver(
        spark,
        feed_dir=str(tmp_path / "feed"),
        checkpoint_dir=str(tmp_path / "cp"),
        pipeline=ApplyPipeline(cfg),
        lakes={"transcripts": lake},
        max_files_per_trigger=1,
        compact_every=2,
    )
    write_feed_chunks(feedmod.change_feed(spark, sf_dir), drv.feed_dir, n_chunks=6)
    drv.run_available_now()
    assert_tables_equal(spark_final(lake), duck_replay(sf_dir))
    # compaction ran at least twice (6 batches / every 2)
    compactions = [l for l in lake.lineage_log() if "compacted_buckets" in l]
    assert len(compactions) >= 2
