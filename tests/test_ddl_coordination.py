"""Pessimistic shard-DDL barrier + pending spill + precheck tests —
the shardddl1-4 / sequence_sharding suite analogs."""

from __future__ import annotations

from pyspark.sql import functions as F

from dm_spark import feed as feedmod
from dm_spark.checker import precheck_feed, precheck_target
from dm_spark.streaming.ddl_coordinator import PendingSpill, ShardDdlBarrier, split_blocked

GROUPS = {"transcripts": ["shard_0.t", "shard_1.t", "shard_2.t"]}
ADD = {"action": "add_column", "column": "rating", "new_type": "int"}


def test_barrier_lifecycle():
    b = ShardDdlBarrier(groups={k: list(v) for k, v in GROUPS.items()})
    assert b.announce("shard_0.t", ADD) is False
    assert b.blocked_sources() == {"shard_0.t"}
    assert b.announce("shard_1.t", ADD) is False
    assert b.blocked_sources() == {"shard_0.t", "shard_1.t"}
    # un-grouped table never blocks
    assert b.announce("other.t", ADD) is True
    # last member arrives -> group in sync
    assert b.announce("shard_2.t", ADD) is True
    b.release("transcripts", ADD)
    assert b.blocked_sources() == set()
    # state survives checkpoint round-trip
    b.announce("shard_0.t", ADD)
    b2 = ShardDdlBarrier.from_json(GROUPS, b.to_json())
    assert b2.blocked_sources() == {"shard_0.t"}


def test_two_concurrent_ddls_block_independently():
    b = ShardDdlBarrier(groups={k: list(v) for k, v in GROUPS.items()})
    widen = {"action": "widen_type", "column": "turn_idx", "new_type": "bigint"}
    b.announce("shard_0.t", ADD)
    b.announce("shard_1.t", widen)
    assert b.blocked_sources() == {"shard_0.t", "shard_1.t"}


def test_split_blocked_and_spill(spark, tmp_path):
    df = spark.createDataFrame(
        [("shard_0.t", 1), ("shard_1.t", 2), ("shard_2.t", 3)], "source_table string, v int"
    )
    ok, deferred = split_blocked(df, {"shard_0.t"})
    assert {r.source_table for r in ok.collect()} == {"shard_1.t", "shard_2.t"}
    spill = PendingSpill(spark, str(tmp_path / "pending"))
    spill.spill(deferred)
    back, dirs = spill.drain()
    assert [r.source_table for r in back.collect()] == ["shard_0.t"]
    spill.clear_dirs(dirs)
    assert spill.drain() is None


def test_precheck_feed_and_target(spark, sf_dir):
    feed = feedmod.change_feed(spark, sf_dir)
    rep = precheck_feed(feed, ["conv_id", "turn_idx"])
    assert rep["ok"] and rep["events"] > 0

    # corrupt: duplicate location
    dup = feed.limit(1)
    rep2 = precheck_feed(feed.unionByName(dup), ["conv_id", "turn_idx"])
    assert not rep2["locations_unique"] and not rep2["ok"]

    tgt = spark.createDataFrame(
        [("a", 1, "x"), ("a", 2, "y")], "conv_id string, turn_idx int, text string"
    )
    assert precheck_target(tgt, ["conv_id", "turn_idx"])["ok"]
    bad = spark.createDataFrame(
        [("a", 1, "x"), ("a", 1, "y"), (None, 2, "z")],
        "conv_id string, turn_idx int, text string",
    )
    rep3 = precheck_target(bad, ["conv_id", "turn_idx"])
    assert not rep3["key_unique"] and rep3["null_key_rows"] == 1
