"""sync_diff_inspector analog: table diff + XOR checksum."""

from __future__ import annotations

from dm_spark.validator import table_checksum, table_diff


def test_checksum_equal_and_order_insensitive(spark):
    a = spark.createDataFrame([("a", 1, "x"), ("b", 2, "y")], "k string, i int, v string")
    b = spark.createDataFrame([("b", 2, "y"), ("a", 1, "x")], "k string, i int, v string")
    ca, cb = table_checksum(a), table_checksum(b)
    assert ca == cb and ca["rows"] == 2

    c = spark.createDataFrame([("a", 1, "x"), ("b", 2, "DIFFERENT")], "k string, i int, v string")
    assert table_checksum(c)["xor"] != ca["xor"]


def test_diff_detects_missing_extra_mismatch(spark):
    left = spark.createDataFrame(
        [("a", 1, "x"), ("b", 2, "y"), ("c", 3, "z")], "k string, i int, v string"
    )
    right = spark.createDataFrame(
        [("a", 1, "x"), ("b", 2, "CHANGED"), ("d", 4, "w")], "k string, i int, v string"
    )
    d = table_diff(left, right, ["k", "i"])
    assert not d["equal"]
    assert d["missing_right"] == 1 and d["missing_left"] == 1 and d["mismatched"] == 1
    assert len(d["sample_bad_keys"]) == 3

    same = table_diff(left, left, ["k", "i"])
    assert same["equal"] and same["keys"] == 3


def test_diff_on_replayed_lake(spark, sf_dir, tmp_path):
    """Engine-level use: validate the lake against an independent replay
    (the post-migration check a reference user runs)."""
    from pyspark.sql import functions as F

    from dm_spark import feed as feedmod
    from dm_spark.config import RouteRule, TaskConfig
    from dm_spark.lake import LakeTable
    from dm_spark.operators import ApplyPipeline, lww_latest

    cfg = TaskConfig(routes=[RouteRule(pattern="shard_*.transcripts_*", target="transcripts")])
    feed = feedmod.change_feed(spark, sf_dir)
    lake = LakeTable.create(
        spark, str(tmp_path / "lake"),
        [("conv_id", "string"), ("turn_idx", "int"), ("role", "string"),
         ("text", "string"), ("tool", "string"), ("ts", "timestamp")],
        ["conv_id", "turn_idx"], n_buckets=8,
    )
    lake.merge_into(ApplyPipeline(cfg).transform(feed).drop("target_table"))

    flat = feed.selectExpr(
        "op",
        "coalesce(after.conv_id, before.conv_id) AS conv_id",
        "coalesce(after.turn_idx, before.turn_idx) AS turn_idx",
        "coalesce(after.role, before.role) AS role",
        "coalesce(after.text, before.text) AS text",
        "coalesce(after.tool, before.tool) AS tool",
        "ts", "file_seq", "pos",
    )
    # independent replay must mirror the key-move split law
    # (syncer/dml.go:90-152): D(old key) for updates that moved the key
    dhalf = feed.where(
        "op = 'U' AND NOT (before.conv_id <=> after.conv_id "
        "AND before.turn_idx <=> after.turn_idx)"
    ).selectExpr(
        "'D' AS op",
        "before.conv_id AS conv_id",
        "before.turn_idx AS turn_idx",
        "before.role AS role",
        "before.text AS text",
        "before.tool AS tool",
        "ts", "file_seq", "pos",
    )
    flat = flat.unionByName(dhalf)
    expected = lww_latest(flat, ["conv_id", "turn_idx"], ["ts", "file_seq", "pos"]).where(
        F.col("op") != "D"
    ).drop("op", "file_seq", "pos")
    d = table_diff(lake.read(), expected, ["conv_id", "turn_idx"])
    assert d["equal"], d


def test_table_diff_null_key_components_match(spark):
    """Review fix: identical tables whose key columns contain NULLs
    (the UK-identity feature produces them by design) must diff as
    EQUAL — the null-unsafe equi-join reported each null-key row as
    missing on BOTH sides."""
    from dm_spark.validator import table_diff

    ddl = "conv_id string, turn_idx int, v string"
    rows = [("a", 1, "x"), (None, 2, "y"), (None, None, "z")]
    l = spark.createDataFrame(rows, ddl)
    r = spark.createDataFrame(rows, ddl)
    d = table_diff(l, r, key=["conv_id", "turn_idx"])
    assert d["equal"] and d["missing_left"] == 0 and d["missing_right"] == 0
    # and a genuine difference on a null-key row is still caught
    r2 = spark.createDataFrame([("a", 1, "x"), (None, 2, "y"), (None, None, "DIFF")], ddl)
    d2 = table_diff(l, r2, key=["conv_id", "turn_idx"])
    assert not d2["equal"] and d2["mismatched"] == 1
