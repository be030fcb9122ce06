"""Precheck unit tests (checker/checker.go:105-240 analog) — the
reference treats precheck as a unit with its own suite."""

from __future__ import annotations

from dm_spark import feed as feedmod
from dm_spark.checker import precheck_feed, precheck_target


def test_precheck_feed_ok(spark, sf_dir):
    r = precheck_feed(feedmod.change_feed(spark, sf_dir), ["conv_id", "turn_idx"])
    assert r["ok"] and r["locations_unique"] and r["events"] > 0
    assert r["bad_op_rows"] == 0 and r["null_key_rows"] == 0


def test_precheck_feed_catches_violations(spark):
    env = spark.createDataFrame(
        [
            ("I", None, ("c", 1, "u", "t", None, None), "s.t", 0, 1, None, 0),
            ("X", None, ("c", 2, "u", "t", None, None), "s.t", 0, 1, None, 0),  # bad op + dup loc
            ("I", None, (None, 3, "u", "t", None, None), "s.t", 0, 2, None, 0),  # null key
        ],
        feedmod.ENVELOPE_DDL,
    )
    r = precheck_feed(env, ["conv_id", "turn_idx"])
    assert not r["ok"]
    assert not r["locations_unique"]
    assert r["bad_op_rows"] == 1 and r["null_key_rows"] == 1


def test_precheck_target(spark):
    good = spark.createDataFrame([("a", 1), ("a", 2)], "conv_id string, turn_idx int")
    assert precheck_target(good, ["conv_id", "turn_idx"])["ok"]
    dup = spark.createDataFrame([("a", 1), ("a", 1)], "conv_id string, turn_idx int")
    r = precheck_target(dup, ["conv_id", "turn_idx"])
    assert not r["ok"] and not r["key_unique"]
    nullk = spark.createDataFrame([("a", None)], "conv_id string, turn_idx int")
    assert precheck_target(nullk, ["conv_id", "turn_idx"])["null_key_rows"] == 1


def test_precheck_identity_ladder(spark):
    from dm_spark.checker import precheck_identity

    ddl = (
        "op string, before struct<k int, u string, v string>, "
        "after struct<k int, u string, v string>"
    )
    feed = spark.createDataFrame(
        [
            ("I", None, (1, "a", "x")),       # pk rung
            ("I", None, (None, "b", "x")),    # uk rung
            ("D", (None, None, "x"), None),   # full-row fallback
        ],
        ddl,
    )
    r = precheck_identity(feed, ["k"], [["u"]])
    assert r["events"] == 3 and r["pk_rows"] == 1
    assert r["uk_rows"] == {"uk0": 1}
    assert r["full_row_rows"] == 1 and not r["ok"]
    ok = precheck_identity(feed.where("op = 'I'"), ["k"], [["u"]])
    assert ok["ok"] and ok["full_row_rows"] == 0


def test_precheck_counts_null_op_as_bad(spark):
    """Review fix: `~op.isin(...)` is NULL for a NULL op and F.sum
    skips NULLs — a decode bug emitting op=NULL sailed through the
    precheck gate with ok=True."""
    from pyspark.sql import functions as F

    from tests.test_replay_runner import ev

    feed = ev(spark, [("I", "a", 1, "v1", "shard_0.t", 0, 1)]).unionByName(
        ev(spark, [("I", "b", 1, "v1", "shard_0.t", 0, 2)]).withColumn(
            "op", F.lit(None).cast("string")
        )
    )
    r = precheck_feed(feed, ["conv_id", "turn_idx"])
    assert r["bad_op_rows"] == 1 and not r["ok"]
