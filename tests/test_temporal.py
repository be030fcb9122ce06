"""As-of join and bounded range join (functions/temporal) — edge-case
laws the tie-free synthetic events can't exercise: equal-timestamp
ties, explicit tiebreaks, window boundaries, empty matches. Oracle
parity (vs DuckDB native ASOF JOIN / naive range join) runs in
scripts/check_entry.py."""

from __future__ import annotations

from dm_spark.functions.temporal import asof_join, range_count_join


def _df(spark, rows, schema):
    return spark.createDataFrame(rows, schema)


def test_asof_basic_and_no_match(spark):
    left = _df(spark, [(1, 100, 1000), (1, 101, 50)], "user_id long, event_id long, ts_us long")
    right = _df(spark, [(1, 900, 999), (1, 901, 1000), (2, 902, 10)],
                "user_id long, event_id long, ts_us long")
    out = {
        r["event_id"]: r
        for r in asof_join(
            left, right, on=["user_id"], right_payload=["event_id"], tiebreak="event_id"
        ).collect()
    }
    # equal timestamp counts (<=): ts 1000 matches the right row AT 1000
    assert out[100]["event_id_r"] == 901 and out[100]["ts_us_r"] == 1000
    # no right row at or before ts 50 -> nulls, row still present
    assert out[101]["event_id_r"] is None and out[101]["ts_us_r"] is None


def test_asof_tiebreak_on_equal_right_ts(spark):
    # two right rows share (user, ts): the greatest tiebreak wins,
    # regardless of physical order
    left = _df(spark, [(1, 100, 500)], "user_id long, event_id long, ts_us long")
    right = _df(
        spark,
        [(1, 907, 400), (1, 903, 400), (1, 905, 400)],
        "user_id long, event_id long, ts_us long",
    ).repartition(3)
    (row,) = asof_join(
        left, right, on=["user_id"], right_payload=["event_id"], tiebreak="event_id"
    ).collect()
    assert row["event_id_r"] == 907


def test_asof_does_not_cross_keys(spark):
    left = _df(spark, [(1, 100, 1000)], "user_id long, event_id long, ts_us long")
    right = _df(spark, [(2, 900, 500)], "user_id long, event_id long, ts_us long")
    (row,) = asof_join(
        left, right, on=["user_id"], right_payload=["event_id"], tiebreak="event_id"
    ).collect()
    assert row["event_id_r"] is None


def test_range_count_window_boundaries(spark):
    # window (l - w, l]: exactly-at-lower-bound excluded, at-ts included
    left = _df(spark, [(1, 10, 1000)], "user_id long, event_id long, ts_us long")
    right = _df(
        spark,
        [(1, 900), (1, 901), (1, 1000), (1, 1001), (2, 950)],
        "user_id long, ts_us long",
    )
    (row,) = range_count_join(
        left, right, on=["user_id"], window_us=100, count_col="n"
    ).collect()
    # 901 and 1000 are in (900, 1000]; 900 (boundary), 1001 (future),
    # and user 2's 950 are not
    assert row["n"] == 2


def test_range_count_zero_and_bucket_straddle(spark):
    # right rows in the PREVIOUS bucket must still be found (probe
    # covers bucket and bucket-1), and no-match rows report 0
    left = _df(
        spark, [(1, 10, 205), (1, 11, 9000)], "user_id long, event_id long, ts_us long"
    )
    right = _df(spark, [(1, 199)], "user_id long, ts_us long")  # bucket 1 for w=100
    out = {
        r["event_id"]: r["n"]
        for r in range_count_join(
            left, right, on=["user_id"], window_us=100, count_col="n"
        ).collect()
    }
    # 199 in (105, 205] though bucket(205)=2 and bucket(199)=1
    assert out[10] == 1
    assert out[11] == 0


def test_range_join_duplicate_left_key_ts_not_pooled(spark):
    """Two left rows sharing (key, ts) each get the TRUE count — the
    probe runs per distinct (key, ts) pair, so duplicates cannot pool
    in the hit aggregation and double the count (review r5)."""
    left = spark.createDataFrame(
        [(1, 10, 1000), (2, 10, 1000)], "event_id long, user_id long, ts_us long"
    )
    right = spark.createDataFrame(
        [(10, 400), (10, 700), (10, 900)], "user_id long, ts_us long"
    )
    out = {
        r["event_id"]: r["n_in_window"]
        for r in range_count_join(left, right, on=["user_id"], window_us=1000).collect()
    }
    assert out == {1: 3, 2: 3}


def test_asof_null_tiebreak_loses(spark):
    """A right row with a NULL tiebreak must lose to any real one at
    the same timestamp (nulls-first ordering; review r5)."""
    left = spark.createDataFrame([(1, 10, 500)], "event_id long, user_id long, ts_us long")
    right = spark.createDataFrame(
        [(10, 500, None), (10, 500, 7)], "user_id long, ts_us long, event_id long"
    )
    (row,) = asof_join(
        left, right, on=["user_id"], right_payload=["event_id"], tiebreak="event_id"
    ).collect()
    assert row["event_id_r"] == 7


def test_asof_default_tiebreak_is_deterministic(spark):
    """With no tiebreak column, ties break on a content hash of the
    payload — arbitrary but STABLE across physical row orders."""
    left = spark.createDataFrame([(1, 10, 500)], "event_id long, user_id long, ts_us long")
    rows = [(10, 500, 111), (10, 500, 222)]
    a = asof_join(
        left,
        spark.createDataFrame(rows, "user_id long, ts_us long, event_id long").repartition(4),
        on=["user_id"], right_payload=["event_id"],
    ).collect()[0]["event_id_r"]
    b = asof_join(
        left,
        spark.createDataFrame(rows[::-1], "user_id long, ts_us long, event_id long").coalesce(1),
        on=["user_id"], right_payload=["event_id"],
    ).collect()[0]["event_id_r"]
    assert a == b and a in (111, 222)
