"""Incremental fingerprint-index dedup (functions/incremental):
first-writer-wins survivor stability, redelivery convergence, and
insert-only index growth. The id-ordered-batches == global-dedup
equivalence is oracle-gated (doc_incremental_dedup); these pin the
laws the ordered corpus can't exercise."""

from __future__ import annotations

from dm_spark.functions.incremental import create_fp_index, incremental_dedup_batch


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def _flags(df):
    return {r["doc_id"]: (r["keep_id"], r["is_dup"]) for r in df.collect()}


def test_incremental_dedup_first_writer_wins(spark, tmp_path):
    index = create_fp_index(spark, str(tmp_path / "idx"), n_buckets=4)

    b1 = _flags(
        incremental_dedup_batch(
            index, _docs(spark, [(10, "x"), (20, "x"), (30, "y")]), batch_seq=0
        )
    )
    assert b1[10] == (10, False)  # batch keeper
    assert b1[20] == (10, True)  # within-batch dup
    assert b1[30] == (30, False)
    assert index.read().count() == 2

    # batch 2: a SMALLER id arrives for known content — the index's
    # first-seen survivor must hold (decisions are immutable), and new
    # content inserts normally
    b2 = _flags(
        incremental_dedup_batch(
            index, _docs(spark, [(1, "x"), (40, "z")]), batch_seq=1
        )
    )
    assert b2[1] == (10, True)  # NOT relabeled to keep_id 1
    assert b2[40] == (40, False)
    idx = {r["fp"]: r["keep_id"] for r in index.read().collect()}
    assert sorted(idx.values()) == [10, 30, 40]


def test_incremental_dedup_redelivery_converges(spark, tmp_path):
    index = create_fp_index(spark, str(tmp_path / "idx"), n_buckets=4)
    batch = _docs(spark, [(5, "a"), (6, "a"), (7, "b")])
    first = _flags(incremental_dedup_batch(index, batch, batch_seq=0))
    replay = _flags(incremental_dedup_batch(index, batch, batch_seq=0))
    assert replay == first  # identical flags on redelivery
    idx = {r["fp"]: r["keep_id"] for r in index.read().collect()}
    assert sorted(idx.values()) == [5, 7]  # no duplicate index rows


def _pref_rows():
    import datetime as dt

    t0 = dt.datetime(2026, 1, 1)
    ts = lambda s: t0 + dt.timedelta(seconds=s)  # noqa: E731
    # a rich history: revisions, an identical rewrite, a delete +
    # revival, a non-assistant key, and a key-change-free delete-end
    return [
        # (a,1): v1 -> v2 -> v2(rewrite) -> v3  => (v3, v2)
        ("a", 1, "I", "assistant", "v1", ts(1), 1, 1),
        ("a", 1, "U", "assistant", "v2", ts(2), 1, 2),
        ("a", 1, "U", "assistant", "v2", ts(3), 1, 3),
        ("a", 1, "U", "assistant", "v3", ts(4), 1, 4),
        # (a,2): deleted mid-stream then revived  => (z, x)
        ("a", 2, "I", "assistant", "x", ts(1), 1, 5),
        ("a", 2, "D", "assistant", "x", ts(2), 1, 6),
        ("a", 2, "I", "assistant", "z", ts(3), 1, 7),
        # (a,3): ends deleted => no pair
        ("a", 3, "I", "assistant", "q", ts(1), 1, 8),
        ("a", 3, "U", "assistant", "r", ts(2), 1, 9),
        ("a", 3, "D", "assistant", "r", ts(3), 1, 10),
        # (a,4): user turn => no pair
        ("a", 4, "I", "user", "u1", ts(1), 1, 11),
        ("a", 4, "U", "user", "u2", ts(2), 1, 12),
        # (a,5): single version => no pair
        ("a", 5, "I", "assistant", "only", ts(1), 1, 13),
    ]


_PREF_DDL = (
    "conv_id string, turn_idx int, op string, role string, "
    "text string, ts timestamp, file_seq long, pos long"
)


def _fold(spark, tmp_path, name, batches):
    from dm_spark.functions.incremental import (
        create_pref_index,
        incremental_preference_batch,
        preference_pairs_from_index,
    )

    idx = create_pref_index(spark, str(tmp_path / name), n_buckets=4)
    for rows in batches:
        incremental_preference_batch(idx, spark.createDataFrame(rows, _PREF_DDL))
    return {
        (r["conv_id"], r["turn_idx"]): (r["chosen"], r["rejected"])
        for r in preference_pairs_from_index(idx).collect()
    }


def test_incremental_preference_equals_global(spark, tmp_path):
    """Folding ordered batches equals the global single-window law."""
    from dm_spark.queries_cdc import preference_pairs

    rows = _pref_rows()
    want = {
        (r["conv_id"], r["turn_idx"]): (r["chosen"], r["rejected"])
        for r in preference_pairs(
            spark.createDataFrame(rows, _PREF_DDL)
        ).collect()
    }
    got = _fold(spark, tmp_path, "ordered", [rows[:5], rows[5:9], rows[9:]])
    assert got == want == {
        ("a", 1): ("v3", "v2"),
        ("a", 2): ("z", "x"),
    }


def test_incremental_preference_out_of_order_and_redelivery(spark, tmp_path):
    """Late arrivals (a whole batch of OLDER events lands after newer
    ones) and a redelivered batch converge to the same pairs — the
    (u1, u2, d) state is order-independent and idempotent."""
    rows = _pref_rows()
    late_first = [rows[3::4] + rows[2::4], rows[1::4], rows[0::4]]
    got = _fold(spark, tmp_path, "late", late_first)
    redelivered = [rows[:7], rows[7:], rows[:7]]  # batch 0 replayed
    got2 = _fold(spark, tmp_path, "redeliver", redelivered)
    want = {("a", 1): ("v3", "v2"), ("a", 2): ("z", "x")}
    assert got == want and got2 == want


def test_incremental_preference_null_text_winner(spark, tmp_path):
    """A NULL-text upsert winner must survive the fold as state (the
    presence marker is the location, not the text): the key emits no
    pair — matching the global law, where NULL chosen never compares
    unequal to anything — even when older non-null versions arrive in
    a LATER batch."""
    import datetime as dt

    t0 = dt.datetime(2026, 1, 1)
    ts = lambda s: t0 + dt.timedelta(seconds=s)  # noqa: E731
    b1 = [("k", 1, "U", "assistant", None, ts(5), 1, 5)]
    b2 = [
        ("k", 1, "I", "assistant", "v1", ts(1), 1, 1),
        ("k", 1, "U", "assistant", "v2", ts(2), 1, 2),
    ]
    assert _fold(spark, tmp_path, "nulltext", [b1, b2]) == {}


def test_streaming_incremental_preference_fold(spark, sf_dir, tmp_path):
    """The preference index folds straight off the live relay stream
    (foreachBatch over the same flattened pipeline the lake merge
    uses) and the materialized pairs equal the global single-window
    law over the whole feed — derived training-data state maintained
    by the CDC tail itself, not a separate batch job."""
    from dm_spark import feed as feedmod
    from dm_spark.config import RouteRule, TaskConfig
    from dm_spark.functions.incremental import (
        create_pref_index,
        incremental_preference_batch,
        preference_pairs_from_index,
    )
    from dm_spark.operators import ApplyPipeline
    from dm_spark.queries_cdc import preference_pairs
    from dm_spark.sources.relay import read_feed_stream, write_feed_chunks

    feed = feedmod.change_feed(spark, sf_dir)
    feed_dir = str(tmp_path / "feed")
    write_feed_chunks(feed, feed_dir, n_chunks=6)
    idx = create_pref_index(spark, str(tmp_path / "pref"), n_buckets=8)
    pipe = ApplyPipeline(
        TaskConfig(routes=[RouteRule(pattern="shard_*.transcripts_*", target="transcripts")])
    )

    def fold(bdf, bid):
        incremental_preference_batch(
            idx, pipe.transform(bdf).drop("target_table")
        )

    q = (
        read_feed_stream(spark, feed_dir, max_files_per_trigger=2)
        .writeStream.foreachBatch(fold)
        .option("checkpointLocation", str(tmp_path / "cp"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(timeout=300)
    got = {
        (r["conv_id"], r["turn_idx"]): (r["chosen"], r["rejected"])
        for r in preference_pairs_from_index(idx).collect()
    }
    want = {
        (r["conv_id"], r["turn_idx"]): (r["chosen"], r["rejected"])
        for r in preference_pairs(
            pipe.transform(feed).drop("target_table")
        ).collect()
    }
    assert got == want and len(got) > 10


def _best_rows():
    import datetime as dt

    t0 = dt.datetime(2026, 1, 1)
    ts = lambda s: t0 + dt.timedelta(seconds=s)  # noqa: E731
    return [
        # (a,1): old draft out-scores the final edit => best is OLD
        ("a", 1, "I", "assistant", "alpha beta gamma", ts(1), 1, 1),
        ("a", 1, "U", "assistant", "ok ok fine fine", ts(2), 1, 2),
        # (a,2): score tie => newest wins
        ("a", 2, "I", "assistant", "x y", ts(1), 1, 3),
        ("a", 2, "U", "assistant", "p q", ts(2), 1, 4),
        # (a,3): ends deleted => nothing
        ("a", 3, "I", "assistant", "gone here", ts(1), 1, 5),
        ("a", 3, "D", "assistant", "gone here", ts(2), 1, 6),
        # (a,4): user key => nothing
        ("a", 4, "I", "user", "question", ts(1), 1, 7),
        # (a,5): NULL-text winner, older scored draft exists => the
        # draft wins the argmax, is_lww=0
        ("a", 5, "I", "assistant", "w1 w2", ts(1), 1, 8),
        ("a", 5, "U", "assistant", None, ts(2), 1, 9),
    ]


def _fold_best(spark, tmp_path, name, batches):
    from dm_spark.functions.incremental import (
        best_of_from_index,
        create_best_index,
        incremental_best_of_batch,
    )

    idx = create_best_index(spark, str(tmp_path / name), n_buckets=4)
    for rows in batches:
        incremental_best_of_batch(idx, spark.createDataFrame(rows, _PREF_DDL))
    return {
        (r["conv_id"], r["turn_idx"]): (
            r["best_score"], r["best_fp"], r["best_is_lww"]
        )
        for r in best_of_from_index(idx).collect()
    }


def test_incremental_best_of_equals_global(spark, tmp_path):
    """Folding ordered batches equals the global window law (minus
    n_versions, which a count cannot maintain idempotently)."""
    from dm_spark.queries_cdc import best_of_history

    rows = _best_rows()
    want = {
        (r["conv_id"], r["turn_idx"]): (
            r["best_score"], r["best_fp"], r["best_is_lww"]
        )
        for r in best_of_history(
            spark.createDataFrame(rows, _PREF_DDL)
        ).collect()
    }
    got = _fold_best(spark, tmp_path, "bo_ordered", [rows[:4], rows[4:7], rows[7:]])
    assert got == want
    assert set(got) == {("a", 1), ("a", 2), ("a", 5)}
    assert got[("a", 1)][0] == 3 and got[("a", 1)][2] == 0  # old draft wins
    assert got[("a", 2)][2] == 1  # tie -> newest IS the LWW row
    assert got[("a", 5)][2] == 0  # scored draft beats the NULL-text winner


def test_incremental_best_of_out_of_order_and_redelivery(spark, tmp_path):
    """The (argmax, latest-event) state is a pure semilattice: any
    arrival order and any redelivery converge to the global law."""
    from dm_spark.queries_cdc import best_of_history

    rows = _best_rows()
    want = {
        (r["conv_id"], r["turn_idx"]): (
            r["best_score"], r["best_fp"], r["best_is_lww"]
        )
        for r in best_of_history(
            spark.createDataFrame(rows, _PREF_DDL)
        ).collect()
    }
    late_first = [rows[1::2], rows[0::2]]  # newer halves land first
    assert _fold_best(spark, tmp_path, "bo_late", late_first) == want
    redelivered = [rows[:5], rows[5:], rows[:5]]  # batch 0 replayed
    assert _fold_best(spark, tmp_path, "bo_redeliver", redelivered) == want
