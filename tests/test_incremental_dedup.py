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
