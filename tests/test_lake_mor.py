"""Merge-on-read mode: delta appends, tombstones, read-time LWW,
compaction — must be state-equivalent to copy-on-write."""

from __future__ import annotations

import pytest

from dm_spark.lake import LakeTable

from tests.test_lake import CHANGE_DDL, KEY, SCHEMA, ch, rows


@pytest.fixture()
def pair(spark, tmp_path):
    cow = LakeTable.create(spark, str(tmp_path / "cow"), SCHEMA, KEY, n_buckets=8)
    mor = LakeTable.create(
        spark, str(tmp_path / "mor"), SCHEMA, KEY, n_buckets=8, write_mode="mor"
    )
    return cow, mor


BATCHES = [
    [("a", 1, "I", "v1", 0, 1, 1), ("a", 2, "I", "v1", 0, 2, 2), ("b", 1, "I", "v1", 0, 3, 3)],
    [("a", 1, "U", "v2", 1, 1, 10), ("b", 1, "D", None, 1, 2, 11), ("c", 9, "I", "v1", 1, 3, 12)],
    [("c", 9, "D", None, 2, 1, 20), ("a", 2, "U", "v3", 2, 2, 21), ("d", 4, "I", "v1", 2, 3, 22)],
]


def _apply_all(spark, lake):
    for i, b in enumerate(BATCHES):
        lake.merge_into(spark.createDataFrame([ch(*r) for r in b], CHANGE_DDL), batch_id=i)


def test_mor_equals_cow(spark, pair):
    cow, mor = pair
    _apply_all(spark, cow)
    _apply_all(spark, mor)
    expected = [("a", 1, "v2"), ("a", 2, "v3"), ("d", 4, "v1")]
    assert rows(cow.read()) == expected
    assert rows(mor.read()) == expected


def test_mor_delta_files_then_compact(spark, pair):
    _, mor = pair
    _apply_all(spark, mor)
    meta = mor._load_meta()
    n_delta = sum(1 for es in meta.buckets.values() for e in es if e.get("delta"))
    assert n_delta > 0  # MoR wrote deltas, no base rewrite
    before = rows(mor.read())

    n = mor.compact()
    assert n > 0
    meta2 = mor._load_meta()
    assert not any(e.get("delta") for es in meta2.buckets.values() for e in es)
    assert rows(mor.read()) == before
    # compaction dropped tombstones: total file rows == live rows
    total = sum(
        __import__("pyarrow.parquet", fromlist=["ParquetFile"]).ParquetFile(e["path"]).metadata.num_rows
        for es in meta2.buckets.values()
        for e in es
    )
    assert total == len(before)


def test_mor_batch_gate_and_redelivery(spark, pair):
    _, mor = pair
    _apply_all(spark, mor)
    v = mor._head_version()
    # replayed batch id -> skipped
    s = mor.merge_into(
        spark.createDataFrame([ch(*BATCHES[0][0])], CHANGE_DDL), batch_id=0
    )
    assert s.skipped and mor._head_version() == v
    # stale redelivery without gate -> LWW keeps newer state
    mor.merge_into(spark.createDataFrame([ch(*BATCHES[0][0])], CHANGE_DDL))
    assert rows(mor.read()) == [("a", 1, "v2"), ("a", 2, "v3"), ("d", 4, "v1")]


def test_mor_cow_merge_after_compact_interops(spark, pair):
    """After compaction a CoW-style bulk merge still works on the same
    table (mode applies to writes; base files are shared shape)."""
    _, mor = pair
    _apply_all(spark, mor)
    mor.compact()
    mor.merge_into(
        spark.createDataFrame([ch("e", 5, "I", "v1", 3, 1, 30)], CHANGE_DDL), batch_id=3
    )
    assert ("e", 5, "v1") in rows(mor.read())
