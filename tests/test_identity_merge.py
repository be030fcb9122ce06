"""Identity-ladder merge: tables whose PK components can be null merge
on the reference's per-row WHERE-identity ladder — PK, else first
all-non-null unique key, else full row (syncer/dml.go:260-318
findFitIndex/getAvailableIndexColumn, whereColumnsAndValues :472-493;
the downstream_more_column / UK-identity suite shape)."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from dm_spark.lake import LakeTable
from dm_spark.operators import flatten_changes

SCHEMA = [
    ("k", "int"),
    ("u", "string"),
    ("v", "string"),
]
CHANGE_DDL = (
    "k int, u string, v string, op string, "
    "_cdc_ts timestamp, _cdc_file_seq bigint, _cdc_pos bigint"
)


def T(i):
    return dt.datetime(2024, 1, 1) + dt.timedelta(seconds=i)


def ch(k, u, v, op, fs, pos):
    return (k, u, v, op, T(pos), fs, pos)


def _nkey(t):
    return tuple((x is None, x) for x in t)


def rows(lake):
    return sorted(
        ((r.k, r.u, r.v) for r in lake.read().select("k", "u", "v").collect()),
        key=_nkey,
    )


@pytest.fixture()
def lake(spark, tmp_path):
    return LakeTable.create(
        spark, str(tmp_path / "uk"), SCHEMA, key=["k"], unique_keys=[["u"]],
        n_buckets=4,
    )


def test_uk_rung_merges_null_pk_rows(spark, lake):
    """Rows with null PK merge on their UK: update + delete by UK."""
    lake.merge_into(
        spark.createDataFrame(
            [
                ch(1, "a", "v1", "I", 0, 1),  # pk rung
                ch(None, "b", "v1", "I", 0, 2),  # uk rung
                ch(None, "c", "v1", "I", 0, 3),  # uk rung
            ],
            CHANGE_DDL,
        ),
        batch_id=0,
    )
    lake.merge_into(
        spark.createDataFrame(
            [
                ch(None, "b", "v2", "U", 1, 11),  # updates the UK row
                ch(None, "c", None, "D", 1, 12),  # deletes by UK
                ch(1, "a", "v2", "U", 1, 13),  # PK row still merges by PK
            ],
            CHANGE_DDL,
        ),
        batch_id=1,
    )
    assert rows(lake) == [(1, "a", "v2"), (None, "b", "v2")]


def test_full_row_fallback(spark, lake):
    """Rows with PK and UK both null fall to full-row identity: an
    exact redelivery converges to one row, and a full-row DELETE with
    the same payload removes it (dml.go:305-318 full-column WHERE)."""
    b = spark.createDataFrame(
        [
            ch(None, None, "x", "I", 0, 1),
            ch(None, None, "y", "I", 0, 2),
        ],
        CHANGE_DDL,
    )
    lake.merge_into(b, batch_id=0)
    # redelivery with later lineage: same full-row identity, still 2 rows
    lake.merge_into(
        spark.createDataFrame([ch(None, None, "x", "I", 1, 11)], CHANGE_DDL)
    )
    assert rows(lake) == [(None, None, "x"), (None, None, "y")]
    lake.merge_into(
        spark.createDataFrame([ch(None, None, "y", "D", 2, 21)], CHANGE_DDL)
    )
    assert rows(lake) == [(None, None, "x")]


def test_ladder_split_on_rung_transition(spark, lake):
    """An UPDATE that fills a previously-null PK moves the ladder
    identity: flatten_changes must split it into DELETE(UK identity) +
    upsert(PK identity), or the old UK row survives as a ghost."""
    env = spark.createDataFrame(
        [
            ("I", None, (None, "b", "v1"), 0, 1),
            # update fills k: identity moves uk -> pk
            ("U", (None, "b", "v1"), (7, "b", "v2"), 1, 1),
        ],
        "op string, before struct<k int, u string, v string>, "
        "after struct<k int, u string, v string>, file_seq bigint, pos bigint",
    ).withColumn("ts", F.to_timestamp(F.lit("2024-01-01 00:00:10")))
    flat = flatten_changes(env, key=["k"], unique_keys=[["u"]])
    lake.merge_into(flat)
    assert rows(lake) == [(7, "b", "v2")]


def test_mor_and_compact_use_ladder_identity(spark, tmp_path):
    """MoR deltas + read-time LWW + compaction all group on the ladder
    identity, not the raw PK (which is null here)."""
    lake = LakeTable.create(
        spark, str(tmp_path / "ukm"), SCHEMA, key=["k"], unique_keys=[["u"]],
        n_buckets=4, write_mode="mor",
    )
    lake.merge_into(
        spark.createDataFrame(
            [ch(None, "b", "v1", "I", 0, 1), ch(None, "c", "v1", "I", 0, 2)],
            CHANGE_DDL,
        ),
        batch_id=0,
    )
    lake.merge_into(
        spark.createDataFrame(
            [ch(None, "b", "v2", "U", 1, 11), ch(None, "c", None, "D", 1, 12)],
            CHANGE_DDL,
        ),
        batch_id=1,
    )
    assert rows(lake) == [(None, "b", "v2")]  # read-time base+delta LWW
    lake.compact()
    assert rows(lake) == [(None, "b", "v2")]  # compaction preserved it


def test_uk_rename_keeps_identity_stable(spark, lake):
    """Renaming a UK column is allowed (identity labels are stable
    field ids): rows merged before the rename are still reachable by
    the same UK values after it."""
    lake.merge_into(
        spark.createDataFrame([ch(None, "b", "v1", "I", 0, 1)], CHANGE_DDL),
        batch_id=0,
    )
    assert lake.apply_ddl(
        {"action": "rename_column", "column": "u", "new_name": "uid",
         "file_seq": 1, "pos": 0}
    )
    assert lake._load_meta().unique_keys == [["uid"]]
    upd = spark.createDataFrame(
        [ch(None, "b", "v2", "U", 2, 21)], CHANGE_DDL
    ).withColumnRenamed("u", "uid")
    lake.merge_into(upd, batch_id=1)
    got = [(r.k, r.uid, r.v) for r in lake.read().collect()]
    assert got == [(None, "b", "v2")]


def test_uk_drop_guard(spark, lake):
    with pytest.raises(ValueError, match="unique-key identity column"):
        lake.apply_ddl(
            {"action": "drop_column", "column": "u", "file_seq": 1, "pos": 0}
        )


def test_pkless_table_starts_ladder_at_uk(spark, tmp_path):
    """key=[] + unique_keys: a genuinely PK-less table (UK-only shard
    merges) — the ladder starts at the UK rung, never a constant."""
    lake = LakeTable.create(
        spark, str(tmp_path / "nopk"), SCHEMA, key=[], unique_keys=[["u"]],
        n_buckets=4,
    )
    lake.merge_into(
        spark.createDataFrame(
            [ch(1, "a", "v1", "I", 0, 1), ch(2, "b", "v1", "I", 0, 2)],
            CHANGE_DDL,
        ),
        batch_id=0,
    )
    lake.merge_into(
        spark.createDataFrame([ch(2, "b", "v2", "U", 1, 11)], CHANGE_DDL),
        batch_id=1,
    )
    assert rows(lake) == [(1, "a", "v1"), (2, "b", "v2")]


def test_create_requires_some_identity(spark, tmp_path):
    with pytest.raises(ValueError, match="key or unique_keys"):
        LakeTable.create(spark, str(tmp_path / "nok"), SCHEMA, key=[])


def test_rescale_preserves_ladder_state(spark, tmp_path):
    """Bucket rescale on a unique_keys table: the rewrite re-buckets on
    the ladder identity; state identical, next trickle merge works."""
    lake = LakeTable.create(
        spark, str(tmp_path / "ukrs"), SCHEMA, key=["k"], unique_keys=[["u"]],
        n_buckets=4,
    )
    lake.merge_into(
        spark.createDataFrame(
            [ch(i if i % 2 else None, f"u{i}", "v1", "I", 0, i) for i in range(1, 13)],
            CHANGE_DDL,
        ),
        batch_id=0,
    )
    before = rows(lake)
    lake.rescale(16)
    assert rows(lake) == before
    lake.merge_into(
        spark.createDataFrame([ch(None, "u2", "v2", "U", 1, 99)], CHANGE_DDL),
        batch_id=1,
    )
    got = dict(((r[0], r[1]), r[2]) for r in rows(lake))
    assert got[(None, "u2")] == "v2"
