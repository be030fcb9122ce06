"""The change-feed law must be bit-identical between the Spark builder
and the DuckDB SQL rendition — that equality is what makes every
downstream correctness oracle valid."""

from __future__ import annotations

import duckdb
import pandas as pd

from dm_spark import feed as feedmod


def duck(sf_dir: str, sql: str) -> pd.DataFrame:
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM read_parquet('{sf_dir}/events.parquet')"
    )
    return con.execute(sql).df()


def test_feed_matches_duckdb(spark, sf_dir):
    sdf = (
        feedmod.change_feed(spark, sf_dir)
        .selectExpr(
            "op",
            "coalesce(after.conv_id, before.conv_id) AS conv_id",
            "coalesce(after.turn_idx, before.turn_idx) AS turn_idx",
            "coalesce(after.role, before.role) AS role",
            "coalesce(after.text, before.text) AS text",
            "coalesce(after.tool, before.tool) AS tool",
            "ts",
            "source_table",
            "file_seq",
            "pos",
            "txn_id",
        )
        .toPandas()
        .sort_values(["file_seq", "pos"])
        .reset_index(drop=True)
    )
    ddf = (
        duck(sf_dir, f"SELECT * FROM ({feedmod.FEED_SQL})")
        .sort_values(["file_seq", "pos"])
        .reset_index(drop=True)
    )
    assert len(sdf) == len(ddf) and len(sdf) > 0
    for c in ["op", "conv_id", "turn_idx", "role", "text", "tool", "source_table", "file_seq", "pos", "txn_id"]:
        pd.testing.assert_series_equal(
            sdf[c], ddf[c], check_names=False, check_dtype=False, obj=c
        )
    assert (sdf["ts"].astype("datetime64[us]") == ddf["ts"].astype("datetime64[us]")).all()


def test_feed_envelope_invariants(spark, sf_dir):
    df = feedmod.change_feed(spark, sf_dir)
    bad = df.filter(
        ((df.op == "I") & df.before.isNotNull())
        | ((df.op == "D") & df.after.isNotNull())
        | ((df.op == "U") & (df.before.isNull() | df.after.isNull()))
        | df.after.isNull() & df.before.isNull()
    )
    assert bad.count() == 0


def test_synthetic_feed_shape_and_determinism(spark):
    f1 = feedmod.synthetic_feed(spark, 5000, n_convs=100, partitions=4)
    f2 = feedmod.synthetic_feed(spark, 5000, n_convs=100, partitions=8)
    assert f1.count() == 5000
    # partition count must not change the data (per-row law)
    a = sorted(f1.selectExpr("file_seq", "pos", "after.conv_id").collect())
    b = sorted(f2.selectExpr("file_seq", "pos", "after.conv_id").collect())
    assert a == b
    # skew: top conversation should be hot (zipf-ish)
    top = (
        f1.groupBy("after.conv_id").count().orderBy("count", ascending=False).first()["count"]
    )
    assert top > 5000 / 100 * 3  # >3x uniform share


def test_decode_wire_ts_lenient_but_never_silent(spark):
    """Review fix: image timestamps from OTHER producers (second
    precision 'Z', space-separated) must parse via the lenient
    fallback, and a present-but-unparseable ts must RAISE — image ts is
    the first LWW ordering component; a silent NULL would corrupt
    conflict resolution with no signal."""
    import pytest

    from dm_spark.sources.decode import WIRE_DDL, decode_wire

    def wire(payload):
        return spark.createDataFrame(
            [("I", payload, "db.t", 0, 1, 1700000000000000, 0)], WIRE_DDL
        )

    for ts in ["2024-01-01T00:00:00Z", "2024-01-01 00:00:05"]:
        row = decode_wire(wire('{"after": {"conv_id": "a", "ts": "%s"}}' % ts)).collect()[0]
        assert row.after.ts is not None and row.after.ts.year == 2024
    # absent ts stays NULL quietly
    row = decode_wire(wire('{"after": {"conv_id": "a"}}')).collect()[0]
    assert row.after.ts is None
    # garbage raises loudly
    with pytest.raises(Exception, match="unparseable wire image timestamp"):
        decode_wire(wire('{"after": {"conv_id": "a", "ts": "not-a-time"}}')).collect()
