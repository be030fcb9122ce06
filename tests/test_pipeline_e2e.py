"""End-to-end replay: feed -> transform pipeline -> multi-batch MERGE
-> final table equals a DuckDB single-pass replay oracle.

This is the sync_diff_inspector analog (tests/sharding/run.sh:65 in the
reference): full-table equality on (conv_id, turn_idx) with per-turn
text equality under stable ordering.
"""

from __future__ import annotations

import duckdb
import pandas as pd
from pyspark.sql import functions as F

from dm_spark import feed as feedmod
from dm_spark.config import EventFilterRule, ExprFilterRule, RouteRule, TaskConfig
from dm_spark.lake import LakeTable
from dm_spark.operators import ApplyPipeline

SCHEMA = [
    ("conv_id", "string"),
    ("turn_idx", "int"),
    ("role", "string"),
    ("text", "string"),
    ("tool", "string"),
    ("ts", "timestamp"),
]
KEY = ["conv_id", "turn_idx"]

# key-moving updates split into DELETE(old key)+upsert(new key), the
# flatten_changes law (syncer/dml.go:90-152)
REPLAY_TAIL = """
, split AS (
  SELECT op, conv_id, turn_idx, role, text, tool, ts, file_seq, pos FROM feed
  UNION ALL
  SELECT 'D' AS op, conv_id, before_turn_idx AS turn_idx, role, text, tool,
         ts, file_seq, pos
  FROM feed WHERE key_moved
), latest AS (
  SELECT *, row_number() OVER (
    PARTITION BY conv_id, turn_idx
    ORDER BY ts DESC, file_seq DESC, pos DESC) AS rn
  FROM split
)
SELECT conv_id, turn_idx, role, text, tool, ts
FROM latest WHERE rn = 1 AND op <> 'D'
"""


def duck_replay(sf_dir: str, where: str = "TRUE") -> pd.DataFrame:
    con = duckdb.connect()
    con.execute(f"CREATE VIEW events AS SELECT * FROM read_parquet('{sf_dir}/events.parquet')")
    sql = f"WITH feed AS (SELECT * FROM ({feedmod.FEED_SQL}) WHERE {where}) {REPLAY_TAIL}"
    return (
        con.execute(sql).df().sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
    )


def spark_final(lake: LakeTable) -> pd.DataFrame:
    return (
        lake.read()
        .select("conv_id", "turn_idx", "role", "text", "tool", "ts")
        .toPandas()
        .sort_values(["conv_id", "turn_idx"])
        .reset_index(drop=True)
    )


def assert_tables_equal(got: pd.DataFrame, want: pd.DataFrame):
    assert len(got) == len(want)
    for c in ["conv_id", "turn_idx", "role", "text", "tool"]:
        pd.testing.assert_series_equal(got[c], want[c], check_names=False, check_dtype=False, obj=c)
    assert (
        got["ts"].astype("datetime64[us]") == want["ts"].astype("datetime64[us]")
    ).all()


def replay_in_batches(spark, lake, batch_df, n_batches=4, order_col="_cdc_pos"):
    bounds = [r[0] for r in batch_df.select(order_col).distinct().orderBy(order_col).collect()]
    chunks = [bounds[i::n_batches] for i in range(n_batches)]
    # contiguous ranges, applied in order
    srt = sorted(bounds)
    step = max(1, len(srt) // n_batches + 1)
    for i in range(n_batches):
        lo = srt[i * step] if i * step < len(srt) else None
        if lo is None:
            break
        hi = srt[min((i + 1) * step, len(srt)) - 1]
        part = batch_df.where((F.col(order_col) >= lo) & (F.col(order_col) <= hi))
        lake.merge_into(part, batch_id=i)


def test_plain_replay_matches_oracle(spark, sf_dir, tmp_path):
    cfg = TaskConfig(routes=[RouteRule(pattern="shard_*.transcripts_*", target="transcripts")])
    pipe = ApplyPipeline(cfg)
    batch = pipe.transform(feedmod.change_feed(spark, sf_dir))
    assert batch.select("target_table").distinct().collect()[0][0] == "transcripts"
    lake = LakeTable.create(spark, str(tmp_path / "t"), SCHEMA, KEY, n_buckets=8)
    replay_in_batches(spark, lake, batch.drop("target_table"))
    assert_tables_equal(spark_final(lake), duck_replay(sf_dir))


def test_filter_matrix_replay_matches_oracle(spark, sf_dir, tmp_path):
    cfg = TaskConfig(
        deny_tables=["shard_3.*"],
        event_filters=[EventFilterRule(pattern="shard_*.transcripts_1", ignore_ops=["D"])],
        expr_filters=[
            ExprFilterRule(
                pattern="shard_*.transcripts_*",
                insert_expr="after.role = 'tool' AND after.tool = 'tool_0'",
            )
        ],
        routes=[RouteRule(pattern="shard_*.transcripts_*", target="transcripts")],
    )
    pipe = ApplyPipeline(cfg)
    batch = pipe.transform(feedmod.change_feed(spark, sf_dir)).drop("target_table")
    lake = LakeTable.create(spark, str(tmp_path / "t"), SCHEMA, KEY, n_buckets=8)
    replay_in_batches(spark, lake, batch)
    where = """
      source_table NOT LIKE 'shard_3.%'
      AND NOT (op = 'D' AND source_table LIKE '%.transcripts_1')
      AND NOT (op = 'I' AND role = 'tool' AND tool = 'tool_0')
    """
    assert_tables_equal(spark_final(lake), duck_replay(sf_dir, where))


def test_key_changing_update_leaves_no_ghost(spark, tmp_path):
    """A key-moving UPDATE must delete the row under the OLD key and
    upsert it under the new key (syncer/dml.go:90-152; ADVICE r01 #1).
    Hand-built envelope: INSERT (c,0), then UPDATE moving it to (c,7)."""
    env = spark.createDataFrame(
        [
            ("I", None, ("c", 0, "user", "v1", None, "2024-01-01 00:00:00"), "s.t", 0, 1, "2024-01-01 00:00:00", 0),
            (
                "U",
                ("c", 0, "user", "v1", None, "2024-01-01 00:00:00"),
                ("c", 7, "user", "v2", None, "2024-01-01 00:00:01"),
                "s.t", 0, 2, "2024-01-01 00:00:01", 0,
            ),
        ],
        feedmod.ENVELOPE_DDL.replace("timestamp", "string"),
    )
    for c in ("ts",):
        env = env.withColumn(c, F.col(c).cast("timestamp"))
    for img in ("before", "after"):
        env = env.withColumn(
            img,
            F.when(
                F.col(img).isNotNull(),
                F.col(img).withField("ts", F.col(f"{img}.ts").cast("timestamp")),
            ).cast(
                "struct<conv_id:string,turn_idx:int,role:string,text:string,tool:string,ts:timestamp>"
            ),
        )
    cfg = TaskConfig(routes=[RouteRule(pattern="s.t", target="t")])
    flat = ApplyPipeline(cfg).transform(env).drop("target_table")
    # the split produces 3 change rows: I, D(old key), upsert(new key)
    assert flat.count() == 3
    ops = {(r.turn_idx, r.op) for r in flat.select("turn_idx", "op").collect()}
    assert ops == {(0, "I"), (0, "D"), (7, "U")}
    lake = LakeTable.create(spark, str(tmp_path / "t"), SCHEMA, KEY, n_buckets=4)
    lake.merge_into(flat, batch_id=0)
    rows = {(r.conv_id, r.turn_idx): r.text for r in lake.read().collect()}
    assert rows == {("c", 7): "v2"}, f"ghost row survived: {rows}"


def test_double_replay_idempotent(spark, sf_dir, tmp_path):
    cfg = TaskConfig(routes=[RouteRule(pattern="shard_*.transcripts_*", target="transcripts")])
    batch = ApplyPipeline(cfg).transform(feedmod.change_feed(spark, sf_dir)).drop("target_table")
    lake = LakeTable.create(spark, str(tmp_path / "t"), SCHEMA, KEY, n_buckets=8)
    lake.merge_into(batch, batch_id=0)
    once = spark_final(lake)
    lake.merge_into(batch)  # full duplicate delivery, no batch gate
    assert_tables_equal(spark_final(lake), once)
