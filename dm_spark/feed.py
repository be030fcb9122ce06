"""Change-event feed: the binlog analog.

The reference consumes a totally-ordered stream of binlog events, each
carrying row images (reference: syncer/syncer.go:1953-2109
`handleRowsEvent`; update old/new pairing syncer/dml.go:104-108; the
checkpoint coordinate pkg/binlog/position.go:229-235 `Location{file,pos}`).

Here the feed is a DataFrame of envelope rows:

    op           'I' | 'U' | 'D'
    before       struct<conv_id,turn_idx,role,text,tool,ts>   (null for I)
    after        struct<conv_id,turn_idx,role,text,tool,ts>   (null for D)
    source_table 'shard_<i>.transcripts_<j>'   (router input)
    file_seq     long   -- binlog file ordinal   } Location analog,
    pos          long   -- offset within file    } totally ordered
    ts           timestamp -- commit ts (LWW primary ordering)
    txn_id       long   -- XID analog

Two constructors:

- :func:`change_feed` derives the feed **deterministically from the
  driver's `events` parquet table** by a fixed arithmetic law, so a
  DuckDB oracle (:data:`FEED_SQL`) can reproduce it exactly in ANSI SQL
  for the correctness gate.
- :func:`synthetic_feed` generates an arbitrarily large feed on the fly
  with `spark.range` + vectorized column expressions (no driver-side
  data, no Python row loop) — the bench path; a zipf-ish skewed
  `conv_id` distribution exercises hot-key handling.
"""

from __future__ import annotations

import datetime as _dt

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

PAYLOAD_FIELDS = ["conv_id", "turn_idx", "role", "text", "tool", "ts"]
KEY_COLS = ["conv_id", "turn_idx"]
ORDER_COLS = ["ts", "file_seq", "pos"]  # LWW ordering: ts, tiebreak binlog location

PAYLOAD_DDL = "conv_id string, turn_idx int, role string, text string, tool string, ts timestamp"
ENVELOPE_DDL = (
    "op string, "
    f"before struct<{PAYLOAD_DDL}>, after struct<{PAYLOAD_DDL}>, "
    "source_table string, file_seq bigint, pos bigint, ts timestamp, txn_id bigint"
)


def _image(
    eid: Column, uid: Column, etype: Column, ts: Column, turn: Column,
    pad: Column | None = None,
) -> Column:
    """Row image by the shared deterministic law (see FEED_SQL).
    `pad` (synthetic_feed only) appends filler to `text` INSIDE the
    one struct construction — the old post-hoc `withField` pass
    rebuilt both image structs a second time (measured ~2x the whole
    padded-feed projection at local[1])."""
    role = (
        F.when(eid % 3 == 0, F.lit("user"))
        .when(eid % 3 == 1, F.lit("assistant"))
        .otherwise(F.lit("tool"))
    )
    text = F.concat(etype, F.lit(" #"), eid.cast("string"))
    if pad is not None:
        text = F.concat(text, pad)
    return F.struct(
        F.concat(F.lit("conv_"), uid.cast("string")).alias("conv_id"),
        turn.cast("int").alias("turn_idx"),
        role.alias("role"),
        text.alias("text"),
        F.when(eid % 3 == 2, F.concat(F.lit("tool_"), (eid % 7).cast("string"))).alias("tool"),
        ts.alias("ts"),
    )


def _envelope(
    eid: Column, uid: Column, etype: Column, ts: Column, km_every: int | None = 9,
    pad: Column | None = None,
) -> list[Column]:
    """Envelope law. `km_every`: every km_every'th UPDATE is a
    **key-moving update** — `after.turn_idx` differs from
    `before.turn_idx` (+13 mod 50, never a no-op) — the reference's
    identity-changing UPDATE that must replay as DELETE(old)+INSERT(new)
    (syncer/dml.go:90-152). km_every=1 moves every update; None/0
    disables."""
    op = (
        F.when(eid % 20 < 14, F.lit("I"))
        .when(eid % 20 < 19, F.lit("U"))
        .otherwise(F.lit("D"))
    )
    before_turn = eid % 50
    if km_every:
        km = (op == F.lit("U")) & (eid % km_every == 0)
        after_turn = F.when(km, (eid + 13) % 50).otherwise(before_turn)
    else:
        after_turn = before_turn
    before_img = _image(eid, uid, etype, ts, before_turn, pad=pad)
    after_img = _image(eid, uid, etype, ts, after_turn, pad=pad)
    return [
        op.alias("op"),
        F.when(op != "I", before_img).alias("before"),
        F.when(op != "D", after_img).alias("after"),
        F.concat(
            F.lit("shard_"), (uid % 4).cast("string"),
            F.lit(".transcripts_"), (eid % 2).cast("string"),
        ).alias("source_table"),
        (eid / 1000).cast("bigint").alias("file_seq"),
        (eid % 1000).cast("bigint").alias("pos"),
        ts.alias("ts"),
        (eid / 10).cast("bigint").alias("txn_id"),
    ]


def change_feed(
    spark: SparkSession, sf_dir: str, km_every: int | None = 9,
    parallelize: bool = False,
) -> DataFrame:
    """Deterministic change feed derived from `<sf_dir>/events.parquet`.

    Pure column arithmetic — stays in whole-stage codegen; the parquet
    scan only reads (event_id, user_id, event_type, ts).

    `parallelize=False` default — measured at sf0.1: the
    envelope+flatten work per merge batch (~0.14s single-task) is
    cheaper than the exchange + extra stage it would buy (~+0.5s/job);
    the corpus readers with heavy per-row kernels are where
    parallelize_scan pays. `parallelize=True` applies the adaptive
    floor (scan.py) to the RAW narrow scan, so the exchange carries
    ~40B/event and the envelope struct build itself spreads — for
    consumers whose per-event work downstream is heavy (the wire
    round-trip) on a few-row-group input. Values identical either way.
    """
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    if parallelize:
        from dm_spark.scan import parallelize_scan

        ev = parallelize_scan(ev)
    eid, uid = F.col("event_id"), F.col("user_id")
    # parquet naive timestamps surface as TIMESTAMP_NTZ in Spark 4;
    # session TZ is pinned UTC so this cast is value-preserving
    ts = F.col("ts").cast("timestamp")
    return ev.select(*_envelope(eid, uid, F.col("event_type"), ts, km_every=km_every))


def query_events(
    spark: SparkSession,
    events: list[tuple[str, str, int, int]],
) -> DataFrame:
    """Author in-band DDL rows for the relay feed: each (sql,
    source_table, file_seq, pos) becomes an op='Q' envelope row whose
    image payload carries the raw SQL statement in `text` — the
    QueryEvent.Query analog the streaming driver parses per batch
    (streaming/driver._extract_inline_ddl). Union the result onto a
    change feed before write_feed_chunks.

    Locations must be UNOCCUPIED: error-operator skips and the
    obsolete-DDL gate are location-surgical, so a Q row sharing a
    (file_seq, pos) with a real DML would entangle their fates (real
    binlog offsets are unique by construction; a synthetic feed's may
    not be)."""
    rows = [
        (
            "Q",
            None,
            ("q", 0, "query", sql, None, _dt.datetime(2024, 1, 1)),
            source_table,
            file_seq,
            pos,
            _dt.datetime(2024, 1, 1),
            pos // 10,
        )
        for sql, source_table, file_seq, pos in events
    ]
    return spark.createDataFrame(rows, ENVELOPE_DDL)


def feed_sql(km_every: int | None = 9) -> str:
    """DuckDB rendition of the same law, flattened (structs unnested).
    `turn_idx` is the flat (coalesce(after, before)) key; key-moving
    updates additionally expose `before_turn_idx` + `key_moved` so the
    replay oracles can split them into DELETE(old)+INSERT(new) exactly
    like `flatten_changes`. NOTE: `pos` not `offset` (keyword)."""
    km = (
        f"(event_id % 20 >= 14 AND event_id % 20 < 19 AND event_id % {km_every} = 0)"
        if km_every
        else "FALSE"
    )
    return f"""
  SELECT
    CASE WHEN event_id % 20 < 14 THEN 'I'
         WHEN event_id % 20 < 19 THEN 'U' ELSE 'D' END AS op,
    'conv_' || CAST(user_id AS VARCHAR) AS conv_id,
    CAST(CASE WHEN {km} THEN (event_id + 13) % 50
              ELSE event_id % 50 END AS INTEGER) AS turn_idx,
    CAST(event_id % 50 AS INTEGER) AS before_turn_idx,
    {km} AS key_moved,
    CASE WHEN event_id % 3 = 0 THEN 'user'
         WHEN event_id % 3 = 1 THEN 'assistant' ELSE 'tool' END AS role,
    event_type || ' #' || CAST(event_id AS VARCHAR) AS text,
    CASE WHEN event_id % 3 = 2
         THEN 'tool_' || CAST(event_id % 7 AS VARCHAR) END AS tool,
    ts,
    'shard_' || CAST(user_id % 4 AS VARCHAR)
      || '.transcripts_' || CAST(event_id % 2 AS VARCHAR) AS source_table,
    event_id // 1000 AS file_seq,
    event_id % 1000 AS pos,
    event_id // 10 AS txn_id
  FROM events
"""


FEED_SQL = feed_sql(9)


def synthetic_feed(
    spark: SparkSession,
    n_events: int,
    n_convs: int = 10_000,
    zipf_exponent: float = 1.1,
    partitions: int | None = None,
    seed: int = 42,
    text_chars: int = 0,
) -> DataFrame:
    """Unbounded-scale feed generator: `spark.range` + column math only.

    conv_id follows a zipf-ish law (rank ~ u^(-1/(s-1)) inversion on a
    deterministic per-row hash), so a handful of conversations are hot —
    the skew fixture the salted repartition path must survive.
    Generation is per-partition and embarrassingly parallel: no data is
    materialized on the driver, which is what makes a 10^10-event replay
    law expressible on a cluster (SURVEY §7.3d).
    """
    rng = spark.range(0, n_events, numPartitions=partitions)
    eid = F.col("id")
    # deterministic uniform in [0,1) from a 64-bit mix
    u = (F.abs(F.xxhash64(eid, F.lit(seed))) % 1_000_000_007) / 1_000_000_007.0
    # inverse-CDF zipf-ish rank in [0, n_convs)
    s = zipf_exponent
    rank = F.least(
        F.lit(n_convs - 1),
        F.floor(F.pow(F.lit(float(n_convs)), F.pow(u, F.lit(s))) - 1).cast("bigint"),
    )
    uid = F.abs(rank)
    etype = (
        F.when(eid % 5 == 0, F.lit("error"))
        .when(eid % 5 < 3, F.lit("click"))
        .otherwise(F.lit("view"))
    )
    ts = F.timestamp_seconds(F.lit(1704067200) + (eid / 100).cast("bigint"))
    pad = None
    if text_chars > 0:
        # realistic transcript turns: pad text to ~text_chars with a
        # deterministic word stream. The filler depends ONLY on
        # pos % 7 = (eid % 1000) % 7 — seven distinct strings — so it
        # is seven PRE-BUILT literals selected per row, byte-identical
        # to the old per-row repeat+substring but ~free (the old
        # expression built and sliced a 600-char string per image per
        # row: measured 5.3s -> 1.3s for a 1M-row feed at local[1]).
        pads = [
            (f" lorem{i}" * (text_chars // 7 + 1))[:text_chars] for i in range(7)
        ]
        pad = F.element_at(
            F.array(*[F.lit(p) for p in pads]),
            ((eid % 1000) % 7).cast("int") + 1,
        )
    return rng.select(*_envelope(eid, uid, etype, ts, pad=pad))
