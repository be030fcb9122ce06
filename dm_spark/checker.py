"""Precheck unit — upstream validation before a task starts.

The reference validates binlog format, privileges, shard-schema
consistency and auto-increment PK conflicts before running
(checker/checker.go:105-240). The Spark-native equivalents are
assertions on the input table and change feed."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def precheck_feed(feed: DataFrame, key_fields: list[str]) -> dict:
    """One pass of feed invariants (single agg job):
    - locations (file_seq, pos) are unique (total order exists)
    - op values are I/U/D
    - every event carries a key (after for I/U, before for D)
    """
    key_ok = F.lit(True)
    for k in key_fields:
        img = F.when(F.col("op") == "D", F.col(f"before.{k}")).otherwise(F.col(f"after.{k}"))
        key_ok = key_ok & img.isNotNull()
    row = feed.agg(
        F.count(F.lit(1)).alias("n"),
        F.count_distinct("file_seq", "pos").alias("n_loc"),
        # 'Q' = in-band DDL query event (feed.query_events) — a valid
        # op whose images are intentionally not keyed. NULL op must
        # count as bad: `~isin(...)` is NULL for NULL (sum would skip
        # it) — the when/otherwise form counts it
        F.sum(
            F.when(F.col("op").isin("I", "U", "D", "Q"), 0).otherwise(1)
        ).alias("bad_op"),
        F.sum((~key_ok & F.col("op").isin("I", "U", "D")).cast("int")).alias("null_key"),
    ).collect()[0]
    return {
        "events": row["n"],
        "locations_unique": row["n"] == row["n_loc"],
        "bad_op_rows": row["bad_op"] or 0,
        "null_key_rows": row["null_key"] or 0,
        "ok": (row["n"] == row["n_loc"])
        and not (row["bad_op"] or 0)
        and not (row["null_key"] or 0),
    }


def precheck_identity(
    feed: DataFrame, key: list[str], unique_keys: list[list[str]]
) -> dict:
    """Identity-ladder coverage (one agg pass): for each change event,
    which rung of the PK -> UK -> full-row ladder resolves it
    (syncer/dml.go:260-318)? The reference's prechecker refuses tables
    whose rows can't be uniquely addressed; here the equivalent is
    surfacing how many events would fall PAST the declared keys to the
    full-row rung (exact-image identity — correct but fragile under
    payload-mutating updates). `ok` = every event resolves at pk or a
    declared uk."""

    def usable(cols: list[str]):
        cond = F.lit(True)
        for c in cols:
            img = F.when(F.col("op") == "D", F.col(f"before.{c}")).otherwise(
                F.col(f"after.{c}")
            )
            cond = cond & img.isNotNull()
        return cond

    pk_ok = usable(key) if key else F.lit(False)
    # skip empty rungs — vacuously "usable" (lit(True)) would report
    # every event resolved there while the real merge identity falls
    # through to full_row (same guard as ladder_identity_expr)
    uk_oks = [(i, usable(uk)) for i, uk in enumerate(unique_keys) if uk]
    rung = F.when(pk_ok, F.lit("pk"))
    for i, ok in uk_oks:
        rung = rung.when(ok, F.lit(f"uk{i}"))
    rung = rung.otherwise(F.lit("full_row"))
    aggs = [
        F.count(F.lit(1)).alias("n"),
        F.sum((rung == "pk").cast("int")).alias("pk"),
        F.sum((rung == "full_row").cast("int")).alias("full_row"),
    ]
    for i in range(len(unique_keys)):
        aggs.append(F.sum((rung == f"uk{i}").cast("int")).alias(f"uk{i}"))
    row = feed.agg(*aggs).collect()[0]
    out = {
        "events": row["n"],
        "pk_rows": row["pk"] or 0,
        "full_row_rows": row["full_row"] or 0,
        "uk_rows": {f"uk{i}": row[f"uk{i}"] or 0 for i in range(len(unique_keys))},
        "ok": not (row["full_row"] or 0),
    }
    return out


def precheck_target(table_df: DataFrame, key: list[str]) -> dict:
    """Target invariants: key uniqueness + non-null key (the auto-inc
    PK conflict check analog for shard merge)."""
    row = table_df.agg(
        F.count(F.lit(1)).alias("n"),
        F.count_distinct(*key).alias("n_keys"),
        F.sum(sum((F.col(k).isNull()).cast("int") for k in key).cast("int")).alias("nulls"),
    ).collect()[0]
    return {
        "rows": row["n"],
        "key_unique": row["n"] == row["n_keys"],
        "null_key_rows": row["nulls"] or 0,
        "ok": row["n"] == row["n_keys"] and not (row["nulls"] or 0),
    }
