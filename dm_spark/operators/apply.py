"""The apply pipeline: change envelope -> per-target upsert batch.

Mirrors the reference's rows-event path (syncer/syncer.go:1953-2109,
ordered per SURVEY §3.2): route -> filters -> column mapping ->
generated-column pruning -> DML generation. DML generation here is
`flatten_changes`: the row image plus op plus lineage columns, which
`LakeTable.merge_into` resolves LWW and commits atomically — replacing
causality (syncer/causality.go), hash distribution
(syncer/dml_worker.go:132-137) and the 100-stmt txn batches
(syncer/dml_worker.go:144-238).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from dm_spark.config import TaskConfig
from dm_spark.operators.filters import ba_list_filter, event_type_filter, expression_filter
from dm_spark.operators.mapping import apply_column_mappings, prune_generated_columns
from dm_spark.operators.router import route_tables


def _img_ladder_identity(
    img, pk: list[str], unique_keys: list[list[str]], payload_fields: list[str]
):
    """Ladder identity of one envelope image (struct column) — the
    envelope-side twin of identity.ladder_identity_expr, used only to
    DETECT identity movement between before/after (never persisted, so
    plain field names are fine as labels)."""

    def usable(cols):
        cond = F.lit(True)
        for c in cols:
            cond = cond & img.getField(c).isNotNull()
        return cond

    def keystr(kind, cols):
        parts = [
            F.concat(F.lit(f"{c}="), img.getField(c).cast("string")) for c in cols
        ]
        return F.concat_ws("\x1f", F.lit(kind), *parts)

    rungs = ([("pk", pk)] if pk else []) + [
        (f"uk{i}", uk) for i, uk in enumerate(unique_keys) if uk
    ]
    expr = None
    for kind, cols in rungs:
        expr = (
            F.when(usable(cols), keystr(kind, cols))
            if expr is None
            else expr.when(usable(cols), keystr(kind, cols))
        )
    fallback = keystr("full_row", payload_fields)
    return fallback if expr is None else expr.otherwise(fallback)


def flatten_changes(
    df: DataFrame,
    payload_fields: list[str] | None = None,
    key: list[str] | None = None,
    unique_keys: list[list[str]] | None = None,
) -> DataFrame:
    """Envelope -> flat change rows for MERGE.

    Payload column X = before.X for deletes (old image carries identity,
    syncer/dml.go:154-183) else after.X. Lineage columns carry the LWW
    ordering (commit ts, then binlog location tiebreak).

    **Key-changing UPDATE split**: an update whose identity columns
    moved (before.key != after.key) is rewritten as DELETE(old key) +
    upsert(new key) sharing the event's lineage — otherwise the stale
    row under the old key would survive forever. This is the
    reference's identity-changing-update rewrite (syncer/dml.go:90-152;
    safe-mode genUpdateSQL -> DELETE+REPLACE, syncer/dml.go:586-615).
    The two halves land on different keys, so sharing (ts, file_seq,
    pos) cannot create an LWW tie. Implemented as an explode of a 1- or
    2-element struct array — one pass over the input (no double scan of
    an expensive upstream decode), stays in codegen.

    `unique_keys` (ladder-identity tables): the split fires when the
    row's LADDER identity moved — PK if usable, else first all-non-null
    UK, else full row (syncer/dml.go:260-318) — which also covers rung
    transitions (an update that fills a previously-null PK deletes the
    old UK-identified row and upserts under the PK identity).
    """
    if payload_fields is None:
        payload_fields = df.schema["after"].dataType.fieldNames()
    if key is None:
        from dm_spark.feed import KEY_COLS

        key = KEY_COLS
    key = [k for k in key if k in payload_fields]
    op, before, after = F.col("op"), F.col("before"), F.col("after")
    img = F.when(op == "D", before).otherwise(after)
    keep = [c for c in ("target_table",) if c in df.columns]
    lineage = [
        F.col("ts").alias("_cdc_ts"),
        F.col("file_seq").alias("_cdc_file_seq"),
        F.col("pos").alias("_cdc_pos"),
    ]
    if not key and not unique_keys:
        # no identity columns known: plain flatten (no split possible)
        return df.select(
            *keep, *[img.getField(f).alias(f) for f in payload_fields], op, *lineage
        )
    if unique_keys:
        b_id = _img_ladder_identity(before, key, unique_keys, payload_fields)
        a_id = _img_ladder_identity(after, key, unique_keys, payload_fields)
        moved = ~b_id.eqNullSafe(a_id)
    else:
        moved = F.lit(False)
        for k in key:
            moved = moved | ~before.getField(k).eqNullSafe(after.getField(k))
    moved = (op == "U") & before.isNotNull() & after.isNotNull() & moved
    main = F.struct(op.alias("op"), *[img.getField(f).alias(f) for f in payload_fields])
    dhalf = F.struct(
        F.lit("D").alias("op"), *[before.getField(f).alias(f) for f in payload_fields]
    )
    rows = F.when(moved, F.array(dhalf, main)).otherwise(F.array(main))
    ex = df.select(*keep, F.explode(rows).alias("__r"), *lineage)
    return ex.select(
        *keep,
        *[F.col("__r").getField(f).alias(f) for f in payload_fields],
        F.col("__r").getField("op").alias("op"),
        "_cdc_ts",
        "_cdc_file_seq",
        "_cdc_pos",
    )


class ApplyPipeline:
    """Compiles a TaskConfig into the envelope->batch transform.

    `location_floor=(file_seq, pos)`: drop events at-or-before this
    location before any other stage — the snapshot-watermark gate of
    mode `all` (events already included in the snapshot must not
    re-apply). A FIELD, not a transform monkeypatch: pipeline swaps
    (config_patch) copy it to the new instance, so the gate survives
    runtime reconfiguration."""

    def __init__(
        self, config: TaskConfig, location_floor: tuple[int, int] | None = None
    ):
        self.config = config
        self.location_floor = location_floor

    def transform(self, feed: DataFrame) -> DataFrame:
        c = self.config
        df = feed
        if self.location_floor is not None:
            fs, pos = self.location_floor
            loc = F.struct(F.col("file_seq"), F.col("pos"))
            lo = F.struct(
                F.lit(fs).cast("bigint").alias("file_seq"),
                F.lit(pos).cast("bigint").alias("pos"),
            )
            df = df.filter(loc > lo)
        if c.online_ddl:
            from dm_spark.schema.online_ddl import filter_online_ddl_tables

            df = filter_online_ddl_tables(df)
        cs = c.case_sensitive
        df = ba_list_filter(df, c.allow_tables, c.deny_tables, case_sensitive=cs)
        df = event_type_filter(df, c.event_filters, case_sensitive=cs)
        df = expression_filter(df, c.expr_filters, case_sensitive=cs)
        df = apply_column_mappings(df, c.column_mappings, case_sensitive=cs)
        if c.generated_columns:
            df = prune_generated_columns(df, c.generated_columns)
        df = route_tables(df, c.routes, case_sensitive=cs)
        # the configured key drives the key-changing-update split — a
        # task keyed differently from the feed default must still split
        # moved identities into DELETE(old)+upsert(new) (ADVICE r02);
        # unique_keys switches the split to ladder-identity movement
        return flatten_changes(df, key=c.key, unique_keys=c.unique_keys or None)

    def apply_batch(self, lakes: dict[str, "LakeTable"], batch: DataFrame, batch_id: int | None = None) -> dict:
        """Route-partitioned MERGE: one atomic commit per target table.
        `batch` is the output of `transform`. `salt_hot_keys` in the
        task config turns on the salted pre-reduction (Compactor + skew
        salting) inside each merge."""
        pre = 16 if self.config.salt_hot_keys else None
        stats = {}
        many = len(lakes) > 1
        if many:
            # each target's merge scans the batch: persist so a multi-
            # target apply doesn't recompute the upstream per lake
            batch = batch.persist()
        try:
            for target, lake in lakes.items():
                part = batch.where(F.col("target_table") == target).drop("target_table")
                stats[target] = lake.merge_into(part, batch_id=batch_id, pre_reduce=pre)
        finally:
            if many:
                batch.unpersist()
        return stats
