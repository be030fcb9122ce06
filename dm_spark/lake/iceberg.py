"""Real-Iceberg sink adapter (same interface as LakeTable).

This sandbox has no Iceberg runtime jar, so this adapter is
import-gated: it raises a clear error here, and works unchanged on a
cluster launched with the Iceberg runtime + a configured catalog, e.g.

    spark-submit --py-files dm_spark.zip \
      --packages org.apache.iceberg:iceberg-spark-runtime-4.0_2.13:<ver> \
      --conf spark.sql.catalog.lake=org.apache.iceberg.spark.SparkCatalog \
      --conf spark.sql.catalog.lake.type=hadoop \
      --conf spark.sql.catalog.lake.warehouse=s3://... main.py task.yaml

The MERGE it issues is the exact SQL the native LakeTable emulates:
LWW-deduped source, matched-update guarded by the lineage ordering,
matched-delete for 'D', not-matched-insert (safe-mode upsert,
syncer/dml.go:586-666 analog).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dm_spark.lake.table import LINEAGE_COLS
from dm_spark.operators.dedup import lww_latest


def iceberg_available(spark: SparkSession) -> bool:
    try:
        jvm = spark._jvm  # noqa: SLF001
        jvm.Class.forName("org.apache.iceberg.spark.SparkCatalog")
        return True
    except Exception:  # noqa: BLE001
        return False


def create_sql(
    identifier: str,
    schema_ddl: str,
    bucket_by: str,
    n_buckets: int,
    write_mode: str = "cow",
) -> str:
    """CREATE TABLE text — pure function so the contract test can pin
    it without an Iceberg runtime on the classpath. `write_mode` maps
    the native LakeTable's cow/mor axis onto Iceberg's row-level
    operation modes (copy-on-write rewrites touched files per merge;
    merge-on-read writes delete files and folds at scan/compaction —
    the trickle-CDC mode, BENCH.md 'Trickle CDC')."""
    mode = {"cow": "copy-on-write", "mor": "merge-on-read"}[write_mode]
    props = ", ".join(
        f"'write.{k}.mode'='{mode}'" for k in ("delete", "update", "merge")
    )
    return (
        f"CREATE TABLE IF NOT EXISTS {identifier} ({schema_ddl}, "
        f"_cdc_ts timestamp, _cdc_file_seq bigint, _cdc_pos bigint) "
        f"USING iceberg PARTITIONED BY (bucket({n_buckets}, {bucket_by})) "
        f"TBLPROPERTIES ({props})"
    )


def ladder_identity_sql(
    pk: list[str], unique_keys: list[list[str]], payload: list[str], q: str
) -> str:
    """SQL-text twin of operators.identity.ladder_identity_expr for the
    MERGE ON clause: PK if all components non-null, else the first
    all-non-null UK, else the full row (findFitIndex /
    getAvailableIndexColumn, syncer/dml.go:260-318). Unlike the native
    path no stable labels are needed: the identity is computed inside
    one MERGE on BOTH sides and never persisted, so a rename changes
    both sides in lockstep."""

    def part(c: str) -> str:
        return f"concat('{c}=', cast({q}.{c} as string))"

    def keystr(kind: str, cols: list[str]) -> str:
        return ", ".join([f"chr(31), '{kind}'"] + [part(c) for c in cols])

    def usable(cols: list[str]) -> str:
        return " AND ".join(f"{q}.{c} IS NOT NULL" for c in cols)

    rungs = ([("pk", pk)] if pk else []) + [
        (f"uk{i}", uk) for i, uk in enumerate(unique_keys) if uk
    ]
    branches = "".join(
        f"WHEN {usable(cols)} THEN concat_ws({keystr(kind, cols)}) "
        for kind, cols in rungs
    )
    fallback = f"concat_ws({keystr('full_row', payload)})"
    return f"CASE {branches}ELSE {fallback} END"


def merge_sql(
    identifier: str,
    key: list[str],
    payload: list[str],
    src_view: str = "_dm_src",
    unique_keys: list[list[str]] | None = None,
) -> str:
    """The MERGE INTO text: LWW-guarded matched-update, matched-delete
    for 'D', not-matched-insert (safe-mode upsert, syncer/dml.go:586-666
    analog). The `newer` guard makes redelivered (older) events no-ops —
    the same law the native LakeTable resolves with its window.

    With `unique_keys` the ON clause matches on the identity LADDER
    (PK -> first usable UK -> full row) instead of raw key equality —
    the uk-identity merge shape of LakeTable(unique_keys=...)."""
    if unique_keys:
        on = (
            f"{ladder_identity_sql(key, unique_keys, payload, 't')} = "
            f"{ladder_identity_sql(key, unique_keys, payload, 's')}"
        )
    else:
        on = " AND ".join(f"t.{k} <=> s.{k}" for k in key)
    sets = ", ".join(f"t.{c} = s.{c}" for c in payload)
    lin_sets = ", ".join(f"t.{c} = s.{c}" for c in LINEAGE_COLS)
    cols = ", ".join(payload + LINEAGE_COLS)
    vals = ", ".join(f"s.{c}" for c in payload + LINEAGE_COLS)
    newer = (
        "struct(s._cdc_ts, s._cdc_file_seq, s._cdc_pos) > "
        "struct(t._cdc_ts, t._cdc_file_seq, t._cdc_pos)"
    )
    return (
        f"MERGE INTO {identifier} t USING {src_view} s ON {on}\n"
        f"WHEN MATCHED AND s.op = 'D' AND {newer} THEN DELETE\n"
        f"WHEN MATCHED AND s.op <> 'D' AND {newer} THEN UPDATE SET {sets}, {lin_sets}\n"
        f"WHEN NOT MATCHED AND s.op <> 'D' THEN INSERT ({cols}) VALUES ({vals})"
    )


def ddl_sql(identifier: str, action: dict) -> str:
    a = action["action"]
    if a == "add_column":
        return f"ALTER TABLE {identifier} ADD COLUMN {action['column']} {action['new_type']}"
    if a == "rename_column":
        return f"ALTER TABLE {identifier} RENAME COLUMN {action['column']} TO {action['new_name']}"
    if a == "widen_type":
        return f"ALTER TABLE {identifier} ALTER COLUMN {action['column']} TYPE {action['new_type']}"
    if a == "drop_column":
        return f"ALTER TABLE {identifier} DROP COLUMN {action['column']}"
    raise ValueError(a)


def lww_source(
    changes: DataFrame, key: list[str], unique_keys: list[list[str]] | None = None
) -> DataFrame:
    """One LWW winner per merge identity for the MERGE source. With
    `unique_keys` the dedup keys on the computed LADDER identity, not
    the raw PK: a window partitioned by a nullable PK treats NULLs as
    equal, so two NULL-PK rows with distinct UKs would collapse to one
    survivor and the other would silently vanish — the same hazard the
    native LakeTable pre-reduces on the computed identity for
    (table.py merge_into pre_reduce branch)."""
    if unique_keys:
        from dm_spark.operators.identity import ladder_identity_expr

        payload = [c for c in changes.columns if c not in ("op", *LINEAGE_COLS)]
        ident = ladder_identity_expr(key, unique_keys, payload)
        return lww_latest(
            changes.withColumn("__dm_ident", ident), ["__dm_ident"], LINEAGE_COLS
        ).drop("__dm_ident")
    return lww_latest(changes, key, LINEAGE_COLS)


class IcebergTable:
    """MERGE INTO an Iceberg table with the engine's LWW semantics."""

    def __init__(
        self,
        spark: SparkSession,
        identifier: str,
        key: list[str],
        unique_keys: list[list[str]] | None = None,
    ):
        if not iceberg_available(spark):
            raise RuntimeError(
                "Iceberg runtime not on the classpath — use dm_spark.lake.LakeTable "
                "(native snapshot table) in this environment"
            )
        self.spark = spark
        self.identifier = identifier
        self.key = key
        self.unique_keys = unique_keys

    def create(
        self, schema_ddl: str, bucket_by: str, n_buckets: int, write_mode: str = "cow"
    ) -> None:
        self.spark.sql(
            create_sql(self.identifier, schema_ddl, bucket_by, n_buckets, write_mode)
        )

    def merge_into(self, changes: DataFrame, batch_id: int | None = None) -> None:
        payload = [c for c in changes.columns if c not in ("op", *LINEAGE_COLS)]
        src = lww_source(changes, self.key, self.unique_keys)
        src.createOrReplaceTempView("_dm_src")
        self.spark.sql(
            merge_sql(self.identifier, self.key, payload, unique_keys=self.unique_keys)
        )

    def read(self) -> DataFrame:
        return self.spark.table(self.identifier).drop(*LINEAGE_COLS)

    def apply_ddl(self, action: dict) -> None:
        self.spark.sql(ddl_sql(self.identifier, action))
