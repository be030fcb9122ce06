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


def create_sql(identifier: str, schema_ddl: str, bucket_by: str, n_buckets: int) -> str:
    """CREATE TABLE text — pure function so the contract test can pin
    it without an Iceberg runtime on the classpath."""
    return (
        f"CREATE TABLE IF NOT EXISTS {identifier} ({schema_ddl}, "
        f"_cdc_ts timestamp, _cdc_file_seq bigint, _cdc_pos bigint) "
        f"USING iceberg PARTITIONED BY (bucket({n_buckets}, {bucket_by}))"
    )


def merge_sql(identifier: str, key: list[str], payload: list[str], src_view: str = "_dm_src") -> str:
    """The MERGE INTO text: LWW-guarded matched-update, matched-delete
    for 'D', not-matched-insert (safe-mode upsert, syncer/dml.go:586-666
    analog). The `newer` guard makes redelivered (older) events no-ops —
    the same law the native LakeTable resolves with its window."""
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


class IcebergTable:
    """MERGE INTO an Iceberg table with the engine's LWW semantics."""

    def __init__(self, spark: SparkSession, identifier: str, key: list[str]):
        if not iceberg_available(spark):
            raise RuntimeError(
                "Iceberg runtime not on the classpath — use dm_spark.lake.LakeTable "
                "(native snapshot table) in this environment"
            )
        self.spark = spark
        self.identifier = identifier
        self.key = key

    def create(self, schema_ddl: str, bucket_by: str, n_buckets: int) -> None:
        self.spark.sql(create_sql(self.identifier, schema_ddl, bucket_by, n_buckets))

    def merge_into(self, changes: DataFrame, batch_id: int | None = None) -> None:
        src = lww_latest(changes, self.key, LINEAGE_COLS)
        src.createOrReplaceTempView("_dm_src")
        payload = [c for c in src.columns if c not in ("op", *LINEAGE_COLS)]
        self.spark.sql(merge_sql(self.identifier, self.key, payload))

    def read(self) -> DataFrame:
        return self.spark.table(self.identifier).drop(*LINEAGE_COLS)

    def apply_ddl(self, action: dict) -> None:
        self.spark.sql(ddl_sql(self.identifier, action))
