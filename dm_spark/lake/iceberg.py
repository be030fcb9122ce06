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
        self.spark.sql(
            f"CREATE TABLE IF NOT EXISTS {self.identifier} ({schema_ddl}, "
            f"_cdc_ts timestamp, _cdc_file_seq bigint, _cdc_pos bigint) "
            f"USING iceberg PARTITIONED BY (bucket({n_buckets}, {bucket_by}))"
        )

    def merge_into(self, changes: DataFrame, batch_id: int | None = None) -> None:
        src = lww_latest(changes, self.key, LINEAGE_COLS)
        src.createOrReplaceTempView("_dm_src")
        on = " AND ".join(f"t.{k} = s.{k}" for k in self.key)
        payload = [c for c in src.columns if c not in ("op", *LINEAGE_COLS)]
        sets = ", ".join(f"t.{c} = s.{c}" for c in payload)
        lin_sets = ", ".join(f"t.{c} = s.{c}" for c in LINEAGE_COLS)
        cols = ", ".join(payload + LINEAGE_COLS)
        vals = ", ".join(f"s.{c}" for c in payload + LINEAGE_COLS)
        newer = (
            "struct(s._cdc_ts, s._cdc_file_seq, s._cdc_pos) > "
            "struct(t._cdc_ts, t._cdc_file_seq, t._cdc_pos)"
        )
        self.spark.sql(
            f"""
            MERGE INTO {self.identifier} t USING _dm_src s ON {on}
            WHEN MATCHED AND s.op = 'D' AND {newer} THEN DELETE
            WHEN MATCHED AND s.op <> 'D' AND {newer} THEN UPDATE SET {sets}, {lin_sets}
            WHEN NOT MATCHED AND s.op <> 'D' THEN INSERT ({cols}) VALUES ({vals})
            """
        )

    def read(self) -> DataFrame:
        return self.spark.table(self.identifier).drop(*LINEAGE_COLS)

    def apply_ddl(self, action: dict) -> None:
        a = action["action"]
        t = self.identifier
        if a == "add_column":
            self.spark.sql(f"ALTER TABLE {t} ADD COLUMN {action['column']} {action['new_type']}")
        elif a == "rename_column":
            self.spark.sql(f"ALTER TABLE {t} RENAME COLUMN {action['column']} TO {action['new_name']}")
        elif a == "widen_type":
            self.spark.sql(f"ALTER TABLE {t} ALTER COLUMN {action['column']} TYPE {action['new_type']}")
        elif a == "drop_column":
            self.spark.sql(f"ALTER TABLE {t} DROP COLUMN {action['column']}")
        else:
            raise ValueError(a)
