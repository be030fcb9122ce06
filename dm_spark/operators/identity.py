"""Row-identity selection + causality keys.

The reference picks each DML's WHERE-identity by a ladder: primary key
if usable, else a NOT-NULL unique key, else the first unique key whose
values in this row are all non-null, else every column
(syncer/dml.go:260-318 `findFitIndex` / `getAvailableIndexColumn`,
whereColumnsAndValues :472-493); the same key set drives causality
conflict detection and worker-queue distribution (`genMultipleKeys`,
syncer/dml.go:496-551; hash distribute syncer/dml_worker.go:132-137).

Spark-native role: `LakeTable`'s MERGE keys on a declared PK, so this
ladder's surface here is (a) precheck-time validation that a usable
identity exists, and (b) the partitioning/causality key for feeds whose
rows may have null PK components (e.g. merged shards with heterogenous
indexes) — the computed identity string is what you `repartition`/salt
on. Pure Catalyst when/struct chain, stays in codegen.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def identity_key(
    df: DataFrame,
    pk: list[str],
    unique_keys: list[list[str]] | None = None,
    payload_fields: list[str] | None = None,
) -> DataFrame:
    """Adds `identity_kind` ('pk' | 'uk<i>' | 'full_row') and
    `identity_key` (canonical string) per change row, applying the
    reference's fallback ladder on the row's effective image
    (before for deletes, after otherwise)."""
    img = F.when(F.col("op") == "D", F.col("before")).otherwise(F.col("after"))
    if payload_fields is None:
        payload_fields = df.schema["after"].dataType.fieldNames()

    def usable(cols: list[str]) -> Column:
        cond = F.lit(True)
        for c in cols:
            cond = cond & img.getField(c).isNotNull()
        return cond

    def keystr(kind: str, cols: list[str]) -> Column:
        # null-safe canonical text: kind prefix + column=value pairs
        parts = [F.lit(kind)]
        for c in cols:
            parts.append(F.concat(F.lit(f"{c}="), img.getField(c).cast("string")))
        return F.concat_ws("\x1f", *parts)

    kind = F.when(usable(pk), F.lit("pk"))
    key = F.when(usable(pk), keystr("pk", pk))
    for i, uk in enumerate(unique_keys or []):
        kind = kind.when(usable(uk), F.lit(f"uk{i}"))
        key = key.when(usable(uk), keystr(f"uk{i}", uk))
    kind = kind.otherwise(F.lit("full_row"))
    key = key.otherwise(keystr("full_row", payload_fields))
    return df.withColumn("identity_kind", kind).withColumn("identity_key", key)
