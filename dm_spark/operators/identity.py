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

    pk_ok = usable(pk) if pk else F.lit(False)  # PK-less: skip the rung
    kind = F.when(pk_ok, F.lit("pk"))
    key = F.when(pk_ok, keystr("pk", pk))
    for i, uk in enumerate(unique_keys or []):
        if not uk:  # empty rung: vacuously usable, constant identity
            continue
        kind = kind.when(usable(uk), F.lit(f"uk{i}"))
        key = key.when(usable(uk), keystr(f"uk{i}", uk))
    kind = kind.otherwise(F.lit("full_row"))
    key = key.otherwise(keystr("full_row", payload_fields))
    return df.withColumn("identity_kind", kind).withColumn("identity_key", key)


def ladder_identity_expr(
    pk: list[str],
    unique_keys: list[list[str]],
    payload_fields: list[str],
    cast_to: dict[str, str] | None = None,
    labels: dict[str, str] | None = None,
) -> Column:
    """The same PK -> UK -> full-row ladder as :func:`identity_key`, but
    over FLAT change/base rows (post-`flatten_changes` payload columns)
    — this is the expression `LakeTable` buckets, shuffles and LWW-
    groups on when the table declares `unique_keys`, making the ladder
    drive the MERGE identity itself (syncer/dml.go:260-318
    `findFitIndex`/`getAvailableIndexColumn`; WHERE columns
    :472-493). Pure Catalyst when/concat chain, stays in codegen.

    Canonical-string stability (the identity is hashed into the bucket
    id, so it must never change for a logical row across schema
    evolution):

    - `labels` maps column -> a STABLE label (LakeTable passes the
      field id) so renames don't re-render — and so re-bucket — rows;
    - `cast_to` maps column -> widening-class type so an in-class
      widening (int -> bigint) renders the same string;
    - NULL-valued parts are skipped entirely (not rendered as a
      marker), so `add_column` doesn't perturb the full-row identities
      of existing rows; pk/uk rungs require all components non-null,
      so skipping only ever applies to the full-row rung, where
      distinct null layouts still render distinct strings because each
      part carries its own label.

    Semantics note (shared with the reference): a logical row must keep
    a stable rung — the reference's WHERE hits the same downstream row
    through any usable index, but a keyed merge identifies a row by one
    canonical key; a row whose events alternate between a null and a
    non-null PK image would split. The precheck's identity validation
    covers declaring usable keys up front.
    """

    def part(c: str) -> Column:
        col = F.col(c)
        if cast_to and c in cast_to:
            col = col.cast(cast_to[c])
        label = labels.get(c, c) if labels else c
        # F.concat (not concat_ws) propagates NULL: a null value makes
        # the whole part NULL, which the outer concat_ws then skips
        return F.concat(F.lit(f"{label}="), col.cast("string"))

    def usable(cols: list[str]) -> Column:
        cond = F.lit(True)
        for c in cols:
            cond = cond & F.col(c).isNotNull()
        return cond

    def keystr(kind: str, cols: list[str]) -> Column:
        return F.concat_ws("\x1f", F.lit(kind), *[part(c) for c in cols])

    # a PK-less table (key=[]) starts the ladder at its unique keys —
    # an empty rung would otherwise be vacuously "usable" and collapse
    # every row onto one constant identity
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
