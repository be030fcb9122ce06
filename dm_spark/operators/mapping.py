"""Column mapping + generated-column pruning over row images.

Reference: column mapping syncer/dml.go:331-352 `mappingDML` (the
"partition id" rule embeds a shard ordinal into the key to avoid
shard-merge collisions — tests/sharding/conf/dm-task.yaml:48-62);
generated-column pruning syncer/dml.go:358-395.

Mappings are applied to BOTH images (before/after) with
`Column.withField` — pure Catalyst struct surgery, stays in codegen.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from dm_spark.config import ColumnMappingRule, pattern_to_regex


def apply_column_mappings(
    df: DataFrame, rules: list[ColumnMappingRule], table_col: str = "source_table",
    case_sensitive: bool = False,
) -> DataFrame:
    for r in rules:
        cond = F.col(table_col).rlike(pattern_to_regex(r.pattern, case_sensitive))
        for img in ("before", "after"):
            scoped = r.expr.replace("IMG.", f"{img}.")
            new_img = F.col(img).withField(r.column, F.expr(scoped))
            df = df.withColumn(
                img,
                F.when(cond & F.col(img).isNotNull(), new_img).otherwise(F.col(img)),
            )
    return df


def shard_prefix_rule(pattern: str, column: str = "conv_id") -> ColumnMappingRule:
    """The "partition id" analog: prefix the key with the shard ordinal
    parsed from the source table name, so merged shards cannot collide.
    Write `IMG.` where the rule means "this image's field"."""
    return ColumnMappingRule(
        pattern=pattern,
        column=column,
        expr=(
            "concat(regexp_extract(source_table, '^shard_([0-9]+)\\\\.', 1), "
            f"'_', IMG.{column})"
        ),
    )


def unsigned_reinterpret(df: DataFrame, columns: dict[str, int]) -> DataFrame:
    """Reinterpret signed-decoded integers as unsigned, widened into
    long (syncer/dml.go:185-212 `castUnsigned`): a negative value wraps
    by +2^bits. Pass bits per column — 32 for INT UNSIGNED, 24 for the
    MEDIUMINT special case, 16/8 for SMALLINT/TINYINT. Pure Catalyst
    struct surgery on both images, stays in codegen."""
    for img in ("before", "after"):
        col = F.col(img)
        for c, bits in columns.items():
            v = col.getField(c).cast("long")
            col = col.withField(c, F.when(v < 0, v + F.lit(1 << bits)).otherwise(v))
        df = df.withColumn(img, F.when(F.col(img).isNotNull(), col))
    return df


def prune_generated_columns(df: DataFrame, generated: list[str]) -> DataFrame:
    """Generated columns cannot be written downstream — drop them from
    both images (syncer/dml.go:358-395)."""
    for img in ("before", "after"):
        col = F.col(img)
        for g in generated:
            col = col.dropFields(g)
        df = df.withColumn(img, F.when(F.col(img).isNotNull(), col))
    return df
