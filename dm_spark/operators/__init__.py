from dm_spark.operators.apply import ApplyPipeline, flatten_changes
from dm_spark.operators.dedup import lww_latest, lww_latest_salted
from dm_spark.operators.filters import ba_list_filter, event_type_filter, expression_filter
from dm_spark.operators.identity import identity_key
from dm_spark.operators.mapping import (
    apply_column_mappings,
    prune_generated_columns,
    unsigned_reinterpret,
)
from dm_spark.operators.router import route_tables

__all__ = [
    "ApplyPipeline",
    "flatten_changes",
    "lww_latest",
    "lww_latest_salted",
    "ba_list_filter",
    "event_type_filter",
    "expression_filter",
    "identity_key",
    "apply_column_mappings",
    "prune_generated_columns",
    "unsigned_reinterpret",
    "route_tables",
]
