from dm_spark.operators.apply import ApplyPipeline, flatten_changes
from dm_spark.operators.dedup import lww_latest, lww_latest_salted
from dm_spark.operators.filters import ba_list_filter, event_type_filter, expression_filter
from dm_spark.operators.mapping import apply_column_mappings, prune_generated_columns
from dm_spark.operators.router import route_tables

__all__ = [
    "ApplyPipeline",
    "flatten_changes",
    "lww_latest",
    "lww_latest_salted",
    "ba_list_filter",
    "event_type_filter",
    "expression_filter",
    "apply_column_mappings",
    "prune_generated_columns",
    "route_tables",
]
