from dm_spark.schema.ddl_parser import UnsupportedDdl, map_type, parse_ddl
from dm_spark.schema.registry import SchemaRegistry, join_schemas, reconcile_actions

__all__ = [
    "SchemaRegistry",
    "join_schemas",
    "reconcile_actions",
    "parse_ddl",
    "map_type",
    "UnsupportedDdl",
]
