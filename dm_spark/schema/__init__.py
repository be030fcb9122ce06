from dm_spark.schema.registry import SchemaRegistry, join_schemas, reconcile_actions

__all__ = ["SchemaRegistry", "join_schemas", "reconcile_actions"]
