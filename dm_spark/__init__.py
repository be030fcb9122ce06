"""dm_spark — a from-scratch PySpark-native CDC / incremental-ingest engine.

Re-expresses the capabilities of the reference CDC platform (pingcap/dm,
a MySQL->TiDB binlog replication engine) Spark-first:

- the binlog event stream becomes a (streaming) DataFrame of change-event
  envelope rows (`dm_spark.feed`),
- the syncer transform pipeline (block/allow list, event filters,
  expression filters, table routing, column mapping) becomes Catalyst
  column expressions (`dm_spark.operators`),
- causality + hash-distributed parallel apply becomes key-partitioned
  last-write-wins dedup + an atomic MERGE into a snapshot-versioned,
  hash-bucketed lake table (`dm_spark.lake`) — an Iceberg-style table
  format implemented natively because the sandbox has no Iceberg runtime
  jar; the API mirrors `MERGE INTO` so a real Iceberg catalog can be
  swapped in via config on a cluster that ships the runtime,
- the schema tracker / shard-DDL merge becomes schema-evolution
  reconciliation with field-ID semantics (`dm_spark.schema`),
- checkpoints become Structured Streaming offsets + batch-id-gated
  exactly-once commits (`dm_spark.streaming`, `dm_spark.checkpoint`).

Reference citations in docstrings use file:line into /root/reference.
"""

__version__ = "0.1.0"
