"""SparkSession factory with scale-appropriate defaults.

Local mode is the test harness; the configs are chosen so the same code
runs unchanged on a multi-executor cluster (AQE, skew-join handling,
Arrow for the pandas-UDF path).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "dm_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    master = master or os.environ.get("DM_SPARK_MASTER", "local[*]")
    cpus = os.environ.get("SPARK_GRAFT_CPUS")
    if master == "local[*]" and cpus:
        master = f"local[{cpus}]"
    if shuffle_partitions is None:
        shuffle_partitions = int(os.environ.get("DM_SPARK_SHUFFLE_PARTITIONS", "32"))
    b = (
        SparkSession.builder.master(master)
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.parquet.compression.codec", "snappy")
        .config("spark.ui.enabled", "false")
        # task-side commit renames (v2) — avoids driver-serial renames
        .config("spark.hadoop.mapreduce.fileoutputcommitter.algorithm.version", "2")
        .config("spark.ui.showConsoleProgress", "false")
        # local mode: the driver JVM IS the executor; 8g starved the
        # block manager once a long session accumulated shuffle/GC
        # history. The box budget is 128 GiB; a real cluster sets
        # executor.memory.
        .config("spark.driver.memory", os.environ.get("DM_SPARK_DRIVER_MEM", "24g"))
        # a REUSED python worker intermittently stalls the single
        # mapInPandas task of a broadcast-subquery job for ~40s (bisected
        # on this box: after two pandas-UDF queries, the next ANN query
        # ran 33-44s vs 8-10s in ~half of reuse=true runs and 0/6 of
        # reuse=false runs — a dirty idle worker from the previous
        # stage's stream). Fresh workers cost ~100ms per python task,
        # negligible for this engine's Arrow-batched stages.
        .config(
            "spark.python.worker.reuse",
            os.environ.get("DM_SPARK_PY_WORKER_REUSE", "false"),
        )
    )
    for k, v in (extra_conf or {}).items():
        b = b.config(k, v)
    spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
