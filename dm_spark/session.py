"""SparkSession factory with scale-appropriate defaults.

Local mode is the test harness; the configs are chosen so the same code
runs unchanged on a multi-executor cluster (AQE, skew-join handling,
Arrow for the pandas-UDF path).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def _local_master_with_failures(master: str, failures: int) -> str:
    """local[N] -> local[N,F]: local mode defaults to task
    maxFailures=1, where ONE lost/killed python worker fails the whole
    job — a real cluster runs with maxFailures=4 and simply retries
    the task. The bracket syntax is the only way to set it in local
    mode (the spark.task.maxFailures conf is ignored there); the core
    count stays exactly the caller's. Pairs with the worker
    idle-timeout kill in get_spark so a wedged worker self-heals:
    kill -> task retry -> job completes (slower, never hung).
    DM_SPARK_TASK_MAX_FAILURES=1 restores fail-fast; non-local and
    already-bracketed masters pass through untouched."""
    import re

    if failures > 1 and re.fullmatch(r"local\[(\d+|\*)\]", master):
        return f"{master[:-1]},{failures}]"
    return master


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
    master = _local_master_with_failures(
        master, int(os.environ.get("DM_SPARK_TASK_MAX_FAILURES", "4"))
    )
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
    # wedged-python-worker self-healing (Spark 4.1): a worker that
    # produces NOTHING for this long while its task waits on it is
    # killed by the JVM reader, failing the task; the local[N,F]
    # translation above then retries it. Observed on this box
    # (2026-08-22): an intermittent full-duplex wedge — worker blocked
    # in tcp send, JVM reader select'ing forever — froze a 4-core
    # decode+apply leg >11 min (the same stall class CLAUDE.md
    # documents at 33-44s, unbounded variant). The timed run degrades
    # by ~the timeout instead of hanging until an external kill. Our
    # kernels stream a batch every few ms, so 300s of silence is
    # unambiguous. DM_SPARK_PY_WORKER_IDLE_TIMEOUT=0 disables.
    idle = os.environ.get("DM_SPARK_PY_WORKER_IDLE_TIMEOUT", "300")
    if int(idle) > 0:
        b = b.config("spark.python.worker.idleTimeoutSeconds", idle).config(
            "spark.python.worker.killOnIdleTimeout", "true"
        )
    for k, v in (extra_conf or {}).items():
        b = b.config(k, v)
    spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
