"""Wedged-python-worker self-healing (session.py).

An intermittent full-duplex wedge was observed on this box (r6): a
python worker blocked in its output send while the JVM reader selected
forever — one task frozen indefinitely, which in local mode's default
maxFailures=1 means the whole job (and the whole bench leg) hangs
until an external kill. get_spark now pairs Spark 4.1's worker
idle-timeout kill (`spark.python.worker.idleTimeoutSeconds` +
`killOnIdleTimeout`) with a `local[N,F]` master so the killed task
RETRIES and the job completes. These tests pin the master translation
law and the end-to-end recovery.
"""

from __future__ import annotations

import os
import subprocess
import sys
import textwrap

from dm_spark.session import _local_master_with_failures

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_master_translation_law():
    assert _local_master_with_failures("local[4]", 4) == "local[4,4]"
    assert _local_master_with_failures("local[*]", 4) == "local[*,4]"
    assert _local_master_with_failures("local[32]", 2) == "local[32,2]"
    # fail-fast opt-out and non-local / pre-bracketed masters untouched
    assert _local_master_with_failures("local[4]", 1) == "local[4]"
    assert _local_master_with_failures("local[4,2]", 4) == "local[4,2]"
    assert _local_master_with_failures("spark://host:7077", 4) == "spark://host:7077"
    assert _local_master_with_failures("local-cluster[2,1,1024]", 4) == (
        "local-cluster[2,1,1024]"
    )


def test_wedged_worker_recovers_via_idle_kill_and_retry():
    """A worker that never produces output is killed at the idle
    timeout and its task retried — the job completes instead of
    hanging (own subprocess: the idle timeout is a core conf fixed at
    session creation, and the wedge must not share the suite's
    session)."""
    script = textwrap.dedent(
        """
        import os, sys, time
        os.environ["DM_SPARK_PY_WORKER_IDLE_TIMEOUT"] = "10"
        sys.path.insert(0, %r)
        from dm_spark.session import get_spark

        spark = get_spark("wedge_test", master="local[2]", shuffle_partitions=2)
        assert spark.sparkContext.master == "local[2,4]", spark.sparkContext.master

        def kernel(it):
            from pyspark import TaskContext

            ctx = TaskContext.get()
            if ctx.attemptNumber() == 0 and ctx.partitionId() == 0:
                time.sleep(3600)  # wedge: no output, first attempt only
            for batch in it:
                yield batch

        df = spark.range(0, 100000, numPartitions=2).mapInArrow(kernel, "id long")
        assert df.count() == 100000
        print("RECOVERED")
        spark.stop()
        """
        % REPO
    )
    r = subprocess.run(
        [sys.executable, "-c", script], capture_output=True, text=True, timeout=300,
        cwd=REPO,
    )
    assert "RECOVERED" in r.stdout, f"stdout={r.stdout[-500:]} stderr={r.stderr[-1000:]}"
