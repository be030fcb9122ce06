"""Driver contract for the spark-graft builder (PySpark target).

`entry` runs the flagship CDC replay (feed -> transform pipeline ->
multi-batch LWW MERGE into the lake table -> final table state) at
sf0.001. `queries()` exposes one entry per implemented operator from
SURVEY.md §2 plus the training-data pipeline operators; `oracle_sql()`
gives the DuckDB twin for every ANSI-SQL-expressible one (MinHash /
SimHash / LSH-ANN are rows-only by design — engine-internal hash laws).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from dm_spark import queries_cdc, queries_corpus  # noqa: E402


def _pin_session(spark: SparkSession) -> None:
    """The oracles compare epoch-microsecond values, which must not
    depend on the harness session's timezone; AQE+32 partitions keep
    small-sf queries fast under a default-200 session."""
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    try:
        if int(spark.conf.get("spark.sql.shuffle.partitions")) > 64:
            spark.conf.set("spark.sql.shuffle.partitions", "32")
        spark.conf.set("spark.sql.adaptive.enabled", "true")
    except Exception:  # noqa: BLE001
        pass


def _wrap(fn: Callable[[SparkSession, str], DataFrame]) -> Callable[[SparkSession, str], DataFrame]:
    def run(spark: SparkSession, sf_dir: str) -> DataFrame:
        _pin_session(spark)
        return fn(spark, sf_dir)

    run.__name__ = getattr(fn, "__name__", "query")
    run.__doc__ = fn.__doc__
    return run


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: full CDC replay into the lake table at sf0.001."""
    _pin_session(spark)
    return queries_cdc.q_replay_merge(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    out: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
    out.update(queries_cdc.QUERIES)
    out.update(queries_corpus.QUERIES)
    return {k: _wrap(v) for k, v in out.items()}


def oracle_sql() -> dict[str, str]:
    out: dict[str, str] = {}
    out.update(queries_cdc.ORACLES)
    out.update(queries_corpus.ORACLES)
    return out
