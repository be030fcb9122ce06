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


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: full CDC replay into the lake table at sf0.001."""
    return queries_cdc.q_replay_merge(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    out: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
    out.update(queries_cdc.QUERIES)
    out.update(queries_corpus.QUERIES)
    return out


def oracle_sql() -> dict[str, str]:
    out: dict[str, str] = {}
    out.update(queries_cdc.ORACLES)
    out.update(queries_corpus.ORACLES)
    return out
