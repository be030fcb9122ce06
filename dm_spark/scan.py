"""Adaptive scan-parallelism floor (optimization guide §2.5/§6).

A local fixture table is often ONE small parquet file with ONE row
group. Spark cannot split a row group, so every per-row expression
between the scan and the first exchange — envelope derivation, image
structs, the key-move explode, shingle hashing, LSH signatures — runs
on a SINGLE core no matter how many the session has (measured: the
whole-batch flatten of the sf0.1 feed spent ~0.55s of a 0.70s merge
job in the one-task scan stage at local[32]).

`parallelize_scan` round-robin repartitions the RAW scan output to the
session's default parallelism, but ONLY when the input's splittable
unit count (files, then parquet row groups summed over a bounded
footer sample) is far below it. At production scale the input has
many files/row groups, the planner's own splits are fine, and this is
a strict no-op — no exchange is added. The repartition is row-content
preserving (round-robin with Spark's deterministic
sort-before-repartition), so every downstream law and oracle hash is
unchanged.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

# bounded metadata probe: beyond this many files the planner has
# enough split units anyway
_MAX_FOOTERS = 64


def parallelize_scan(df: DataFrame, target: int | None = None) -> DataFrame:
    spark = df.sparkSession
    if target is None:
        target = spark.sparkContext.defaultParallelism
    if target <= 1:
        return df
    try:
        files = df.inputFiles()
    except Exception:  # noqa: BLE001 — non-file plans: nothing to fix
        return df
    if not files or len(files) >= target:
        return df
    from urllib.parse import unquote, urlparse

    try:
        import pyarrow.parquet as pq

        groups = 0
        for f in files[:_MAX_FOOTERS]:
            u = urlparse(f)
            if u.scheme not in ("", "file"):
                return df  # remote storage: trust the planner's splits
            groups += pq.ParquetFile(unquote(u.path)).metadata.num_row_groups
            if groups >= target:
                return df
        if len(files) > _MAX_FOOTERS and groups * len(files) // _MAX_FOOTERS >= target:
            return df
    except Exception:  # noqa: BLE001 — unreadable/non-parquet: leave as-is
        return df
    return df.repartition(target)
