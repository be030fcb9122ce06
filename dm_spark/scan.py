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


def parquet_num_rows(path: str) -> int | None:
    """Total row count of a parquet file (or directory of part files)
    from FOOTER metadata — zero Spark jobs. None when unreadable."""
    import os

    import pyarrow.parquet as pq

    if os.path.isfile(path):
        paths = [path]
    elif os.path.isdir(path):
        paths = [
            os.path.join(path, fn) for fn in os.listdir(path) if fn.endswith(".parquet")
        ]
    else:
        return None
    try:
        return sum(pq.ParquetFile(p).metadata.num_rows for p in paths)
    except Exception:  # noqa: BLE001
        return None


def parquet_column_bounds(path: str, column: str) -> tuple | None:
    """(min, max) of `column` over a parquet file (or directory of part
    files) from FOOTER statistics — zero Spark jobs, zero data scan
    (guide §1/§6). Returns None when the path, column or statistics are
    missing; callers fall back to an aggregation job. Used by queries
    whose only need is a split/cut bound over a column the fixtures
    store with exact row-group statistics (event_id, doc_id)."""
    import os

    import pyarrow.parquet as pq

    if os.path.isfile(path):
        paths = [path]
    elif os.path.isdir(path):
        paths = [
            os.path.join(path, fn) for fn in os.listdir(path) if fn.endswith(".parquet")
        ]
    else:
        return None
    lo = hi = None
    for p in paths:
        try:
            md = pq.ParquetFile(p).metadata
        except Exception:  # noqa: BLE001 — unreadable: fall back to the agg
            return None
        if md.num_row_groups == 0:
            continue
        col_idx = None
        for i in range(md.num_columns):
            if md.row_group(0).column(i).path_in_schema == column:
                col_idx = i
                break
        if col_idx is None:
            return None
        for g in range(md.num_row_groups):
            st = md.row_group(g).column(col_idx).statistics
            if st is None or not st.has_min_max:
                return None
            lo = st.min if lo is None else min(lo, st.min)
            hi = st.max if hi is None else max(hi, st.max)
    if lo is None:
        return None
    return lo, hi
