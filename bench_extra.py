"""Extra benchmarks for the optimization rounds (bench.py is frozen for
measurement — this file holds the noop-sink isolation runs, per-query
plan captures and kernel A/B probes whose numbers OPTIMIZATION_r06.md
cites; guide §1.4/§1.5).

Usage:
    python bench_extra.py headline [reps] [query ...]   # time + plans
    python bench_extra.py explain <out_suffix> [query ...]  # plans only
    python bench_extra.py kernel <kind> <master> <events> <parts> ...

`headline` mimics bench.run_headline exactly (same session, same
`.count()` action, min-of-reps) but optionally restricts to a query
subset and writes `.explain("formatted")` to plans/r06/.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from dm_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")
PLAN_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)), "plans", "r06")

HEADLINE = [
    "cdc_replay_merge",
    "cdc_replay_filtered",
    "cdc_shard_merge_mapped",
    "cdc_key_change_replay",
    "cdc_dedup_lww",
    "cdc_ddl_evolution",
    "cdc_wire_decode",
    "events_sessionize",
    "doc_minhash_lsh",
    "doc_ngram_jaccard",
    "emb_ann_lsh",
    "emb_ann_ivf",
    "emb_near_dup_lsh",
]


def _spark():
    return get_spark("bench_extra", master=f"local[{CPUS}]", shuffle_partitions=int(CPUS))


def _capture_plan(df, name: str, suffix: str) -> None:
    os.makedirs(PLAN_DIR, exist_ok=True)
    plan = df._sc._jvm.PythonSQLUtils.explainString(  # noqa: SLF001
        df._jdf.queryExecution(), "formatted"
    )
    with open(os.path.join(PLAN_DIR, f"{name}_{suffix}.txt"), "w") as f:
        f.write(plan)


def run_headline(reps: int, names: list[str], plan_suffix: str | None) -> None:
    import __spark_entry__ as entrymod

    spark = _spark()
    qs = entrymod.queries()
    times: dict[str, float] = {}
    for r in range(reps):
        for name in names:
            spark.sparkContext.setJobDescription(f"headline:{name}:rep{r}")
            t0 = time.time()
            df = qs[name](spark, SF_DIR)
            _ = df.count()
            dt = round(time.time() - t0, 3)
            times[name] = min(times.get(name, dt), dt)
            print(f"rep{r} {name}: {dt}s", file=sys.stderr)
    if plan_suffix:
        for name in names:
            _capture_plan(qs[name](spark, SF_DIR), name, plan_suffix)
    print(json.dumps({"queries": times, "total": round(sum(times.values()), 3)}))
    spark.stop()


def run_explain(suffix: str, names: list[str]) -> None:
    import __spark_entry__ as entrymod

    spark = _spark()
    qs = entrymod.queries()
    for name in names:
        _capture_plan(qs[name](spark, SF_DIR), name, suffix)
        print(f"plan captured: {name}_{suffix}.txt", file=sys.stderr)
    spark.stop()


def profile_replay(reps: int = 2) -> None:
    """Phase-level wall breakdown of the replay-through-lake shape at
    SF_DIR (guide §1.5: the merges are ACTIONS — a plan capture of the
    returned DataFrame only shows the final read, so the per-phase wall
    is the evidence for the merge-path numbers in OPTIMIZATION_r06.md)."""
    import tempfile

    from pyspark.sql import functions as F

    import __spark_entry__ as entrymod
    from dm_spark import queries_cdc as qc
    from dm_spark.lake import LakeTable

    spark = _spark()
    entrymod._pin_session(spark)
    for rep in range(reps):
        marks: list[tuple[str, float]] = []
        t = time.time()

        def mark(label: str) -> None:
            nonlocal t
            now = time.time()
            marks.append((label, round(now - t, 3)))
            t = now

        spark.sparkContext.setJobDescription(f"profile_replay:rep{rep}")
        batch = qc._routed_batch(spark, SF_DIR)  # noqa: SLF001
        mark("build_batch_df")
        lake = LakeTable.create(
            spark, tempfile.mkdtemp(prefix="dm_prof_"), qc.SCHEMA, qc.KEY, n_buckets=16
        )
        mark("lake_create")
        b = batch.withColumn(
            "__ord", F.col("_cdc_file_seq") * 1_000_000 + F.col("_cdc_pos")
        )
        fb = qc._feed_ord_bounds(SF_DIR)  # noqa: SLF001
        if fb is None:
            mm = b.agg(F.min("__ord"), F.max("__ord")).collect()[0]
            fb = (int(mm[0]), int(mm[1]))
        mark("ord_bounds")
        lo_all, hi_all = fb
        width = max(1, (hi_all - lo_all + 4) // 4)
        cuts = [lo_all + width * i for i in range(1, 4) if lo_all + width * i < hi_all]
        lo = None
        for i, hi in enumerate([*cuts, None]):
            part = b
            if lo is not None:
                part = part.where(F.col("__ord") > lo)
            if hi is not None:
                part = part.where(F.col("__ord") <= hi)
            lake.merge_into(part.drop("__ord"), batch_id=i, prune=False)
            mark(f"merge_{i}")
            lo = hi
        n = qc._final_us(lake).count()  # noqa: SLF001
        mark(f"final_read_n={n}")
        print(json.dumps({"rep": rep, "phases": marks,
                          "total": round(sum(s for _, s in marks), 3)}))
    spark.stop()


if __name__ == "__main__":
    cmd = sys.argv[1] if len(sys.argv) > 1 else "headline"
    if cmd == "headline":
        reps = int(sys.argv[2]) if len(sys.argv) > 2 else 2
        names = sys.argv[3:] or HEADLINE
        run_headline(reps, names, os.environ.get("DM_BENCH_PLAN_SUFFIX"))
    elif cmd == "explain":
        suffix = sys.argv[2]
        names = sys.argv[3:] or HEADLINE
        run_explain(suffix, names)
    elif cmd == "profile_replay":
        profile_replay(int(sys.argv[2]) if len(sys.argv) > 2 else 2)
    else:
        raise SystemExit(f"unknown command {cmd}")
